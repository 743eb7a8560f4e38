"""Sequential reference-semantics crawl simulator (SURVEY §5.3).

A tiny pure-Python loop implementing the reference's crawl semantics the
way MediaCrawler does — sequential cursor loops with budgets
(media_platform/xhs/core.py:116-169, client.py:325-428), creator-posts
cursor walks (xhs/client.py:473-519), and the bilibili fans/followings/
dynamics expansion (bilibili/client.py:394-546, core.py:553-657) — extended
with the engine's contract (robots gate, per-host per-round budget, retry
backoff, exact seen-set). The Spark engine must produce the **same URL-seen
set, content set, comment set, contact-edge set, dynamics set and ordering
keys**, and carry the same per-platform pagination cursor strings
(S2/S3/S7); the equivalence test is the north_rule check.
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass, field

from mediacrawler_spark.functions.text import extract_text_py
from mediacrawler_spark.operators import tieba as T


@dataclass
class SimResult:
    seen: set = field(default_factory=set)
    denied: set = field(default_factory=set)
    failed: set = field(default_factory=set)
    content: set = field(default_factory=set)   # (note_id, keyword, page, item_idx, cursor_seq)
    comments: set = field(default_factory=set)  # (comment_id, note_id, parent, cursor_seq, item_idx)
    creators: set = field(default_factory=set)  # (user_id, platform)
    contacts: set = field(default_factory=set)  # (up_id, fan_id, src_kind, cursor_seq, item_idx)
    dynamics: set = field(default_factory=set)  # (dynamic_id, user_id, cursor_seq, item_idx)
    tieba_notes: set = field(default_factory=set)   # full TiebaNote surface + ordering keys
    zhihu_comments: set = field(default_factory=set)  # full ZhihuComment surface
    cursor_vals: dict = field(default_factory=dict)  # url -> pagination cursor string
    rounds: int = 0


def classify(url: str) -> str:
    if "/p/comment" in url:
        return "subcomments"
    if "/api/subcomments/" in url:
        return "subcomments"
    if "/api/comments/" in url or re.search(r"/p/[^/?]+\?pn=", url):
        return "comments"
    if "/search/" in url:
        return "search"
    if "/home/get/getthread" in url:
        return "creator_posts"
    if "/posts" in url:
        return "creator_posts"
    if "/fans" in url:
        return "fans"
    if "/followings" in url:
        return "followings"
    if "/dynamics" in url:
        return "dynamics"
    if "/user/" in url:
        return "creator"
    return "content"


def host_of(url: str) -> str | None:
    """Spark parse_url(url,'HOST') twin: None for malformed URLs (no
    scheme/authority) — such seeds still get scheduled (null-safe budget
    key), miss the fetch-join and exhaust retries into ``failed``."""
    if not url.startswith(("http://", "https://")):
        return None
    parts = url.split("/")
    return parts[2] if len(parts) > 2 and parts[2] else None


def note_id_of(url: str) -> str:
    return url.split("?")[0].split("/")[-1]


def uid_of(url: str) -> str:
    return url.split("/user/")[1].split("/")[0].split("?")[0]


def initial_comment_cursor(platform: str) -> str:
    """Engine's initial_comment_cursor_col twin (J2 first-request cursors)."""
    if platform == "weibo":
        return "-1"
    if platform in ("douyin", "bilibili"):
        return "0"
    return ""


def parse_comment_page(platform: str, kind: str, doc: dict, url: str = ""):
    """Per-platform comment envelope + cursor protocol, BOTH levels (J2/J3)
    — the engine's _parse_cols comment branch twin. Returns (has_more,
    next_cursor, generic_comments); top-level items are annotated with the
    normalized sub-walk trigger (sub_more, sub_cursor0) read from each
    platform's own trigger field, exactly like the engine's _gitem."""

    def ann(items, trig):
        out = []
        for c in items:
            d = dict(c)
            d["sub_more"], d["sub_cursor0"] = trig(c)
            out.append(d)
        return out

    if platform == "douyin":  # same envelope both levels (client.py:259-271)
        items = doc["comments"]
        if kind == "comments":
            items = ann(items, lambda c: ((c.get("reply_comment_total") or 0) > 0, "0"))
        return doc["has_more"] == 1, str(doc["cursor"]), items
    if platform == "weibo":  # subs inline on parents; no sub fetch
        return doc["max_id"] != 0, str(doc["max_id"]), ann(
            doc["data"], lambda c: (False, None)
        )
    if platform == "kuaishou":  # sub walk: visionSubCommentList, "" start
        if kind == "subcomments":
            v = doc["visionSubCommentList"]
            return v["pcursor"] != "no_more", v["pcursor"], v["subComments"]
        v = doc["visionCommentList"]
        # the reference skips only a LITERAL "no_more" (client.py:245-248);
        # "" (this corpus's live trigger) walks, starting at cursor ""
        items = ann(v["rootComments"], lambda c: (
            (c["subCommentsPcursor"] if c.get("subCommentsPcursor") is not None
             else "no_more") != "no_more", ""))
        return v["pcursor"] != "no_more", v["pcursor"], items
    if platform == "bilibili":  # sub walk: ?pn pages, count <= pn*ps stop
        if kind == "subcomments":
            pn = int(re.search(r"[?&]pn=(\d+)", url).group(1))
            return doc["page"]["count"] > pn * 10, str(pn + 1), doc["replies"]
        cur = doc["cursor"]
        items = ann(doc["replies"], lambda c: ((c.get("rcount") or 0) > 0, "1"))
        return (not cur["is_end"]), str(cur["next"]), items
    if platform == "zhihu":  # same offset protocol both levels
        p = doc["paging"]
        m = re.search(r"[?&]offset=([^&]+)", p.get("next") or "")
        items = [c for c in doc["data"] if c.get("type") == "comment"]  # P5
        mapped = [
            {
                "id": c["id"],
                "content": extract_text_py(c.get("content") or ""),  # kernel
                "create_time": c["created_time"],
                "sub_comment_count": c["child_comment_count"],
                "sub_more": (c["child_comment_count"] or 0) > 0,
                "sub_cursor0": "",
            }
            for c in items
        ]
        return (not p["is_end"]), (m.group(1) if m else ""), mapped
    # xhs: same envelope both levels; parents carry their own trigger +
    # initial cursor (client.py:385-407)
    items = doc["comments"]
    if kind == "comments":
        items = ann(items, lambda c: (
            bool(c.get("sub_comment_has_more")), c.get("sub_comment_cursor") or ""))
    return doc["has_more"], doc["cursor"], items


def search_cursor(platform: str, page: int, session_id: str | None) -> str:
    """Per-platform search-pagination cursor math (engine's
    extract.search_cursor_col twin — reference formulas cited there)."""
    if platform == "douyin":
        return f"offset={(page - 1) * 10}"
    if platform == "kuaishou":
        return f"page={page}&searchSessionId={session_id or ''}"
    if platform == "zhihu":
        return f"offset={(page - 1) * 20}"
    if platform == "tieba":
        return f"pn={(page - 1) * 10}"
    return f"page={page}"


ORDER = lambda f: (  # noqa: E731 — engine scheduler ORDER_COLS
    f["priority"], f["keyword"] or "", f["page"], f["item_idx"], f["cursor_seq"], f["url"]
)


def simulate(pages_rows, seeds_rows, robots_rows, max_rounds=40, enable_sub=True,
             max_attempts=3, crawl_creators=False, max_search_pages=None,
             max_comments_per_note=None, comment_page_size=10,
             comment_order="default",
             crawl_creator_posts=False, max_creator_posts=None, posts_page_size=10,
             crawl_contacts=False, max_contacts=None, contacts_page_size=10,
             max_dynamics=None, dynamics_page_size=10) -> SimResult:
    pages = {r["url"]: r for r in pages_rows}
    robots = {r["host"]: r for r in robots_rows}
    res = SimResult()

    frontier: dict[str, dict] = {}
    for s in sorted({r["url"]: r for r in seeds_rows}.values(), key=lambda r: r["url"]):
        frontier[s["url"]] = dict(
            url=s["url"], host=host_of(s["url"]), priority=s["priority"] or 0,
            depth=0, keyword=s["keyword"], page=0, item_idx=0, cursor_seq=0,
            attempts=0, not_before=0, cursor=None,
        )

    def seed(url, host, priority, depth, keyword, page, item_idx, cursor_seq, cursor):
        return dict(url=url, host=host, priority=priority, depth=depth,
                    keyword=keyword, page=page, item_idx=item_idx,
                    cursor_seq=cursor_seq, attempts=0, not_before=None,
                    cursor=cursor)

    for rnd in range(max_rounds):
        res.rounds = rnd + 1
        eligible = [f for f in frontier.values() if f["not_before"] <= rnd]
        # robots gate
        allowed, denied = [], []
        for f in eligible:
            rule = robots.get(f["host"])
            if rule is not None and not rule["allow"]:
                denied.append(f)
            else:
                allowed.append(f)
        for f in denied:
            del frontier[f["url"]]
            res.denied.add(f["url"])
        # per-host budget in deterministic order
        by_host: dict[str, list] = {}
        for f in allowed:
            by_host.setdefault(f["host"], []).append(f)
        scheduled = []
        for host, fs in by_host.items():
            budget = robots.get(host, {"max_per_round": 200})["max_per_round"]
            scheduled.extend(sorted(fs, key=ORDER)[:budget])
        for f in scheduled:
            del frontier[f["url"]]

        discovered = []
        for f in scheduled:
            page = pages.get(f["url"])
            if page is None:
                f["attempts"] += 1
                if f["attempts"] < max_attempts:
                    f["not_before"] = rnd + min(2 ** f["attempts"], 8)
                    frontier[f["url"]] = f
                else:
                    res.failed.add(f["url"])
                continue
            res.seen.add(f["url"])
            kind = classify(f["url"])
            platform = f["host"].split(".")[1] if f["host"] else ""
            body = bytes(page["html"]).decode("utf-8")

            def handle_tieba_comments(comments, note_id, f):
                """Parent comments of a thread page: rows + sub-pane seeds
                (max_sub_page_num = n//10+1, tieba/client.py:267)."""
                mc, ps = max_comments_per_note, comment_page_size
                for idx, cd in enumerate(comments):
                    pos = f["cursor_seq"] * ps + idx
                    if mc is not None and pos >= mc:
                        continue
                    res.comments.add((cd["comment_id"], note_id, None, f["cursor_seq"], idx))
                    if enable_sub and (cd["sub_comment_count"] or 0) > 0:
                        for j in range(1, cd["sub_comment_count"] // 10 + 2):
                            discovered.append(seed(
                                f"https://{f['host']}/p/comment?tid={note_id}"
                                f"&pid={cd['comment_id']}&pn={j}",
                                f["host"], f["priority"], f["depth"] + 1,
                                f["keyword"], f["page"], idx, j - 1, str(j),
                            ))

            if kind == "search":
                kw = re.search(r"/search/([^?]+)", f["url"]).group(1)
                pg = int(re.search(r"page=(\d+)", f["url"]).group(1))
                if platform == "tieba":
                    # S6 in-loop: the real E2 search extractor over the HTML
                    # body; reference-absolute URLs re-based to the corpus
                    notes = T.extract_search_note_list(body)
                    note_urls = [
                        re.sub(r"^https://tieba\.baidu\.com(?=https?://)", "", n["note_url"])
                        for n in notes
                    ]
                    has_more = '<a class="next"' in body
                    session_id = None
                elif platform == "weibo":
                    # P2/U3: filter_search_result_card (weibo/help.py:20-36)
                    doc = json.loads(body)
                    note_urls = []
                    for card in doc["cards"]:
                        if card.get("card_type") == 9 and (card.get("mblog") or {}).get("url"):
                            note_urls.append(card["mblog"]["url"])
                        for g in (card.get("card_group") or []):
                            if g.get("card_type") == 9 and (g.get("mblog") or {}).get("url"):
                                note_urls.append(g["mblog"]["url"])
                    has_more = doc["has_more"]
                    session_id = doc.get("session_id")
                else:
                    doc = json.loads(body)
                    note_urls = doc["note_urls"]
                    has_more = doc["has_more"]
                    session_id = doc.get("session_id")
                for idx, nu in enumerate(note_urls):
                    discovered.append(seed(
                        nu, host_of(nu), f["priority"], f["depth"] + 1,
                        f["keyword"], pg, idx, 0, None,
                    ))
                if has_more and (max_search_pages is None or pg + 1 <= max_search_pages):
                    discovered.append(seed(
                        f"https://{f['host']}/search/{kw}?page={pg + 1}",
                        f["host"], f["priority"], f["depth"], f["keyword"],
                        pg + 1, 0, 0,
                        search_cursor(platform, pg + 1, session_id),
                    ))
            elif kind == "creator" and platform == "tieba":
                # S13/J4 tieba: HTML creator home page — the real extractor
                # plus the first-10-threads homepage special case
                # (tieba/client.py:332-360)
                info = T.extract_creator_info(body)
                res.creators.add((info["user_id"], platform))
                if crawl_creator_posts:
                    for i, tid in enumerate(T.extract_thread_ids_from_creator_page(body)):
                        discovered.append(seed(
                            f"https://{f['host']}/p/{tid}",
                            f["host"], f["priority"], f["depth"] + 1,
                            f["keyword"], f["page"], i, 0, None,
                        ))
                    discovered.append(seed(
                        f"https://{f['host']}/home/get/getthread"
                        f"?un={info['user_name']}&pn=1",
                        f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                        f["page"], f["item_idx"], 0, "1",
                    ))
            elif kind == "creator":
                doc = json.loads(body)
                platform = f["host"].split(".")[1]
                res.creators.add((doc["user_id"], platform))
                uid = uid_of(f["url"])
                if crawl_creator_posts:
                    discovered.append(seed(
                        f"https://{f['host']}/user/{uid}/posts?cursor=0",
                        f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                        f["page"], f["item_idx"], 0, "0",
                    ))
                if crawl_contacts and platform == "bilibili":
                    for ek in ("fans", "followings"):
                        discovered.append(seed(
                            f"https://{f['host']}/user/{uid}/{ek}?pn=1",
                            f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                            f["page"], f["item_idx"], 0, "1",
                        ))
                    discovered.append(seed(
                        f"https://{f['host']}/user/{uid}/dynamics?offset=0",
                        f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                        f["page"], f["item_idx"], 0, "0",
                    ))
            elif kind == "creator_posts" and platform == "tieba":
                # getthread walk (tieba/client.py:364-385): stop on no != 0;
                # thread_list items UNtrimmed (the budget counts pages —
                # total_get_count += page_per_count=20 — never items)
                doc = json.loads(body)
                pn = int(re.search(r"[?&]pn=(\d+)", f["url"]).group(1))
                un = re.search(r"[?&]un=([^&]+)", f["url"]).group(1)
                if doc.get("no") == 0:
                    data = doc["data"]
                    for idx, t in enumerate(data["thread_list"]):
                        discovered.append(seed(
                            f"https://{f['host']}/p/{t['thread_id']}",
                            f["host"], f["priority"], f["depth"] + 1,
                            f["keyword"], f["page"], idx, f["cursor_seq"], None,
                        ))
                    if data["has_more"] == 1 and (
                        max_creator_posts is None
                        or (f["cursor_seq"] + 1) * 20 < max_creator_posts
                    ):
                        discovered.append(seed(
                            f"https://{f['host']}/home/get/getthread"
                            f"?un={un}&pn={pn + 1}",
                            f["host"], f["priority"], f["depth"], f["keyword"],
                            f["page"], f["item_idx"], f["cursor_seq"] + 1,
                            str(pn + 1),
                        ))
            elif kind == "creator_posts":
                doc = json.loads(body)
                uid = uid_of(f["url"])
                mp, pps = max_creator_posts, posts_page_size
                for idx, nu in enumerate(doc["note_urls"]):
                    if mp is not None and f["cursor_seq"] * pps + idx >= mp:
                        continue
                    discovered.append(seed(
                        nu, host_of(nu), f["priority"], f["depth"] + 1,
                        f["keyword"], f["page"], idx, f["cursor_seq"], None,
                    ))
                if doc["has_more"] and (mp is None or (f["cursor_seq"] + 1) * pps < mp):
                    discovered.append(seed(
                        f"https://{f['host']}/user/{uid}/posts?cursor={doc['cursor']}",
                        f["host"], f["priority"], f["depth"], f["keyword"],
                        f["page"], f["item_idx"], f["cursor_seq"] + 1, doc["cursor"],
                    ))
            elif kind in ("fans", "followings"):
                doc = json.loads(body)
                uid = uid_of(f["url"])
                mc, cps = max_contacts, contacts_page_size
                for idx, u in enumerate(doc["users"]):
                    if mc is not None and f["cursor_seq"] * cps + idx >= mc:
                        continue
                    if kind == "fans":  # swap-args edge store (store/bilibili/__init__.py:149-161)
                        res.contacts.add((uid, u["id"], kind, f["cursor_seq"], idx))
                    else:
                        res.contacts.add((u["id"], uid, kind, f["cursor_seq"], idx))
                if doc["has_more"] and (mc is None or (f["cursor_seq"] + 1) * cps < mc):
                    pn = f["cursor_seq"] + 2
                    discovered.append(seed(
                        f"https://{f['host']}/user/{uid}/{kind}?pn={pn}",
                        f["host"], f["priority"], f["depth"], f["keyword"],
                        f["page"], f["item_idx"], f["cursor_seq"] + 1, str(pn),
                    ))
            elif kind == "dynamics":
                doc = json.loads(body)
                uid = uid_of(f["url"])
                md, dps = max_dynamics, dynamics_page_size
                for idx, it in enumerate(doc["items"]):
                    if md is not None and f["cursor_seq"] * dps + idx >= md:
                        continue
                    res.dynamics.add((it["id"], uid, f["cursor_seq"], idx))
                if doc["has_more"] and (md is None or (f["cursor_seq"] + 1) * dps < md):
                    discovered.append(seed(
                        f"https://{f['host']}/user/{uid}/dynamics?offset={doc['offset']}",
                        f["host"], f["priority"], f["depth"], f["keyword"],
                        f["page"], f["item_idx"], f["cursor_seq"] + 1, doc["offset"],
                    ))
            elif kind == "content" and platform == "tieba":
                # S10 in-loop: real thread-detail page through the E2
                # extractors (detail + page-1 parent comments), then the
                # ?pn=2..total_replay_page reply-page range
                nid = note_id_of(f["url"])
                note = T.extract_note_detail(body)
                res.content.add(
                    (note["note_id"], f["keyword"], f["page"], f["item_idx"], f["cursor_seq"])
                )
                res.tieba_notes.add((
                    note["note_id"], note["title"], note["desc"], note["user_nickname"],
                    note["ip_location"], note["publish_time"], note["total_replay_num"],
                    note["total_replay_page"],
                    f["keyword"], f["page"], f["item_idx"], f["cursor_seq"],
                ))
                if crawl_creators:
                    m_uid = re.search(r"[?&]id=([^&]+)", note["user_link"])
                    if m_uid:
                        discovered.append(seed(
                            f"https://h0.tieba.example/user/{m_uid.group(1)}",
                            "h0.tieba.example", 0, 0, f["keyword"],
                            f["page"], f["item_idx"], 0, None,
                        ))
                handle_tieba_comments(
                    T.extract_note_parent_comments(body, nid), nid, f
                )
                total_pages = int(note["total_replay_page"] or 0)
                hi = total_pages
                if max_comments_per_note is not None:
                    hi = min(hi, math.ceil(max_comments_per_note / comment_page_size))
                for k in range(2, hi + 1):
                    discovered.append(seed(
                        f"https://{f['host']}/p/{nid}?pn={k}",
                        f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                        f["page"], f["item_idx"], k - 1, str(k),
                    ))
            elif kind == "content":
                res.content.add(
                    (note_id_of(f["url"]), f["keyword"], f["page"], f["item_idx"], f["cursor_seq"])
                )
                if crawl_creators:
                    m_uid = re.search(r'data-uid="([^"]+)"', body)
                    if m_uid:
                        discovered.append(seed(
                            f"https://h0.{platform}.example/user/{m_uid.group(1)}",
                            f"h0.{platform}.example", 0, 0, f["keyword"],
                            f["page"], f["item_idx"], 0, None,
                        ))
                m = re.search(r"comments:(\d+)", body)
                if m and int(m.group(1)) > 0:
                    cur0 = initial_comment_cursor(platform)
                    discovered.append(seed(
                        f"https://{f['host']}/api/comments/{note_id_of(f['url'])}?cursor={cur0}",
                        f["host"], f["priority"], f["depth"] + 1, f["keyword"],
                        f["page"], f["item_idx"], 0, cur0,
                    ))
            elif kind == "comments" and platform == "tieba":
                # tieba reply page ?pn=k: parent comments only (no cursor
                # emission — the page range was seeded from the detail page)
                nid = note_id_of(f["url"])
                handle_tieba_comments(
                    T.extract_note_parent_comments(body, nid), nid, f
                )
            elif kind == "subcomments" and platform == "tieba":
                tid = re.search(r"[?&]tid=([^&]+)", f["url"]).group(1)
                pid = re.search(r"[?&]pid=([^&]+)", f["url"]).group(1)
                subs = T.extract_sub_comment_page(body, tid, pid)
                for idx, s in enumerate(subs):
                    res.comments.add((s["comment_id"], tid, pid, f["cursor_seq"], idx))
            else:
                doc = json.loads(body)
                target = f["url"].split("/")[-1].split("?")[0]
                mc, ps = max_comments_per_note, comment_page_size
                has_more, next_cursor, items = parse_comment_page(
                    platform, kind, doc, f["url"]
                )
                if platform == "zhihu" and kind in ("comments", "subcomments"):
                    # E3 comments: full ZhihuComment surface (untrimmed —
                    # the fidelity table mirrors the extractor per page);
                    # child pages go through the same extractor
                    # (zhihu/client.py:334-343)
                    raw = [c for c in doc["data"] if c.get("type") == "comment"]
                    zc_cid = (target if kind == "comments"
                              else re.match(r"^(.*?)c\d+$", target).group(1))
                    from mediacrawler_spark.operators.zhihu import extract_comment_py
                    for idx, c in enumerate(raw):
                        z = extract_comment_py(c, zc_cid, None)
                        res.zhihu_comments.add((
                            z["comment_id"], z["parent_comment_id"], z["content"],
                            z["publish_time"], z["ip_location"], z["sub_comment_count"],
                            z["like_count"], z["dislike_count"], z["content_id"],
                            z["user_id"], z["user_nickname"],
                            f["cursor_seq"], idx,
                        ))
                if comment_order == "time_desc" and platform != "tieba":  # O2 order mode
                    items = sorted(items, key=lambda c: (-c["create_time"], c["id"]))
                for idx, c in enumerate(items):
                    note = target if kind == "comments" else re.match(r"^(.*?)c\d+$", target).group(1)
                    parent = target if kind == "subcomments" else None
                    pos = f["cursor_seq"] * ps + idx
                    if kind == "comments" and mc is not None and pos >= mc:
                        continue  # W1 budget trim (xhs/client.py:355-356)
                    res.comments.add((c["id"], note, parent, f["cursor_seq"], idx))
                    if platform == "weibo" and kind == "comments":
                        # inline second-level rows (weibo/client.py:205-210)
                        for j, s in enumerate(c.get("comments") or []):
                            res.comments.add((s["id"], note, c["id"], f["cursor_seq"], j))
                    if enable_sub and kind == "comments" and c.get("sub_more"):
                        # per-platform sub-walk page 0 (J3): bilibili pages
                        # by number, everyone else by the parent-supplied
                        # initial cursor token
                        cur0 = c["sub_cursor0"]
                        if platform == "bilibili":
                            u = f"https://{f['host']}/api/subcomments/{c['id']}?pn=1"
                        else:
                            u = f"https://{f['host']}/api/subcomments/{c['id']}?cursor={cur0}"
                        discovered.append(seed(
                            u, f["host"], f["priority"], f["depth"] + 1,
                            f["keyword"], f["page"], idx, 0, cur0,
                        ))
                more_ok = has_more and not (
                    kind == "comments" and mc is not None and (f["cursor_seq"] + 1) * ps >= mc
                )
                if more_ok:
                    sep = "pn" if (kind == "subcomments" and platform == "bilibili") else "cursor"
                    discovered.append(seed(
                        f"https://{f['host']}/api/{'comments' if kind == 'comments' else 'subcomments'}/{target}?{sep}={next_cursor}",
                        f["host"], f["priority"], f["depth"], f["keyword"],
                        f["page"], f["item_idx"], f["cursor_seq"] + 1, next_cursor,
                    ))

        # within-round dedup: the same URL can be emitted by several
        # discovery paths; the winner is the deterministic MIN ordering key
        # (engine's groupBy-min-struct rule — keyword None compares as "")
        best: dict[str, dict] = {}
        for d in discovered:
            cur = best.get(d["url"])
            key = (d["keyword"] or "", d["page"], d["item_idx"], d["cursor_seq"],
                   d["priority"], d["depth"])
            if cur is None or key < (cur["keyword"] or "", cur["page"], cur["item_idx"],
                                     cur["cursor_seq"], cur["priority"], cur["depth"]):
                best[d["url"]] = d
        for d in best.values():
            if d["url"] in res.seen or d["url"] in frontier:
                continue
            d["not_before"] = rnd + 1
            frontier[d["url"]] = d
            res.cursor_vals[d["url"]] = d["cursor"]
        if not any(f["not_before"] <= max_rounds for f in frontier.values()):
            break
    return res
