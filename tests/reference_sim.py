"""Sequential reference-semantics crawl simulator (SURVEY §5.3).

A tiny pure-Python loop implementing the reference's crawl semantics the
way MediaCrawler does — sequential cursor loops with budgets
(media_platform/xhs/core.py:116-169, client.py:325-428) — extended with the
engine's contract (robots gate, per-host per-round budget, retry backoff,
exact seen-set). The Spark engine must produce the **same URL-seen set,
content set, comment set and ordering keys**; the equivalence test is the
north_rule check.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class SimResult:
    seen: set = field(default_factory=set)
    denied: set = field(default_factory=set)
    content: set = field(default_factory=set)   # (note_id, keyword, page, item_idx, cursor_seq)
    comments: set = field(default_factory=set)  # (comment_id, note_id, parent, cursor_seq, item_idx)
    creators: set = field(default_factory=set)  # (user_id, platform)
    rounds: int = 0


def classify(url: str) -> str:
    if "/api/subcomments/" in url:
        return "subcomments"
    if "/api/comments/" in url:
        return "comments"
    if "/search/" in url:
        return "search"
    if "/user/" in url:
        return "creator"
    return "content"


def host_of(url: str) -> str:
    return url.split("/")[2]


def note_id_of(url: str) -> str:
    return url.split("?")[0].split("/")[-1]


ORDER = lambda f: (  # noqa: E731 — engine scheduler ORDER_COLS
    f["priority"], f["keyword"] or "", f["page"], f["item_idx"], f["cursor_seq"], f["url"]
)


def simulate(pages_rows, seeds_rows, robots_rows, max_rounds=40, enable_sub=True,
             max_attempts=3, crawl_creators=False, max_search_pages=None,
             max_comments_per_note=None, comment_page_size=10) -> SimResult:
    pages = {r["url"]: r for r in pages_rows}
    robots = {r["host"]: r for r in robots_rows}
    res = SimResult()

    frontier: dict[str, dict] = {}
    for s in sorted({r["url"]: r for r in seeds_rows}.values(), key=lambda r: r["url"]):
        frontier[s["url"]] = dict(
            url=s["url"], host=host_of(s["url"]), priority=s["priority"] or 0,
            depth=0, keyword=s["keyword"], page=0, item_idx=0, cursor_seq=0,
            attempts=0, not_before=0,
        )

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
                continue
            res.seen.add(f["url"])
            kind = classify(f["url"])
            body = bytes(page["html"]).decode("utf-8")
            if kind == "search":
                doc = json.loads(body)
                kw = re.search(r"/search/([^?]+)", f["url"]).group(1)
                pg = int(re.search(r"page=(\d+)", f["url"]).group(1))
                for idx, nu in enumerate(doc["note_urls"]):
                    discovered.append(dict(
                        url=nu, host=host_of(nu), priority=f["priority"],
                        depth=f["depth"] + 1, keyword=f["keyword"], page=pg,
                        item_idx=idx, cursor_seq=0, attempts=0, not_before=rnd + 1,
                    ))
                if doc["has_more"] and (max_search_pages is None or pg + 1 <= max_search_pages):
                    discovered.append(dict(
                        url=f"https://{f['host']}/search/{kw}?page={pg + 1}",
                        host=f["host"], priority=f["priority"], depth=f["depth"],
                        keyword=f["keyword"], page=pg + 1, item_idx=0,
                        cursor_seq=0, attempts=0, not_before=rnd + 1,
                    ))
            elif kind == "creator":
                doc = json.loads(body)
                platform = f["host"].split(".")[1]
                res.creators.add((doc["user_id"], platform))
            elif kind == "content":
                res.content.add(
                    (note_id_of(f["url"]), f["keyword"], f["page"], f["item_idx"], f["cursor_seq"])
                )
                if crawl_creators:
                    m_uid = re.search(r'data-uid="([^"]+)"', body)
                    platform = f["host"].split(".")[1]
                    if m_uid:
                        discovered.append(dict(
                            url=f"https://h0.{platform}.example/user/{m_uid.group(1)}",
                            host=f"h0.{platform}.example", priority=0, depth=0,
                            keyword=f["keyword"], page=f["page"], item_idx=f["item_idx"],
                            cursor_seq=0, attempts=0, not_before=rnd + 1,
                        ))
                m = re.search(r"comments:(\d+)", body)
                if m and int(m.group(1)) > 0:
                    discovered.append(dict(
                        url=f"https://{f['host']}/api/comments/{note_id_of(f['url'])}?cursor=0",
                        host=f["host"], priority=f["priority"], depth=f["depth"] + 1,
                        keyword=f["keyword"], page=f["page"], item_idx=f["item_idx"],
                        cursor_seq=0, attempts=0, not_before=rnd + 1,
                    ))
            else:
                doc = json.loads(body)
                target = f["url"].split("/")[-1].split("?")[0]
                mc, ps = max_comments_per_note, comment_page_size
                for idx, c in enumerate(doc["comments"]):
                    note = target if kind == "comments" else re.match(r"^(.*?)c\d+$", target).group(1)
                    parent = target if kind == "subcomments" else None
                    pos = f["cursor_seq"] * ps + idx
                    if kind == "comments" and mc is not None and pos >= mc:
                        continue  # W1 budget trim (xhs/client.py:355-356)
                    res.comments.add((c["id"], note, parent, f["cursor_seq"], idx))
                    if enable_sub and kind == "comments" and c["sub_comment_count"] > 0:
                        discovered.append(dict(
                            url=f"https://{f['host']}/api/subcomments/{c['id']}?cursor=0",
                            host=f["host"], priority=f["priority"], depth=f["depth"] + 1,
                            keyword=f["keyword"], page=f["page"], item_idx=idx,
                            cursor_seq=0, attempts=0, not_before=rnd + 1,
                        ))
                more_ok = doc["has_more"] and not (
                    kind == "comments" and mc is not None and (f["cursor_seq"] + 1) * ps >= mc
                )
                if more_ok:
                    discovered.append(dict(
                        url=f"https://{f['host']}/api/{'comments' if kind == 'comments' else 'subcomments'}/{target}?cursor={doc['cursor']}",
                        host=f["host"], priority=f["priority"], depth=f["depth"],
                        keyword=f["keyword"], page=f["page"], item_idx=f["item_idx"],
                        cursor_seq=f["cursor_seq"] + 1, attempts=0, not_before=rnd + 1,
                    ))

        # within-round dedup: creator URLs can be emitted by many notes; the
        # engine keeps the MIN (keyword,page,item_idx) metadata — mirror it
        best: dict[str, dict] = {}
        for d in discovered:
            cur = best.get(d["url"])
            key = (d["keyword"] or "", d["page"], d["item_idx"])
            if cur is None or key < (cur["keyword"] or "", cur["page"], cur["item_idx"]):
                best[d["url"]] = d
        for d in best.values():
            if d["url"] in res.seen or d["url"] in frontier:
                continue
            frontier[d["url"]] = d
        if not any(f["not_before"] <= max_rounds for f in frontier.values()):
            break
    return res
