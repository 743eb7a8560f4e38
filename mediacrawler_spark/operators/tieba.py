"""Tieba HTML-list extractor surface (E2 + E17; reference:
media_platform/tieba/help.py:33-356 — six parsel/xpath extractors).

The reference parses six tieba page shapes with xpath selectors. This
container has no lxml/parsel, so the extractors are re-derived as
**regex-DOM equivalents** anchored on the same structural markers the
reference xpaths target (class/id/data-field attributes), with the
reference's scalar branches replicated byte-for-byte:

- title-suffix strip ``【{tieba_name}】_百度贴吧`` (help.py:132)
- ``data-field`` attribute → ``html.unescape`` → ``json.loads`` (help.py:346-356)
- comment bodies through the byte-identical text kernel
  (``functions.text.extract_text_py`` ≡ tools/crawler_util.py:194-203)
- E17 regexes verbatim: pub-time ``<span class="tail-info">(\\d{4}-\\d{2}-\\d{2}
  \\d{2}:\\d{2})</span>``, IP ``IP属地:(\\S+)</span>``, follows/fans
  ``<span class="concern_num">\\(<a[^>]*>(\\d+)</a>\\)</span>``, 吧龄
  ``<span>吧龄:(\\S+)</span>`` (help.py:267-356)
- gender via the ``sex_male``/``sex_female`` markers (help.py:24-25,305-318)

Engine path: each extractor runs as an Arrow pandas UDF producing a JSON
array string, exploded JVM-side via ``from_json`` — no per-row Python in
the driver plan, Arrow batches only. The row-wise functions double as the
oracle in tests (UDF ≡ row loop over the same corpus).
"""

from __future__ import annotations

import html
import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from mediacrawler_spark.functions.text import extract_text_py

TIEBA_URL = "https://tieba.baidu.com"

# E17 — the reference's exact compiled patterns (help.py:267-297,325-356)
_RE_PUB_TIME = re.compile(r'<span class="tail-info">(\d{4}-\d{2}-\d{2} \d{2}:\d{2})</span>')
_RE_IP = re.compile(r"IP属地:(\S+)</span>")
_RE_CONCERN = re.compile(r'<span class="concern_num">\(<a[^>]*>(\d+)</a>\)</span>')
_RE_REG_DURATION = re.compile(r"<span>吧龄:(\S+)</span>")

GENDER_MALE = "sex_male"
GENDER_FEMALE = "sex_female"


def extract_ip(html_content: str) -> str:
    m = _RE_IP.search(html_content)
    return m.group(1) if m else ""


def extract_ip_and_pub_time(html_content: str) -> tuple[str, str]:
    m = _RE_PUB_TIME.search(html_content)
    return extract_ip(html_content), (m.group(1) if m else "")


def extract_gender(html_content: str) -> str:
    if GENDER_MALE in html_content:
        return "男"
    if GENDER_FEMALE in html_content:
        return "女"
    return "未知"


def extract_registration_duration(html_content: str) -> str:
    m = _RE_REG_DURATION.search(html_content)
    return m.group(1) if m else ""


def parse_data_field(tag: str) -> dict:
    """data-field attribute → html.unescape → json.loads (help.py:346-356)."""
    m = re.search(r'data-field="([^"]*)"', tag)
    if not m:
        return {}
    raw = m.group(1).strip()
    if not raw or raw == "{}":
        return {}
    try:
        return json.loads(html.unescape(raw))
    except Exception:
        return {}


# -- regex-DOM helpers -------------------------------------------------------

def _blocks(page: str, marker: str) -> list[str]:
    """Split a page into the segments following each occurrence of a block
    marker (the anchor the reference's xpath block selector matches)."""
    parts = page.split(marker)
    return parts[1:]


def _first(pattern: str, s: str, group: int = 1, flags: int = re.DOTALL) -> str:
    m = re.search(pattern, s, flags)
    return m.group(group) if m else ""


# HTML5 §13.1.2.4 optional-end-tag elements: a recovering parser closes
# these at the next sibling open, never at end-of-document.
_OMITTABLE_END = {"li", "p", "tr", "td", "th", "dd", "dt", "option", "rt", "rp"}


def _balanced_inner(s: str, open_pat: str, tag: str) -> str:
    """Inner HTML of the first element whose open tag matches ``open_pat``,
    with NESTING handled: the close position is found by tracking the depth
    of ``<tag``/``</tag>`` pairs, exactly like the reference's xpath node
    text does natively. The previous non-greedy ``(.*?)</tag>`` capture
    truncated the block at the *first* nested close tag — any nested
    ``</div>``/``</ul>`` inside a thread list or post body cut it short."""
    m = re.search(open_pat, s, re.DOTALL)
    if not m:
        return ""
    start = m.end()
    depth = 1
    # full open tags matched through their '>' so self-closing ('<div/>')
    # can be told apart and skipped — they open no scope, and counting them
    # as depth+1 made the capture run to end-of-string on sloppy markup
    token = re.compile(rf"<{tag}\b[^>]*>|</{tag}\s*>", re.IGNORECASE)
    first_sib = -1  # first same-tag open seen at depth 1 (sibling level)
    for t in token.finditer(s, start):
        tok = t.group(0)
        if tok.startswith("</"):
            depth -= 1
            if depth == 0:
                return s[start:t.start()]
        elif not tok.rstrip(">").endswith("/"):
            if depth == 1 and first_sib < 0:
                first_sib = t.start()
            depth += 1
    # Unclosed-tag fallback: depth never returned to 0 (real tieba markup
    # drops close tags — an unclosed <li> mid-list is common). lxml's
    # recovering parser implicitly closes the element at its next sibling:
    # bound the capture at the next match of the SAME open pattern, and —
    # for tags whose end tag the HTML spec lets authors omit (li/p/tr/…,
    # which html parsers auto-close at the next same-tag open) — at the
    # first same-tag open that appeared at sibling depth. End-of-string
    # only when no sibling bound exists.
    bounds = []
    sib = re.search(open_pat, s[start:], re.DOTALL)
    if sib:
        bounds.append(start + sib.start())
    if first_sib >= 0 and tag.lower() in _OMITTABLE_END:
        bounds.append(first_sib)
    return s[start:min(bounds)] if bounds else s[start:]


# -- the six extractors (row-wise; each doubles as the test oracle) ---------

def extract_search_note_list(page: str) -> list[dict]:
    """Keyword-search result page → note briefs (help.py:33-61,
    ``//div[@class='s_post']`` blocks)."""
    out = []
    for b in _blocks(page, '<div class="s_post">'):
        title_a = _first(r'<span class="p_title">\s*(<a.*?</a>)', b)
        home_a = _first(r'(<a href="/home/main[^>]*>.*?</a>)', b)
        forum_a = _first(r'(<a class="p_forum".*?</a>)', b)
        out.append({
            "note_id": _first(r'data-tid="([^"]*)"', title_a).strip(),
            "title": _first(r">([^<]*)</a>", title_a).strip(),
            "desc": _balanced_inner(b, r'<div class="p_content"[^>]*>', "div").strip(),
            "note_url": TIEBA_URL + _first(r'href="([^"]*)"', title_a),
            "user_nickname": _first(r"<font>(.*?)</font>", home_a).strip(),
            "user_link": TIEBA_URL + _first(r'href="([^"]*)"', home_a),
            "tieba_name": _first(r"<font>(.*?)</font>", forum_a).strip(),
            "tieba_link": TIEBA_URL + _first(r'href="([^"]*)"', forum_a),
            "publish_time": _first(r'<font class="p_green p_date">(.*?)</font>', b).strip(),
        })
    return out


def extract_tieba_note_list(page: str) -> list[dict]:
    """Forum thread-list page → note briefs (help.py:63-97,
    ``//ul[@id='thread_list']/li`` + data-field)."""
    page = page.replace("<!--", "")  # help.py:73 comment-strip
    tieba_name = _first(r'<a class="card_title_fname"[^>]*>(.*?)</a>', page).strip()
    tieba_link = TIEBA_URL + _first(r'<a class="card_title_fname"[^>]*href="([^"]*)"', page)
    body = _balanced_inner(page, r'<ul id="thread_list">', "ul")
    out = []
    for b in _blocks(body, "<li "):
        field = parse_data_field("<li " + b[: b.find(">") + 1])
        if not field:
            continue
        note_id = str(field.get("id"))
        out.append({
            "note_id": note_id,
            "title": _first(r'<a class="j_th_tit "[^>]*>(.*?)</a>', b).strip(),
            "desc": _balanced_inner(
                b, r'<div class="threadlist_abs threadlist_abs_onlyline ">', "div"
            ).strip(),
            "note_url": TIEBA_URL + f"/p/{note_id}",
            "user_link": TIEBA_URL + _first(
                r'<a class="frs-author-name j_user_card "[^>]*href="([^"]*)"', b
            ).strip(),
            "user_nickname": field.get("authoer_nickname") or field.get("author_name"),
            "tieba_name": tieba_name,
            "tieba_link": tieba_link,
            "total_replay_num": field.get("reply_num", 0),
        })
    return out


def extract_note_detail(page: str) -> dict:
    """Thread detail page → one note (help.py:99-133)."""
    only_view = _first(r'id="lzonly_cntn"[^>]*href="([^"]*)"', page).strip()
    note_id = only_view.split("?")[0].split("/")[-1]
    tieba_name = _first(r'<a class="card_title_fname"[^>]*>(.*?)</a>', page).strip()
    first_floor = _balanced_inner(page, r'<div class="p_postlist">', "div") or page
    nums = re.findall(
        r'<span class="red">(.*?)</span>',
        _balanced_inner(page, r'<li class="l_reply_num">', "li"),
    )
    ip, pub = extract_ip_and_pub_time(
        _first(r'(<div class="post-tail-wrap">.*?</div>)', page)
    )
    title = _first(r"<title>(.*?)</title>", page).strip()
    title = title.replace(f"【{tieba_name}】_百度贴吧", "")  # help.py:132
    return {
        "note_id": note_id,
        "title": title,
        "desc": _first(r'<meta name="description" content="([^"]*)"', page).strip(),
        "note_url": TIEBA_URL + f"/p/{note_id}",
        "user_link": TIEBA_URL + _first(
            r'<a class="p_author_face "[^>]*href="([^"]*)"', first_floor
        ).strip(),
        "user_nickname": _first(
            r'<a class="p_author_name j_user_card"[^>]*>(.*?)</a>', first_floor
        ).strip(),
        "user_avatar": _first(
            r'<a class="p_author_face "[^>]*>\s*<img src="([^"]*)"', first_floor
        ).strip(),
        "tieba_name": tieba_name,
        "tieba_link": TIEBA_URL + _first(
            r'<a class="card_title_fname"[^>]*href="([^"]*)"', page
        ),
        "ip_location": ip,
        "publish_time": pub,
        "total_replay_num": (nums[0].strip() if len(nums) > 0 else ""),
        "total_replay_page": (nums[1].strip() if len(nums) > 1 else ""),
    }


def extract_note_parent_comments(page: str, note_id: str) -> list[dict]:
    """Thread page → first-level comments (help.py:135-170,
    ``l_post l_post_bright j_l_post clearfix  `` blocks + data-field)."""
    tieba_name = _first(r'<a class="card_title_fname"[^>]*>(.*?)</a>', page).strip()
    out = []
    for b in _blocks(page, '<div class="l_post l_post_bright j_l_post clearfix  " '):
        field = parse_data_field("<div " + b[: b.find(">") + 1])
        if not field:
            continue
        content = field.get("content", {})
        ip, pub = extract_ip_and_pub_time(
            _first(r'(<div class="post-tail-wrap">.*?</div>)', b)
        )
        out.append({
            "comment_id": str(content.get("post_id")),
            "sub_comment_count": content.get("comment_num"),
            "content": extract_text_py(content.get("content")),
            "note_url": TIEBA_URL + f"/p/{note_id}",
            "user_link": TIEBA_URL + _first(
                r'<a class="p_author_face "[^>]*href="([^"]*)"', b
            ).strip(),
            "user_nickname": _first(
                r'<a class="p_author_name j_user_card"[^>]*>(.*?)</a>', b
            ).strip(),
            "user_avatar": _first(
                r'<a class="p_author_face "[^>]*>\s*<img src="([^"]*)"', b
            ).strip(),
            "tieba_id": str(content.get("forum_id", "")),
            "tieba_name": tieba_name,
            "tieba_link": f"https://tieba.baidu.com/f?kw={tieba_name}",
            "ip_location": ip,
            "publish_time": pub,
            "note_id": note_id,
        })
    return out


def extract_note_sub_comments(page: str, parent: dict) -> list[dict]:
    """Sub-comment pane → second-level comments (help.py:172-205,
    ``lzl_single_post j_lzl_s_p`` li blocks)."""
    out = []
    segs = _blocks(page, '<li class="lzl_single_post j_lzl_s_p first_no_border" ') + _blocks(
        page, '<li class="lzl_single_post j_lzl_s_p " '
    )
    for b in segs:
        field = parse_data_field("<li " + b[: b.find(">") + 1])
        if not field:
            continue
        user_a = _first(r'(<a class="j_user_card lzl_p_p".*?>)', b)
        out.append({
            "comment_id": str(field.get("spid")),
            "content": extract_text_py(
                _balanced_inner(b, r'<span class="lzl_content_main">', "span")
            ),
            "user_link": _first(r'href="([^"]*)"', user_a),
            "user_nickname": field.get("showname"),
            "user_avatar": _first(
                r'<a class="j_user_card lzl_p_p"[^>]*>\s*<img src="([^"]*)"', b
            ),
            "publish_time": _first(r'<span class="lzl_time">(.*?)</span>', b).strip(),
            "parent_comment_id": parent.get("comment_id"),
            "note_id": parent.get("note_id"),
            "note_url": parent.get("note_url"),
            "tieba_id": parent.get("tieba_id"),
            "tieba_name": parent.get("tieba_name"),
            "tieba_link": parent.get("tieba_link"),
        })
    return out


def extract_creator_info(page: str) -> dict:
    """Creator home page → creator row (help.py:207-239)."""
    from urllib.parse import parse_qs, unquote

    user_link = _first(r'<p class="space">\s*<a[^>]*href="([^"]*)"', page)
    params = parse_qs(unquote(user_link.split("?")[-1]))
    userdata = _first(r'(<div class="userinfo_userdata">.*?</div>)', page)
    concern = _RE_CONCERN.findall(page)
    return {
        "user_id": params.get("id", [""])[0],
        "user_name": params.get("un", [""])[0],
        "nickname": _first(r'<span class="userinfo_username ">(.*?)</span>', page).strip(),
        "avatar": _first(
            r'<div class="userinfo_left_head">.*?<img src="([^"]*)"', page
        ).strip(),
        "gender": extract_gender(userdata),
        "ip_location": extract_ip(userdata),
        "follows": (concern[0] if len(concern) > 0 else "0"),
        "fans": (concern[1] if len(concern) > 1 else "0"),
        "registration_duration": extract_registration_duration(userdata),
    }


def extract_thread_ids_from_creator_page(page: str) -> list[str]:
    """Creator home page → thread-id list (help.py:241-265,
    ``//ul[@class='new_list clearfix']//div[@class='thread_name']/a[1]/@href``)."""
    body = _balanced_inner(page, r'<ul class="new_list clearfix">', "ul")
    ids = []
    for b in _blocks(body, '<div class="thread_name">'):
        href = _first(r'<a[^>]*href="([^"]*)"', b)
        if href:
            ids.append(href.split("?")[0].split("/")[-1])
    return ids


# -- in-loop composite extractors (S6/S10 wired into CrawlEngine) ------------
# The reference's tieba crawl IS these extractors (tieba/core.py:113-205):
# a thread page (/p/{id} detail and its ?pn=k reply pages) yields the note
# (detail only) plus that page's first-level comments; a sub-comment pane
# (/p/comment?tid&pid&pn) yields second-level comments. One UDF per page
# shape, returning a JSON blob decoded JVM-side by from_json.

def extract_thread_page(page: str, note_id: str) -> dict:
    """Thread page → {note, comments}: extract_note_detail +
    extract_note_parent_comments in one pass (the reference calls them on
    the same fetched page, tieba/core.py:194-205 + client.py:198-235)."""
    return {
        "note": extract_note_detail(page),
        "comments": extract_note_parent_comments(page, note_id),
    }


def extract_sub_comment_page(page: str, tid: str, pid: str) -> list[dict]:
    """Sub-comment pane → second-level comments; the parent linkage fields
    the reference threads through ``parent_comment`` (help.py:172-205) are
    reconstructed from the page URL's tid/pid params."""
    parent = {
        "comment_id": pid,
        "note_id": tid,
        "note_url": TIEBA_URL + f"/p/{tid}",
        "tieba_id": None,
        "tieba_name": None,
        "tieba_link": None,
    }
    return extract_note_sub_comments(page, parent)


@pandas_udf(StringType())
def thread_page_udf(html_col: pd.Series, note_id: pd.Series) -> pd.Series:
    def run(v, nid):
        if isinstance(v, (bytes, bytearray)):
            v = v.decode("utf-8")
        if not v:
            return None
        return json.dumps(extract_thread_page(v, nid), ensure_ascii=False)

    return pd.Series([run(v, n) for v, n in zip(html_col, note_id)])


@pandas_udf(StringType())
def sub_comment_page_udf(html_col: pd.Series, tid: pd.Series, pid: pd.Series) -> pd.Series:
    def run(v, t, p):
        if isinstance(v, (bytes, bytearray)):
            v = v.decode("utf-8")
        if not v:
            return None
        return json.dumps(extract_sub_comment_page(v, t, p), ensure_ascii=False)

    return pd.Series([run(v, t, p) for v, t, p in zip(html_col, tid, pid)])


# -- Arrow UDF bridge (JSON-array strings, exploded JVM-side) ---------------

def _json_udf(fn):
    @pandas_udf(StringType())
    def u(col: pd.Series) -> pd.Series:
        def run(v):
            if isinstance(v, (bytes, bytearray)):
                v = v.decode("utf-8")
            if not v:
                return None
            return json.dumps(fn(v), ensure_ascii=False)

        return col.map(run)

    return u


search_notes_udf = _json_udf(extract_search_note_list)
note_list_udf = _json_udf(extract_tieba_note_list)
note_detail_udf = _json_udf(extract_note_detail)
creator_info_udf = _json_udf(extract_creator_info)
thread_ids_udf = _json_udf(extract_thread_ids_from_creator_page)


@pandas_udf(StringType())
def parent_comments_udf(html_col: pd.Series, note_id: pd.Series) -> pd.Series:
    def run(v, nid):
        if isinstance(v, (bytes, bytearray)):
            v = v.decode("utf-8")
        if not v:
            return None
        return json.dumps(extract_note_parent_comments(v, nid), ensure_ascii=False)

    return pd.Series([run(v, n) for v, n in zip(html_col, note_id)])


SEARCH_NOTE_DDL = (
    "array<struct<note_id:string,title:string,desc:string,note_url:string,"
    "user_nickname:string,user_link:string,tieba_name:string,tieba_link:string,"
    "publish_time:string>>"
)

NOTE_LIST_DDL = (
    "array<struct<note_id:string,title:string,desc:string,note_url:string,"
    "user_link:string,user_nickname:string,tieba_name:string,tieba_link:string,"
    "total_replay_num:int>>"
)

NOTE_DETAIL_DDL = (
    "struct<note_id:string,title:string,desc:string,note_url:string,"
    "user_link:string,user_nickname:string,user_avatar:string,tieba_name:string,"
    "tieba_link:string,ip_location:string,publish_time:string,"
    "total_replay_num:string,total_replay_page:string>"
)

PARENT_COMMENT_DDL = (
    "array<struct<comment_id:string,sub_comment_count:int,content:string,"
    "note_url:string,user_link:string,user_nickname:string,user_avatar:string,"
    "tieba_id:string,tieba_name:string,tieba_link:string,ip_location:string,"
    "publish_time:string,note_id:string>>"
)

CREATOR_DDL = (
    "struct<user_id:string,user_name:string,nickname:string,avatar:string,"
    "gender:string,ip_location:string,follows:string,fans:string,"
    "registration_duration:string>"
)

_NOTE_STRUCT = NOTE_DETAIL_DDL  # alias: the full TiebaNote field set

THREAD_PAGE_DDL = f"struct<note:{_NOTE_STRUCT},comments:{PARENT_COMMENT_DDL}>"

SUB_COMMENT_PAGE_DDL = (
    "array<struct<comment_id:string,content:string,user_link:string,"
    "user_nickname:string,user_avatar:string,publish_time:string,"
    "parent_comment_id:string,note_id:string,note_url:string,"
    "tieba_id:string,tieba_name:string,tieba_link:string>>"
)


def extract_search_notes(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Search pages → one row per listed note, with page position (W4)."""
    parsed = pages.withColumn(
        "_n", F.from_json(search_notes_udf(F.col(html_col)), SEARCH_NOTE_DDL)
    )
    return parsed.select(
        "url", F.posexplode_outer("_n").alias("item_idx", "note")
    ).select("url", "item_idx", "note.*")


def extract_forum_notes(pages: DataFrame, html_col: str = "html") -> DataFrame:
    parsed = pages.withColumn(
        "_n", F.from_json(note_list_udf(F.col(html_col)), NOTE_LIST_DDL)
    )
    return parsed.select(
        "url", F.posexplode_outer("_n").alias("item_idx", "note")
    ).select("url", "item_idx", "note.*")


def extract_details(pages: DataFrame, html_col: str = "html") -> DataFrame:
    parsed = pages.withColumn(
        "_n", F.from_json(note_detail_udf(F.col(html_col)), NOTE_DETAIL_DDL)
    )
    return parsed.select("url", F.col("_n.*"))


def extract_parent_comments(pages: DataFrame, html_col: str = "html",
                            note_id_col: str = "note_id") -> DataFrame:
    parsed = pages.withColumn(
        "_c",
        F.from_json(
            parent_comments_udf(F.col(html_col), F.col(note_id_col)), PARENT_COMMENT_DDL
        ),
    )
    return parsed.select(
        "url", F.posexplode_outer("_c").alias("item_idx", "cm")
    ).select("url", "item_idx", "cm.*")


def extract_creators_tieba(pages: DataFrame, html_col: str = "html") -> DataFrame:
    parsed = pages.withColumn(
        "_c", F.from_json(creator_info_udf(F.col(html_col)), CREATOR_DDL)
    )
    return parsed.select("url", F.col("_c.*"))
