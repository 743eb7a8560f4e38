"""Zhihu per-type content extractor surface (S12 + E3; reference:
media_platform/zhihu/help.py:46-467 — ZhihuExtractor's answer/article/
zvideo branches + judge_zhihu_url dispatch).

Reference semantics replicated:

- **dispatch** (help.py:448-467): ``/answer/`` → answer, ``/p/`` → article,
  ``/zvideo/`` → zvideo, else "".
- **answer** (help.py:91-119): content_text = text-kernel(content html);
  question_id from ``question.id``; content_url rebuilt as
  ``{ZHIHU_URL}/question/{qid}/answer/{cid}``; desc = kernel(description or
  excerpt); voteup/comment counts defaulted to 0.
- **article** (help.py:121-149): content_url =
  ``{ZHUANLAN_URL}/p/{cid}``; created_time falls back ``created_time`` →
  ``created`` (and updated likewise).
- **zvideo** (help.py:151-184): the non-creator-page branch —
  content_url = ``video_url``, created_time = ``created_at``.
- **author** (help.py:186-211): ``author.member`` fallback when ``id`` is
  absent; user_link = ``{ZHIHU_URL}/people/{url_token}``.
- text fields pass through the byte-identical kernel
  (functions.text.extract_text_udf ≡ tools/crawler_util.py:194-203) —
  zhihu is one of the two platforms whose extractor calls it.

All JSON decoding is native ``from_json``; the only Python is the
Arrow-batched kernel (ArrowEvalPython, no per-row Python — §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.functions.text import extract_text_udf

ZHIHU_URL = "https://www.zhihu.com"
ZHIHU_ZHUANLAN_URL = "https://zhuanlan.zhihu.com"

ANSWER_NAME = "answer"
ARTICLE_NAME = "article"
VIDEO_NAME = "zvideo"


def judge_zhihu_url_col(url: Column) -> Column:
    """S12 — judge_zhihu_url (zhihu/help.py:448-467), order preserved."""
    return (
        F.when(url.contains("/answer/"), F.lit(ANSWER_NAME))
        .when(url.contains("/p/"), F.lit(ARTICLE_NAME))
        .when(url.contains("/zvideo/"), F.lit(VIDEO_NAME))
        .otherwise(F.lit(""))
    )


def judge_zhihu_url(note_detail_url: str) -> str:
    """Row-wise twin (tests compare against the column dispatch)."""
    if "/answer/" in note_detail_url:
        return ANSWER_NAME
    if "/p/" in note_detail_url:
        return ARTICLE_NAME
    if "/zvideo/" in note_detail_url:
        return VIDEO_NAME
    return ""


_AUTHOR = (
    "struct<id:string,name:string,url_token:string,avatar_url:string,"
    "member:struct<id:string,name:string,url_token:string,avatar_url:string>>"
)

ANSWER_DDL = (
    f"struct<id:string,type:string,content:string,question:struct<id:string>,"
    f"title:string,description:string,excerpt:string,created_time:bigint,"
    f"updated_time:bigint,voteup_count:int,comment_count:int,author:{_AUTHOR}>"
)

ARTICLE_DDL = (
    f"struct<id:string,type:string,content:string,title:string,excerpt:string,"
    f"created_time:bigint,created:bigint,updated_time:bigint,updated:bigint,"
    f"voteup_count:int,comment_count:int,author:{_AUTHOR}>"
)

ZVIDEO_DDL = (
    f"struct<id:string,type:string,title:string,description:string,"
    f"video_url:string,created_at:bigint,published_at:bigint,updated_at:bigint,"
    f"voteup_count:int,comment_count:int,author:{_AUTHOR}>"
)


def _author_cols(a: Column) -> list[Column]:
    """help.py:186-211 — `member` fallback when `id` is missing (the
    reference's `not author.get("id")` is falsy on None AND '')."""
    eff = F.when(F.coalesce(a["id"], F.lit("")) == "", a["member"]).otherwise(
        F.struct(
            a["id"].alias("id"), a["name"].alias("name"),
            a["url_token"].alias("url_token"), a["avatar_url"].alias("avatar_url"),
        )
    )
    return [
        eff["id"].alias("user_id"),
        F.concat(F.lit(ZHIHU_URL + "/people/"), eff["url_token"]).alias("user_link"),
        eff["name"].alias("user_nickname"),
        eff["avatar_url"].alias("user_avatar"),
        eff["url_token"].alias("user_url_token"),
    ]


def _kernel(c: Column) -> Column:
    return extract_text_udf(c)


# ---------------------------------------------------------------------------
# E3 comments — the reference's per-comment extractor surface
# (zhihu/help.py:213-298): type=="comment" filter, reply_comment_id,
# kernel-cleaned content, ip_location from the comment_tag list's ip_info
# entry, like/dislike defaulting, child_comment_count, and the same
# author member-fallback sub-extraction as contents.

ZHIHU_COMMENT_DDL = (
    f"struct<type:string,id:string,reply_comment_id:string,content:string,"
    f"created_time:bigint,comment_tag:array<struct<type:string,text:string>>,"
    f"child_comment_count:int,like_count:int,dislike_count:int,author:{_AUTHOR}>"
)

ZHIHU_COMMENT_PAGE_DDL = (
    f"paging struct<is_end:boolean,next:string>, data array<{ZHIHU_COMMENT_DDL}>"
)


def comment_ip_location_col(tags: Column) -> Column:
    """_extract_comment_ip_location (help.py:262-279): first ip_info tag's
    text, '' when absent."""
    ip = F.filter(tags, lambda t: t["type"] == "ip_info")
    # try_element_at: ANSI element_at throws on the empty no-ip-tag array
    return F.coalesce(F.try_element_at(ip, F.lit(1))["text"], F.lit(""))


def zhihu_comment_cols(c: Column) -> list[Column]:
    """Column projection of _extract_comment (help.py:232-260) over a
    struct matching ZHIHU_COMMENT_DDL. content passes through the
    byte-identical kernel; like/dislike falsy values default to 0 (the
    reference's ``x if x else 0`` zeroes None AND 0 alike)."""
    return [
        c["id"].alias("comment_id"),
        c["reply_comment_id"].alias("parent_comment_id"),
        _kernel(F.coalesce(c["content"], F.lit(""))).alias("content"),
        c["created_time"].alias("publish_time"),
        comment_ip_location_col(F.coalesce(c["comment_tag"], F.array())).alias("ip_location"),
        c["child_comment_count"].alias("sub_comment_count"),
        F.coalesce(F.nullif(c["like_count"], F.lit(0)), F.lit(0)).alias("like_count"),
        F.coalesce(F.nullif(c["dislike_count"], F.lit(0)), F.lit(0)).alias("dislike_count"),
    ]


def extract_zhihu_comments(pages: DataFrame, json_col: str = "body",
                           content_id_col: str = "content_id",
                           content_type_col: str = "content_type") -> DataFrame:
    """Reference-shaped comment-page JSON → ZhihuComment rows.

    Input columns: url, <json_col> (the root-comments page JSON:
    ``{"paging": {...}, "data": [comment, ...]}``), plus the parent
    content's id/type (threaded through like the reference's
    ``page_content`` arg). Non-comment rows (type != 'comment') are
    dropped (help.py:226-228, P5)."""
    page = F.from_json(F.col(json_col), ZHIHU_COMMENT_PAGE_DDL)
    exploded = pages.select(
        "url",
        F.col(content_id_col).alias("content_id"),
        F.col(content_type_col).alias("content_type"),
        F.posexplode_outer(page["data"]).alias("item_idx", "c"),
    ).filter(F.col("c")["type"] == "comment")
    c = F.col("c")
    return exploded.select(
        "url", "item_idx", "content_id", "content_type",
        *zhihu_comment_cols(c),
        *_author_cols(c["author"]),
    )


def extract_comment_py(comment: dict, content_id: str, content_type: str) -> dict:
    """Row-wise oracle: direct port of _extract_comment + the author
    member fallback (zhihu/help.py:186-260)."""
    from mediacrawler_spark.functions.text import extract_text_py

    def ip_loc(tags):
        for ct in tags or []:
            if ct.get("type") == "ip_info":
                return ct.get("text")
        return ""

    author = comment.get("author") or {}
    if not author.get("id"):
        author = author.get("member") or {}
    return {
        "comment_id": str(comment.get("id", "")),
        "parent_comment_id": comment.get("reply_comment_id"),
        "content": extract_text_py(comment.get("content") or ""),
        "publish_time": comment.get("created_time"),
        "ip_location": ip_loc(comment.get("comment_tag", [])),
        "sub_comment_count": comment.get("child_comment_count"),
        "like_count": comment.get("like_count") if comment.get("like_count") else 0,
        "dislike_count": comment.get("dislike_count") if comment.get("dislike_count") else 0,
        "content_id": content_id,
        "content_type": content_type,
        "user_id": author.get("id"),
        "user_link": ZHIHU_URL + "/people/" + author["url_token"] if author.get("url_token") is not None else None,
        "user_nickname": author.get("name"),
        "user_avatar": author.get("avatar_url"),
    }


def extract_zhihu_contents(pages: DataFrame, json_col: str = "body") -> DataFrame:
    """Content JSON (one entity per row, reference-shaped) + url →
    unified ZhihuContent rows, dispatched by URL type.

    Input columns: url, <json_col> (the raw entity JSON string).
    """
    t = judge_zhihu_url_col(F.col("url"))
    ans = F.from_json(F.col(json_col), ANSWER_DDL)
    art = F.from_json(F.col(json_col), ARTICLE_DDL)
    zv = F.from_json(F.col(json_col), ZVIDEO_DDL)

    content_id = (
        F.when(t == ANSWER_NAME, ans["id"])
        .when(t == ARTICLE_NAME, art["id"])
        .otherwise(zv["id"])
    )
    content_type = (
        F.when(t == ANSWER_NAME, ans["type"])
        .when(t == ARTICLE_NAME, art["type"])
        .otherwise(zv["type"])
    )
    # raw html-ish fields → byte-identical kernel (help.py:103-106,133-136,174-176)
    raw_text = (
        F.when(t == ANSWER_NAME, F.coalesce(ans["content"], F.lit("")))
        .when(t == ARTICLE_NAME, F.coalesce(art["content"], F.lit("")))
        .otherwise(F.lit(""))
    )
    raw_title = (
        F.when(t == ANSWER_NAME, F.coalesce(ans["title"], F.lit("")))
        .when(t == ARTICLE_NAME, F.coalesce(art["title"], F.lit("")))
        .otherwise(F.coalesce(zv["title"], F.lit("")))
    )
    raw_desc = (
        # answer: description or excerpt (help.py:106); article: excerpt
        F.when(t == ANSWER_NAME,
               F.coalesce(F.nullif(ans["description"], F.lit("")), ans["excerpt"], F.lit("")))
        .when(t == ARTICLE_NAME, F.coalesce(art["excerpt"], F.lit("")))
        .otherwise(F.coalesce(zv["description"], F.lit("")))
    )
    question_id = F.when(t == ANSWER_NAME, ans["question"]["id"])
    content_url = (
        F.when(t == ANSWER_NAME,
               F.concat(F.lit(ZHIHU_URL + "/question/"), ans["question"]["id"],
                        F.lit("/answer/"), ans["id"]))
        .when(t == ARTICLE_NAME, F.concat(F.lit(ZHIHU_ZHUANLAN_URL + "/p/"), art["id"]))
        .otherwise(zv["video_url"])  # non-creator-page zvideo branch (help.py:166-168)
    )
    created = (
        F.when(t == ANSWER_NAME, ans["created_time"])
        .when(t == ARTICLE_NAME,
              F.coalesce(F.nullif(art["created_time"], F.lit(0)), art["created"], F.lit(0)))
        .otherwise(zv["created_at"])
    )
    updated = (
        F.when(t == ANSWER_NAME, ans["updated_time"])
        .when(t == ARTICLE_NAME,
              F.coalesce(F.nullif(art["updated_time"], F.lit(0)), art["updated"], F.lit(0)))
        .otherwise(zv["updated_at"])
    )
    voteup = (
        F.when(t == ANSWER_NAME, F.coalesce(ans["voteup_count"], F.lit(0)))
        .when(t == ARTICLE_NAME, F.coalesce(art["voteup_count"], F.lit(0)))
        .otherwise(zv["voteup_count"])
    )
    n_comments = (
        F.when(t == ANSWER_NAME, F.coalesce(ans["comment_count"], F.lit(0)))
        .when(t == ARTICLE_NAME, F.coalesce(art["comment_count"], F.lit(0)))
        .otherwise(zv["comment_count"])
    )
    author = (
        F.when(t == ANSWER_NAME, ans["author"])
        .when(t == ARTICLE_NAME, art["author"])
        .otherwise(zv["author"])
    )
    return pages.select(
        F.col("url"),
        t.alias("url_type"),
        content_id.alias("content_id"),
        content_type.alias("content_type"),
        _kernel(raw_text).alias("content_text"),
        question_id.alias("question_id"),
        content_url.alias("content_url"),
        _kernel(raw_title).alias("title"),
        _kernel(raw_desc).alias("desc"),
        created.alias("created_time"),
        updated.alias("updated_time"),
        voteup.alias("voteup_count"),
        n_comments.alias("comment_count"),
        *_author_cols(author),
    )
