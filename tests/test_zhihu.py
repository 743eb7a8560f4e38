"""S12/E3 zhihu surface: column dispatch ≡ reference dispatch, Spark
extractor ≡ row-wise reference-semantics port over three-type fixtures,
plus per-branch goldens (kernel, excerpt fallback, created fallback,
author-member fallback, content_url rebuild)."""

import json

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth_zhihu
from mediacrawler_spark.functions.text import extract_text_py
from mediacrawler_spark.operators import zhihu as Z

N_DOCS = 30


@pytest.fixture(scope="module")
def pages(spark, documents):
    return synth_zhihu.build_zhihu_fixture_pages(
        documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= N_DOCS))
    ).cache()


# -- row-wise reference-semantics port (the oracle) -------------------------

def _author(a):
    if not a:
        return (None,) * 5
    if not a.get("id"):
        a = a.get("member")
    return (a.get("id"), f"{Z.ZHIHU_URL}/people/{a.get('url_token')}",
            a.get("name"), a.get("avatar_url"), a.get("url_token"))


def _ref_extract(url, body):
    t = Z.judge_zhihu_url(url)
    d = json.loads(body)
    if t == "answer":
        qid = d["question"]["id"]
        return dict(
            url_type=t, content_id=d["id"], content_type=d["type"],
            content_text=extract_text_py(d.get("content", "")),
            question_id=qid,
            content_url=f"{Z.ZHIHU_URL}/question/{qid}/answer/{d['id']}",
            title=extract_text_py(d.get("title", "")),
            desc=extract_text_py(d.get("description", "") or d.get("excerpt", "")),
            created_time=d.get("created_time"), updated_time=d.get("updated_time"),
            voteup_count=d.get("voteup_count", 0), comment_count=d.get("comment_count", 0),
            author=_author(d.get("author")),
        )
    if t == "article":
        return dict(
            url_type=t, content_id=d["id"], content_type=d["type"],
            content_text=extract_text_py(d.get("content", "")),
            question_id=None,
            content_url=f"{Z.ZHIHU_ZHUANLAN_URL}/p/{d['id']}",
            title=extract_text_py(d.get("title", "")),
            desc=extract_text_py(d.get("excerpt", "")),
            created_time=d.get("created_time", 0) or d.get("created", 0),
            updated_time=d.get("updated_time", 0) or d.get("updated", 0),
            voteup_count=d.get("voteup_count", 0), comment_count=d.get("comment_count", 0),
            author=_author(d.get("author")),
        )
    return dict(
        url_type=t, content_id=d["id"], content_type=d["type"],
        content_text="",
        question_id=None,
        content_url=d.get("video_url"),
        title=extract_text_py(d.get("title", "")),
        desc=extract_text_py(d.get("description", "")),
        created_time=d.get("created_at"), updated_time=d.get("updated_at"),
        voteup_count=d.get("voteup_count"), comment_count=d.get("comment_count"),
        author=_author(d.get("author")),
    )


def test_dispatch_matches_reference(spark, pages):
    got = {r["url"]: r["t"] for r in pages.select(
        "url", Z.judge_zhihu_url_col(F.col("url")).alias("t")).collect()}
    for url, t in got.items():
        assert t == Z.judge_zhihu_url(url), url
    assert set(got.values()) == {"answer", "article", "zvideo"}
    # reference order: /p/ checked before /zvideo/ (help.py:460-464)
    assert Z.judge_zhihu_url("https://zhuanlan.zhihu.com/p/123") == "article"
    assert Z.judge_zhihu_url("https://www.zhihu.com/question/1/answer/2") == "answer"
    assert Z.judge_zhihu_url("https://www.zhihu.com/zvideo/9") == "zvideo"
    assert Z.judge_zhihu_url("https://www.zhihu.com/people/x") == ""


def test_extractor_equals_reference_port(spark, pages):
    rows = Z.extract_zhihu_contents(pages).collect()
    raw = {r["url"]: r["body"] for r in pages.collect()}
    assert len(rows) == N_DOCS
    for r in rows:
        want = _ref_extract(r["url"], raw[r["url"]])
        for f in ("url_type", "content_id", "content_type", "content_text",
                  "question_id", "content_url", "title", "desc",
                  "created_time", "updated_time", "voteup_count", "comment_count"):
            assert r[f] == want[f], (r["url"], f, r[f], want[f])
        assert (r["user_id"], r["user_link"], r["user_nickname"],
                r["user_avatar"], r["user_url_token"]) == want["author"], r["url"]


def test_branch_goldens(spark, pages):
    rows = {r["content_id"]: r for r in Z.extract_zhihu_contents(pages).collect()}
    # answer (doc 3): kernel strips <p>/<script>, title <b> stripped,
    # description empty → excerpt fallback, url rebuilt from question id
    a = rows["a3"]
    assert a["content_text"].startswith("回答正文 ") and "<" not in a["content_text"]
    assert "script" not in a["content_text"]
    assert a["title"].startswith("问 标题3")
    assert a["desc"] == "摘要3"
    assert a["content_url"] == "https://www.zhihu.com/question/q3/answer/a3"
    assert a["question_id"] == "q3"
    # article (doc 4): created/updated fallback (no created_time field)
    p = rows["p4"]
    assert p["created_time"] == 1735689600 + 4 * 60
    assert p["updated_time"] == 1735689600 + 4 * 60 + 30
    assert p["content_url"] == "https://zhuanlan.zhihu.com/p/p4"
    # zvideo (doc 5): content_url = video_url, no content_text
    z = rows["z5"]
    assert z["content_url"] == "https://www.zhihu.com/zvideo/z5"
    assert z["content_text"] == ""
    assert z["desc"].startswith("视频描述 ")
    # author member-fallback on odd docs (doc 5 → member nesting)
    assert z["user_id"] == "u5" and z["user_url_token"] == "tok5"
    assert z["user_link"] == "https://www.zhihu.com/people/tok5"
    # plain author on even docs
    assert rows["p4"]["user_id"] == "u4"


def test_zhihu_plan_arrow_only(spark, pages):
    plan = Z.extract_zhihu_contents(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_zhihu_comments_equal_row_oracle(spark, documents):
    """E3 comments — the native column projection (extract_zhihu_comments)
    equals a row-wise port of _extract_comment + author member fallback
    (zhihu/help.py:186-260) on reference-shaped comment pages; the P5
    type filter drops non-comment items."""
    import json as _json
    from mediacrawler_spark.operators.zhihu import (
        extract_comment_py,
        extract_zhihu_comments,
    )
    from mediacrawler_spark.synth_zhihu import build_zhihu_comment_fixture_pages

    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 30))
    pages = build_zhihu_comment_fixture_pages(docs)
    got = {
        (r["url"], r["item_idx"]): (
            r["comment_id"], r["parent_comment_id"], r["content"], r["publish_time"],
            r["ip_location"], r["sub_comment_count"], r["like_count"], r["dislike_count"],
            r["content_id"], r["content_type"],
            r["user_id"], r["user_link"], r["user_nickname"], r["user_avatar"],
        )
        for r in extract_zhihu_comments(pages).collect()
    }
    want = {}
    for row in pages.collect():
        doc = _json.loads(row["body"])
        idx = 0
        for c in doc["data"]:
            if c.get("type") != "comment":
                idx += 1  # posexplode indexes BEFORE the type filter
                continue
            z = extract_comment_py(c, row["content_id"], row["content_type"])
            want[(row["url"], idx)] = (
                z["comment_id"], z["parent_comment_id"], z["content"], z["publish_time"],
                z["ip_location"], z["sub_comment_count"], z["like_count"], z["dislike_count"],
                z["content_id"], z["content_type"],
                z["user_id"], z["user_link"], z["user_nickname"], z["user_avatar"],
            )
            idx += 1
    assert got == want and len(got) == 2 * 30
    # branch pins: member-fallback author resolved, absent likes → 0,
    # ip_info tag found behind a non-ip tag, html content kernel-cleaned
    some = next(v for k, v in got.items() if v[0].endswith("b"))
    assert some[10].startswith("m") and some[6] == 0 and some[2] == "回 甲"
    lead = next(v for k, v in got.items() if v[0].endswith("a"))
    assert lead[4].startswith("IP属地") and "<p>" not in lead[2]
