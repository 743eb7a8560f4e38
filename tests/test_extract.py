"""Extraction operators: platform state blobs, comment cursor pages, E5 UDF."""

import json

import pandas as pd
from pyspark.sql import functions as F

from mediacrawler_spark.operators.extract import (
    extract_comment_pages,
    extract_content,
    xhs_initial_state_py,
    xhs_initial_state_udf,
)
from mediacrawler_spark.synth import build_comment_pages, build_content_pages


def test_extract_content_all_platforms(spark, documents):
    pages = build_content_pages(documents.limit(200))
    pages = pages.withColumn("text", F.lit("t"))
    out = extract_content(pages)
    rows = out.collect()
    assert len(rows) == 200
    plats = {r["platform"] for r in rows}
    assert plats == {"xhs", "tieba", "weibo", "zhihu", "douyin", "kuaishou", "bilibili"}
    for r in rows:
        assert r["note_id"].startswith("n"), r
        assert r["user_id"] is not None and r["user_id"].startswith("user"), r
        assert r["nickname"] is not None and r["nickname"].startswith("作者"), r
        if r["platform"] != "tieba":
            # tieba's data-field blob carries author only (reference
            # extracts body fields from xpath, ours via the text kernel)
            assert r["title"] == "title-" + r["note_id"], r
            assert r["time"] is not None and r["time"] >= 1735689600000, r


def test_extract_comment_pages_roundtrip(spark, documents):
    pages = build_comment_pages(documents.limit(120))
    out = extract_comment_pages(pages.select("url", "host", "html"))
    rows = out.collect()
    assert rows
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    for url, rs in by_url.items():
        # page-level fields consistent; item_idx dense from 0
        idxs = sorted(r["item_idx"] for r in rs)
        assert idxs == list(range(len(rs)))
        for r in rs:
            assert r["comment_id"].startswith(r["target_id"] + "c")
            assert r["kind"] == "comments"
    # cursor protocols (J2): spot-check the two integer-token platforms —
    # douyin page k (URL token k*10) answers cursor (k+1)*10; bilibili page
    # k answers next=k+1. Other platforms carry opaque/compound tokens.
    dy = [r for r in rows if ".douyin." in r["url"]]
    assert dy, "expected douyin comment pages in the slice"
    for r in dy:
        k = int(r["url"].split("cursor=")[1])
        assert int(r["next_cursor"]) == k + 10, r
    bl = [r for r in rows if ".bilibili." in r["url"]]
    assert bl, "expected bilibili comment pages in the slice"
    for r in bl:
        k = int(r["url"].split("cursor=")[1])
        assert int(r["next_cursor"]) == k + 1, r


def test_xhs_initial_state_udf_matches_oracle(spark, documents):
    # xhs content pages are API-first (S9): only the deterministic
    # API-empty subset carries the __INITIAL_STATE__ fallback blob; the
    # UDF≡oracle parity must hold on BOTH shapes (None on api-path pages).
    pages = build_content_pages(documents).filter(F.col("platform") == "xhs").limit(50)
    pdf = pages.select("url", "html").toPandas()
    via_udf = xhs_initial_state_udf.func(pdf["html"])
    n_fallback = 0
    for blob, html in zip(via_udf, pdf["html"]):
        assert blob == xhs_initial_state_py(bytes(html))
        if blob is None:
            assert b"__INITIAL_STATE__" not in bytes(html)
            continue
        n_fallback += 1
        obj = json.loads(blob)["note"]["note_detail_map"]
        obj = next(iter(obj.values()))["note"]
        # camelCase rewritten recursively; :undefined patched to null
        assert "user" in obj and "user_id" in obj["user"]
        assert "interact_info" in obj and "liked_count" in obj["interact_info"]
        assert obj["video_url"] is None
    assert n_fallback > 0, "expected API-empty fallback pages in the slice"


def test_xhs_snake_case_rewrite_edge_cases():
    html = '<script>window.__INITIAL_STATE__={"aB":{"innerKey":[{"deepCamelCase":1}]},"x":undefined}</script>'
    out = json.loads(xhs_initial_state_py(html))
    assert out == {"a_b": {"inner_key": [{"deep_camel_case": 1}]}, "x": None}
    assert xhs_initial_state_py("no state here") is None
    assert xhs_initial_state_py(None) is None


def test_no_per_row_python_in_extraction_plans(spark, documents):
    """Engine rule: only ArrowEvalPython / MapInPandas, never BatchEvalPython."""
    pages = build_content_pages(documents.limit(10)).withColumn("text", F.lit("t"))
    plan = extract_content(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    from mediacrawler_spark.synth import build_pages

    plan2 = build_pages(spark, None, documents=documents.limit(10))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2


def test_video_url_arr_matches_reference_semantics(spark):
    """P7 — the nested video-URL fallback chain byte-matches a row-wise port
    of the reference's get_video_url_arr (store/xhs/__init__.py:41-65)."""
    from mediacrawler_spark.operators.extract import XHS_VIDEO_DDL, video_url_arr_col

    def ref_get_video_url_arr(note_item):
        if note_item.get("type") != "video":
            return []
        video_arr = []
        ovk = note_item.get("video").get("consumer").get("origin_video_key")
        if ovk == "":
            ovk = note_item.get("video").get("consumer").get("originVideoKey")
        if ovk == "":
            videos = note_item.get("video").get("media").get("stream").get("h264")
            if type(videos).__name__ == "list":
                video_arr = [v.get("master_url") for v in videos]
        else:
            video_arr = [f"http://sns-video-bd.xhscdn.com/{ovk}"]
        return video_arr

    cases = [
        {"type": "normal", "video": {"consumer": {"origin_video_key": "k1", "originVideoKey": ""},
                                     "media": {"stream": {"h264": []}}}},
        {"type": "video", "video": {"consumer": {"origin_video_key": "snake9", "originVideoKey": "camel9"},
                                    "media": {"stream": {"h264": [{"master_url": "https://v/x"}]}}}},
        {"type": "video", "video": {"consumer": {"origin_video_key": "", "originVideoKey": "camelOnly"},
                                    "media": {"stream": {"h264": [{"master_url": "https://v/y"}]}}}},
        {"type": "video", "video": {"consumer": {"origin_video_key": "", "originVideoKey": ""},
                                    "media": {"stream": {"h264": [{"master_url": "https://v/a"},
                                                                  {"master_url": "https://v/b"}]}}}},
        {"type": "video", "video": {"consumer": {"origin_video_key": "", "originVideoKey": ""},
                                    "media": {"stream": {"h264": []}}}},
    ]
    df = spark.createDataFrame(
        [(i, json.dumps(c)) for i, c in enumerate(cases)], "i int, j string"
    ).withColumn("note", F.from_json(F.col("j"), XHS_VIDEO_DDL))
    got = {r["i"]: r["urls"] for r in df.select("i", video_url_arr_col(F.col("note")).alias("urls")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == ref_get_video_url_arr(c), (i, got[i])


def test_video_url_arr_absent_keys(spark):
    """Documented deviation: ABSENT keys degrade like '' instead of the
    reference's quirks (absent snake_case key → '.../None' URL; absent
    video/consumer struct → AttributeError). Pins the engine's choice."""
    from mediacrawler_spark.operators.extract import XHS_VIDEO_DDL, video_url_arr_col

    cases = {
        # absent origin_video_key (reference would emit '.../None'):
        # falls through to the camelCase key
        0: ('{"type":"video","video":{"consumer":{"originVideoKey":"cam"},'
            '"media":{"stream":{"h264":[{"master_url":"https://v/h"}]}}}}',
            ["http://sns-video-bd.xhscdn.com/cam"]),
        # both keys absent: falls through to h264 list
        1: ('{"type":"video","video":{"consumer":{},'
            '"media":{"stream":{"h264":[{"master_url":"https://v/h"}]}}}}',
            ["https://v/h"]),
        # absent video struct entirely (reference raises): empty array
        2: ('{"type":"video"}', []),
        # absent h264 list with both keys absent: empty array
        3: ('{"type":"video","video":{"consumer":{}}}', []),
    }
    df = spark.createDataFrame(
        [(i, j) for i, (j, _) in cases.items()], "i int, j string"
    ).withColumn("note", F.from_json(F.col("j"), XHS_VIDEO_DDL))
    got = {r["i"]: r["urls"] for r in df.select("i", video_url_arr_col(F.col("note")).alias("urls")).collect()}
    for i, (_, want) in cases.items():
        assert got[i] == want, (i, got[i])
