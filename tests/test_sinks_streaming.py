"""Sink layer (K1–K6) + Structured Streaming variants."""

import json
import os

import pyspark.sql.functions as F
import pytest

from mediacrawler_spark.sources import store
from mediacrawler_spark.streaming import pipeline as sp


def test_store_factory_csv_json_parquet(spark, documents, tmp_path):
    df = documents.limit(20).select("doc_id", "lang", "source")
    for fmt in store.SINKS:
        p = str(tmp_path / fmt)
        store.write_table(df, p, fmt=fmt, mode="overwrite")
        if fmt == "csv":
            back = spark.read.option("header", True).csv(p)
        elif fmt == "json":
            back = spark.read.json(p)
        else:
            back = spark.read.parquet(p)
        assert back.count() == 20
    with pytest.raises(ValueError):
        store.write_table(df, str(tmp_path / "x"), fmt="avro")


def test_merge_upsert_preserves_add_ts(spark, documents, tmp_path):
    p = str(tmp_path / "content")
    v1 = documents.limit(10).select("doc_id", F.lit("v1").alias("val"))
    merged1 = store.merge_upsert(spark, v1, p, key="doc_id", now_ms=1000)
    assert merged1.count() == 10
    assert {r["add_ts"] for r in merged1.collect()} == {1000}

    # second batch: 5 updates + 5 inserts
    v2 = (
        documents.filter(F.col("doc_id") < 5)
        .select("doc_id", F.lit("v2").alias("val"))
        .unionByName(
            documents.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25)).select(
                "doc_id", F.lit("v2").alias("val")
            )
        )
    )
    merged2 = store.merge_upsert(spark, v2, p, key="doc_id", now_ms=2000)
    assert merged2.count() == 15
    rows = {r["doc_id"]: r for r in merged2.collect()}
    # updated rows keep original add_ts (reference K3 semantics) but bump value
    assert rows[0]["add_ts"] == 1000 and rows[0]["val"] == "v2" and rows[0]["last_modify_ts"] == 2000
    # untouched rows unchanged
    assert rows[7]["val"] == "v1" and rows[7]["last_modify_ts"] == 1000
    # inserted rows get new add_ts
    assert rows[20]["add_ts"] == 2000


def test_wordfreq_json_sink(spark, documents, tmp_path):
    p = str(tmp_path / "wf")
    store.write_wordfreq_json(documents, p, k=5)
    files = [f for f in os.listdir(p) if f.endswith(".json")]
    assert files
    rows = [json.loads(l) for f in files for l in open(os.path.join(p, f)) if l.strip()]
    assert len(rows) == 5
    assert all({"word", "freq"} <= set(r) for r in rows)


def test_streaming_windowed_metrics(spark, sf_dir):
    ev = sp.stream_events(spark, sf_dir)
    assert ev.isStreaming
    out = sp.run_to_memory(sp.windowed_event_metrics(ev), "win_metrics", spark)
    got = {(r["event_type"]): r["n"] for r in out.groupBy("event_type").agg(F.sum("n").alias("n")).collect()}
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_streaming_budget_gate_matches_batch_window(spark, sf_dir):
    ev = sp.stream_events(spark, sf_dir)
    out = sp.run_to_memory(sp.budget_gate_stream(ev, max_count=5), "budget_out", spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    want = (
        static.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id")
    )
    got_rows = {(r["user_id"], r["event_id"]) for r in out.select("user_id", "event_id").collect()}
    want_rows = {(r["user_id"], r["event_id"]) for r in want.collect()}
    # single-file trigger ⇒ one micro-batch ⇒ identical to the batch window
    assert got_rows == want_rows
    # budget invariant always holds
    per_user = out.groupBy("user_id").agg(F.count("*").alias("n"))
    assert per_user.filter(F.col("n") > 5).count() == 0


def test_media_file_sink_writes_reference_layout(spark, tmp_path):
    """K4 — media sink: one file per row at {base}/{note_id}/{file_name}
    with verbatim bytes (store/xhs/xhs_store_media.py:50-69), plus a
    (media_path, n_bytes) manifest. Path parts are sanitized."""
    from mediacrawler_spark.sources.store import write_media_files

    rows = [
        ("n1", "a.jpg", b"\x89PNGimg1"),
        ("n1", "b.mp4", b"\x00\x01videobytes"),
        ("n2", "a.jpg", b"other"),
        ("../evil", "x/../y.bin", b"z"),
        ("_manifest", "m.bin", b"mm"),  # must not collide with the manifest dir
    ]
    df = spark.createDataFrame(rows, "note_id string, file_name string, content binary")
    base = str(tmp_path / "media")
    manifest = write_media_files(df, base)

    got = {r["media_path"]: r["n_bytes"] for r in manifest.collect()}
    assert len(got) == 5
    # the manifest lives as a SIBLING of the media tree, so a media id
    # '_manifest' keeps its bytes and base_dir holds only media ids
    with open(os.path.join(base, "_manifest", "m.bin"), "rb") as f:
        assert f.read() == b"mm"
    assert os.path.isdir(base + "_manifest")
    p1 = os.path.join(base, "n1", "a.jpg")
    assert p1 in got and got[p1] == 8
    with open(p1, "rb") as f:
        assert f.read() == b"\x89PNGimg1"
    with open(os.path.join(base, "n2", "a.jpg"), "rb") as f:
        assert f.read() == b"other"
    # traversal-ish components are flattened, never escape base
    for p in got:
        assert os.path.realpath(p).startswith(os.path.realpath(base))


def test_fmm_tokenizer_matches_rowwise_and_plans_arrow(spark):
    """E18 — FMM segmentation: the Arrow UDF equals the row-wise kernel on
    mixed CJK/latin text, dictionary words win over single chars, and the
    plan uses ArrowEvalPython (never BatchEvalPython)."""
    from mediacrawler_spark.operators.wordfreq import (
        fmm_segment, fmm_tokens_col, word_freq,
    )

    dict_words = ["小红书", "爬虫", "数据", "中文分词"]
    texts = [
        "小红书爬虫抓取数据 spark engine 2024",
        "中文分词测试：小红书的数据很多",
        "no cjk here just words",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    out = df.select("i", fmm_tokens_col(F.col("t"), dict_words).alias("toks"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan

    got = {r["i"]: r["toks"] for r in out.collect()}
    for i, t in enumerate(texts):
        assert got[i] == fmm_segment(t, frozenset(dict_words), 4), (i, got[i])
    assert "小红书" in got[0] and "爬虫" in got[0] and "spark" in got[0]

    freq = {
        r["word"]: r["freq"]
        for r in word_freq(df.select(F.col("t").alias("text")), dict_words=dict_words).collect()
    }
    assert freq["小红书"] == 2 and freq["数据"] == 2
