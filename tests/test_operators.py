"""Sanity + semantics tests for the training-data operators."""

from pyspark.sql import functions as F

from mediacrawler_spark.operators import dedup, multimodal, similarity
from mediacrawler_spark.operators.textstats import document_profile


def test_exact_dedup_finds_planted_duplicates(spark, documents):
    # plant exact dups: re-append 10 docs under new ids
    dups = documents.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    d = documents.unionByName(dups)
    groups = dedup.exact_dedup_groups(d).filter(F.col("n_dups") > 1)
    assert groups.count() == 10
    kept = dedup.exact_dedup_keep_first(d)
    assert kept.count() == documents.count()
    # canonical representative is the min doc_id (the original)
    assert kept.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_lsh_finds_planted_near_dups(spark, documents):
    # plant near-dups: copy of the text with one word appended
    near = documents.filter((F.col("doc_id") < 10) & (F.col("n_chars") > 200)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    n_planted = near.count()
    assert n_planted > 0
    d = documents.select("doc_id", "text").unionByName(near)
    found = dedup.minhash_near_dups(d, threshold=0.8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in found.collect()}
    for r in near.collect():
        orig = r["doc_id"] - 200000
        assert (orig, r["doc_id"]) in pairs, f"missed planted near-dup {orig}"


def test_simhash_near_identical_docs_collide(spark, documents):
    near = documents.filter((F.col("doc_id") < 5) & (F.col("n_chars") > 200)).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    d = documents.select("doc_id", "text").unionByName(near)
    cand = {(r["doc_a"], r["doc_b"]) for r in dedup.simhash_near_dups(d).collect()}
    for r in near.collect():
        assert (r["doc_id"] - 300000, r["doc_id"]) in cand


def test_brute_force_topk_self_excluded_and_sorted(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = similarity.brute_force_topk(e, query_vec_id=3, k=5).collect()
    assert len(top) == 5
    assert all(r["vec_id"] != 3 for r in top)
    sims = [r["cosine"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF probe must return vectors from the query's bucket with exact
    cosines; recall vs brute force is imperfect by design but > 0."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bf = {r["vec_id"] for r in similarity.brute_force_topk(e, 3, 10).collect()}
    ivf = {r["vec_id"] for r in similarity.ivf_topk(e, 3, 10).collect()}
    assert len(ivf) > 0
    assert len(bf & ivf) > 0


def test_rh_lsh_buckets_and_recall(spark, sf_dir):
    """LSH-bucketed ANN: buckets spread (not one mega-bucket), the probe
    returns rows, and identical vectors collide (the LSH invariant)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = similarity.assign_rh_buckets(e)
    n_buckets = b.select("bucket").distinct().count()
    assert n_buckets > 16  # 6 planes → up to 64; degenerate collapse would fail
    assert len(similarity.rh_lsh_topk(e, 0, 10).collect()) > 0
    # identical vector ⇒ identical signature (the LSH invariant)
    clone = e.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(900000))
    bb = similarity.assign_rh_buckets(e.unionByName(clone))
    got = {r["vec_id"]: r["bucket"] for r in bb.filter(F.col("vec_id").isin(0, 900000)).collect()}
    assert got[0] == got[900000]


def test_multimodal_features_deterministic(spark, documents):
    from mediacrawler_spark.synth import build_content_pages

    pages = build_content_pages(documents.limit(30))
    a = multimodal.binary_features(pages).orderBy("url").collect()
    b = multimodal.binary_features(pages).orderBy("url").collect()
    assert a == b
    for r in a:
        assert r["n_bytes"] > 0 and len(r["sha1"]) == 40
        assert 0.0 < r["byte_entropy"] <= 8.0
        assert 64 <= r["fake_width"] < 256


def test_multimodal_resize_shape_and_determinism(spark, documents):
    from mediacrawler_spark.synth import build_content_pages

    pages = build_content_pages(documents.limit(20))
    a = multimodal.resize_images(pages, width=8, height=8).orderBy("url").collect()
    b = multimodal.resize_images(pages, width=8, height=8).orderBy("url").collect()
    assert a == b and len(a) == 20
    for r in a:
        assert len(r["resized"]) == 8 * 8 * 3
        assert r["width"] == 8 and r["height"] == 8


def test_multimodal_sample_frames_one_to_n(spark, documents):
    from mediacrawler_spark.synth import build_content_pages

    pages = build_content_pages(documents.limit(20))
    frames = multimodal.sample_frames(pages, fps_ms=40).collect()
    by_url = {}
    for r in frames:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url) == 20
    for rows in by_url.values():
        rows.sort(key=lambda r: r["frame_idx"])
        assert 1 <= len(rows) <= 7
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert all(r["ts_ms"] == r["frame_idx"] * 40 for r in rows)
        assert all(len(r["frame"]) == 16 for r in rows)


def test_document_profile_langs(spark, documents):
    prof = document_profile(documents)
    langs = {r["lang_pred"] for r in prof.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "zh", "unk"}
    assert prof.filter(F.col("n_tokens") <= 0).count() == 0


def test_lang_id_detects_cjk(spark):
    from mediacrawler_spark.operators.textstats import lang_id_col

    rows = [
        ("全部都是中文字符的一段文本内容测试",),  # pure CJK → zh
        ("the quick brown fox is on the mat and in the box of the end",),  # en
        ("xyzzy qwerty plugh",),  # neither → unk
    ]
    df = spark.createDataFrame(rows, ["text"]).select(lang_id_col(F.col("text")).alias("lang"))
    assert [r["lang"] for r in df.collect()] == ["zh", "en", "unk"]


def test_gopher_quality_flags_discriminate(spark, documents):
    from mediacrawler_spark.operators.textstats import gopher_quality_flags

    flags = gopher_quality_flags(documents)
    keep = {r["keep"] for r in flags.select("keep").distinct().collect()}
    assert keep == {True, False}  # the gate must actually split the corpus
    # a synthetic spam doc fails, a normal English paragraph passes
    spam = " ".join(["###"] * 60)
    good = ("the quick brown fox jumps over the lazy dog and runs to the field "
            "of green grass with a friend on a warm day in the sun ") * 3
    df = spark.createDataFrame([(1, spam), (2, good)], ["doc_id", "text"])
    got = {r["doc_id"]: r["keep"] for r in gopher_quality_flags(df).collect()}
    assert got == {1: False, 2: True}


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing guarantee: docs sharing a substring of length ≥ k+w-1
    (here 27) must share ≥1 fingerprint; disjoint docs share none."""
    from mediacrawler_spark.operators.textstats import winnow_fingerprints

    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ!"  # length 27 = k+w-1
    rows = [
        (1, "xx" + shared + "yyyyyy"),
        (2, "qqqq" + shared + "zz"),
        (3, "0123456789012345678901234567890123"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_fingerprints(df).collect()}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
