"""Property tests: Bloom-prefiltered dedup ≡ exact; politeness quota holds."""

from pyspark.sql import functions as F

from mediacrawler_spark.operators import scheduler, seen
from mediacrawler_spark.synth import build_robots


def _urls(spark, n, prefix, start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://{prefix}/"), F.col("id").cast("string")).alias("url")
    )


def test_bloom_equals_exact_dedup(spark):
    seen_df = _urls(spark, 400, "h.example", 0)
    # candidates: 200 overlapping + 300 new
    cands = _urls(spark, 500, "h.example", 200)
    for fpp in (0.5, 0.03, 0.001):
        got = seen.unseen_bloom_prefiltered(cands, seen_df, fpp=fpp)
        want = seen.unseen_exact(cands, seen_df)
        g = {r["url"] for r in got.collect()}
        w = {r["url"] for r in want.collect()}
        assert g == w, f"fpp={fpp}: bloom path diverged from exact"
        assert len(w) == 300


def test_bloom_never_drops_unseen(spark):
    seen_df = _urls(spark, 50, "a.example")
    cands = _urls(spark, 500, "b.example")  # fully disjoint
    got = seen.unseen_bloom_prefiltered(cands, seen_df, fpp=0.5)
    assert got.count() == 500


def test_bloom_empty_seen(spark):
    cands = _urls(spark, 100, "c.example")
    empty = spark.createDataFrame([], "url string")
    assert seen.unseen_bloom_prefiltered(cands, empty).count() == 100


def _frontier(spark, per_host):
    rows = []
    for host, n in per_host.items():
        for i in range(n):
            rows.append((f"https://{host}/p/{i}", host, i % 5, 0, "open", None, 0, 0, "kw", 0, i, 0, 0))
    return spark.createDataFrame(
        rows,
        "url string, host string, priority int, depth int, state string, cursor string, "
        "attempts int, not_before_round int, keyword string, page int, item_idx int, "
        "cursor_seq int, round_id int",
    )


def test_per_host_quota_never_exceeded(spark):
    robots = build_robots(spark)
    # hot host h0.xhs.example budget=40, h1 budget=200
    fr = _frontier(spark, {"h0.xhs.example": 500, "h1.xhs.example": 120})
    sched, denied = scheduler.select_round(fr, robots, round_id=0, n_salts=8)
    per_host = {r["host"]: r["n"] for r in sched.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host["h0.xhs.example"] == 40
    assert per_host["h1.xhs.example"] == 120
    assert denied.count() == 0


def test_salted_rank_equals_unsalted_selection(spark):
    """Two-phase salted rank must pick exactly the same URLs as a global
    per-host rank (budget correctness is per host, not per salt shard)."""
    robots = build_robots(spark)
    fr = _frontier(spark, {"h0.xhs.example": 300})
    got_salted, _ = scheduler.select_round(fr, robots, 0, n_salts=8)
    got_unsalted, _ = scheduler.select_round(fr, robots, 0, n_salts=1)
    a = {r["url"] for r in got_salted.select("url").collect()}
    b = {r["url"] for r in got_unsalted.select("url").collect()}
    assert a == b and len(a) == 40


def test_robots_denied_host_never_scheduled(spark):
    robots = build_robots(spark)
    fr = _frontier(spark, {"h3.xhs.example": 30, "h1.xhs.example": 10})
    sched, denied = scheduler.select_round(fr, robots, 0)
    assert sched.filter(F.col("host") == "h3.xhs.example").count() == 0
    assert denied.count() == 30
    assert {r["state"] for r in denied.select("state").distinct().collect()} == {"robots_denied"}


def test_unknown_host_defaults_allowed(spark):
    robots = build_robots(spark)
    fr = _frontier(spark, {"nowhere.example": 5})
    sched, denied = scheduler.select_round(fr, robots, 0)
    assert sched.count() == 5 and denied.count() == 0


def test_not_before_round_respected(spark):
    robots = build_robots(spark)
    fr = _frontier(spark, {"h1.xhs.example": 10}).withColumn(
        "not_before_round", F.lit(3)
    )
    sched, _ = scheduler.select_round(fr, robots, round_id=2)
    assert sched.count() == 0
    sched3, _ = scheduler.select_round(fr, robots, round_id=3)
    assert sched3.count() == 10
