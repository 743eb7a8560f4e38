"""Physical-plan assertions: the optimizations the engine relies on at
100 TB must actually appear in the executed plans (SURVEY §4)."""

import pyspark.sql.functions as F

from mediacrawler_spark.sources import pages as pages_src


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fetch_join_broadcasts_scheduled_side(spark, documents):
    from mediacrawler_spark import synth

    pages = synth.build_pages(spark, None, documents=documents.limit(50))
    sched = synth.build_seeds(spark, None, documents=documents.limit(50))
    plan = _plan(pages.join(F.broadcast(sched.select("url")), "url"))
    assert "BroadcastHashJoin" in plan


def test_parquet_filter_pushdown_and_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to exactly the referenced columns + filter column
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in rs and "l_orderkey" in rs


def test_pages_layout_partition_pruning(spark, documents, tmp_path):
    from mediacrawler_spark import synth

    p = str(tmp_path / "pages")
    pages = synth.build_pages(spark, None, documents=documents.limit(80))
    pages_src.write_pages(pages, p)
    scan = pages_src.scan_pages(
        spark, p, columns=["url", "day"], start_day="2025-01-05", end_day="2025-01-20"
    )
    plan = _plan(scan)
    # day is a partition column: pruning happens at file listing, html never read
    assert "PartitionFilters" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in rs
    days = {str(r["day"]) for r in scan.select("day").distinct().collect()}
    assert days and all("2025-01-05" <= d < "2025-01-20" for d in days)


def test_whole_stage_codegen_on_relational_battery(spark, sf_dir):
    """Spark 4 renders codegen spans as '*(n)' markers; AQE only finalizes
    the plan after execution, so collect first."""
    from mediacrawler_spark.queries import q_agg_pricing, q_window_budget

    for q in (q_agg_pricing, q_window_budget):
        df = q(spark, sf_dir)
        df.collect()
        plan = _plan(df)
        assert "isFinalPlan=true" in plan and "*(" in plan, plan[:500]


def test_no_batch_eval_python_anywhere_in_registry(spark, sf_dir):
    """Row-at-a-time Python UDFs are banned engine-wide: every registry
    query's plan must use only Arrow paths (ArrowEvalPython/MapInPandas)."""
    from mediacrawler_spark.queries import REGISTRY

    for name, (fn, _sql) in REGISTRY.items():
        if name == "crawl_slice":
            continue  # runs an engine loop, not a single plan
        plan = _plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
