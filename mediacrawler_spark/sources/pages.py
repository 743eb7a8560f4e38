"""Pages-table layout + scan helpers (the 100 TB-side of the fetch-join).

At target scale the pages table is an Iceberg table partitioned by
``days(warc_ts)`` and bucketed by url-hash; this module encodes the same
layout on plain parquet (the sandbox has no Iceberg runtime jar — the
logical semantics are identical, with MERGE replaced by
partition-overwrite + anti-join, SURVEY §4):

- ``write_pages``   — partitioned by (day, url_bucket); url-hash bucketing
  co-locates the fetch-join's probe side so a bucketed scheduled batch
  hits only matching files.
- ``scan_pages``    — column-pruned scan with optional time-range pruning
  (the bilibili pubtime mode, media_platform/bilibili/client.py:139-160 →
  partition pruning here) and host filter.

Keep projections narrow: ``html`` is the dominant column at scale; scans
that don't extract must never read it (see ``test_plans.py`` for the
ReadSchema assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_URL_BUCKETS = 64


def with_layout_cols(pages: DataFrame) -> DataFrame:
    return pages.withColumn("day", F.to_date("warc_ts")).withColumn(
        "url_bucket", F.pmod(F.xxhash64("url"), F.lit(N_URL_BUCKETS)).cast("int")
    )


def write_pages(pages: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        with_layout_cols(pages)
        .repartition("day", "url_bucket")
        .write.mode(mode)
        .partitionBy("day", "url_bucket")
        .parquet(path)
    )


def scan_pages(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    start_day: str | None = None,
    end_day: str | None = None,
    hosts: list[str] | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if start_day:
        df = df.filter(F.col("day") >= F.lit(start_day))  # partition-pruned
    if end_day:
        df = df.filter(F.col("day") < F.lit(end_day))
    if hosts:
        df = df.filter(F.col("host").isin(hosts))
    if columns:
        df = df.select(*columns)
    return df
