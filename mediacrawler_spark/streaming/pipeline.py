"""Structured Streaming analogs (SURVEY §2.10).

The reference is a long-running incremental process whose state lives in
loop-local variables (cursor/has_more across await points,
media_platform/xhs/client.py:344-368) and whose "metrics" are log lines.
The engine's primary design is BSP rounds over materialized tables
(plans/crawl.py); this module provides the Structured-Streaming variants
for deployments that want a continuously-running pipeline:

- ``windowed_event_metrics`` — watermarked sliding-window counters over an
  event stream (per-host fetch/parse rates at scale; late events beyond
  the watermark are dropped deterministically).
- ``budget_gate_stream`` — ``applyInPandasWithState`` custom stateful
  operator: the streaming form of the W1 per-key budget (first
  ``max_count`` items per key across micro-batches — the reference's
  ``CRAWLER_MAX_COMMENTS_COUNT_SINGLENOTES`` cursor-loop guard,
  client.py:347-356, with the counter in the state store instead of a
  local variable).

Tested with file sources + ``availableNow`` triggers (batch-equivalent
semantics), which is exactly how a backfill over historical WARC data
would run.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_events(spark: SparkSession, sf_dir: str, staging_dir: str | None = None) -> DataFrame:
    """File-source stream over the events table (schema from static scan).

    The file source watches a *directory*; the driver-provided table is a
    single file, so it is staged (hard-linked/copied) into a scratch dir —
    which is also how real ingestion looks: files arriving in a landing
    directory, one micro-batch per file.
    """
    import shutil
    import tempfile

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    if staging_dir is None:
        staging_dir = tempfile.mkdtemp(prefix="events_stream_")
        dst = os.path.join(staging_dir, "events.parquet")
        try:
            os.link(f"{sf_dir}/events.parquet", dst)
        except OSError:
            shutil.copy(f"{sf_dir}/events.parquet", dst)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
        .where(F.col("event_id").isNotNull())
        # parquet stores TIMESTAMP_NTZ; event-time ops need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_event_metrics(
    events: DataFrame, window: str = "1 hour", slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed counts per event_type (A7 streaming analog)."""
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "total_value",
        )
    )


BUDGET_OUT_SCHEMA = "user_id long, event_id long, seq long"
BUDGET_STATE_SCHEMA = "n long"


def budget_gate_stream(events: DataFrame, max_count: int = 5) -> DataFrame:
    """Streaming W1: emit at most ``max_count`` events per user, counting
    across micro-batches via the state store."""

    def gate(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if n >= max_count:
                break
            pdf = pdf.sort_values(["ts", "event_id"])
            take = pdf.head(max_count - n)
            n += len(take)
            if len(take):
                yield pd.DataFrame(
                    {
                        "user_id": take["user_id"].astype("int64"),
                        "event_id": take["event_id"].astype("int64"),
                        "seq": range(n - len(take) + 1, n + 1),
                    }
                )
        state.update((n,))

    return events.groupBy("user_id").applyInPandasWithState(
        gate,
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, spark: SparkSession) -> DataFrame:
    """Drive a streaming DF to completion with availableNow → memory table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if "seq" in stream_df.columns else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
