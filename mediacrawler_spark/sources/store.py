"""Sink layer (SURVEY §2.2 K1–K6): store-factory over Spark writers.

The reference has four sink impls selected by config string
(store/xhs/__init__.py:25-38): CSV append with manual file numbering
(xhs_store_impl.py:31-111), JSON array rewritten whole under a lock
(xhs_store_impl.py:175-257), DB upsert via query-then-insert/update
(xhs_store_impl.py:114-172), and media file writes. Spark equivalents:

- csv/json — native partitioned writers (the lock + O(n²) rewrite and the
  file-numbering dance disappear: each task writes its own part file).
- upsert   — MERGE-INTO semantics on parquet: new rows are anti-joined
  against the existing key set, updates overwrite matched keys while
  preserving ``add_ts`` (the reference keeps the original add_ts on
  update — WHEN NOT MATCHED in Iceberg MERGE; here: union of
  (kept-old ∪ updated ∪ inserted)). On a cluster this is a real Iceberg
  ``MERGE INTO``; the fallback keeps identical logical semantics.
- wordfreq — top-k word frequency JSON (K5, tools/words.py:41-83); the
  wordcloud PNG is presentation, out of engine scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SINKS = ("csv", "json", "parquet")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "append") -> None:
    """K1/K2/K6: store-factory dispatch → native writer."""
    if fmt not in SINKS:
        raise ValueError(f"unknown sink {fmt!r}; one of {SINKS}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)


def merge_upsert(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    key: str,
    add_ts_col: str = "add_ts",
    last_modify_col: str = "last_modify_ts",
    now_ms: int = 0,
) -> DataFrame:
    """K3: MERGE-INTO-keyed-on-id semantics (insert or update, preserving
    the original ``add_ts`` on update like the reference's dual
    insert/update SQL builders, async_db.py:51-95).

    ``now_ms`` is passed in (no wall clock in the engine — determinism).
    Returns the merged table (also persisted at ``path``).
    """
    new_rows = (
        new_rows.withColumn(add_ts_col, F.lit(now_ms).cast("long"))
        .withColumn(last_modify_col, F.lit(now_ms).cast("long"))
        .dropDuplicates([key])
    )
    if os.path.isdir(path):
        existing = spark.read.parquet(path)
        # updated rows: new values, original add_ts preserved
        updated = new_rows.alias("n").join(
            existing.select(key, F.col(add_ts_col).alias("_old_add_ts")).alias("e"),
            on=key,
            how="inner",
        ).withColumn(add_ts_col, F.col("_old_add_ts")).drop("_old_add_ts")
        kept = existing.join(new_rows.select(key), on=key, how="left_anti")
        inserted = new_rows.join(existing.select(key), on=key, how="left_anti")
        merged = kept.unionByName(updated).unionByName(inserted)
    else:
        merged = new_rows
    # Commit protocol: write the merged table to a fresh tmp dir, then swap
    # directories with two renames (old → .old, tmp → live) and drop .old.
    # A crash between the renames leaves either the old table or the new one
    # intact — never a half-overwritten live table — and no tmp copy leaks.
    # (On a cluster this whole function is an Iceberg `MERGE INTO`, whose
    # snapshot commit is truly atomic; this is the single-FS equivalent.)
    import shutil

    tmp = path.rstrip("/") + ".tmp"
    old = path.rstrip("/") + ".old"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return spark.read.parquet(path)


def write_wordfreq_json(documents: DataFrame, path: str, k: int = 20) -> None:
    """K5: top-k word-frequency JSON sink."""
    from mediacrawler_spark.operators.wordfreq import top_k_words

    top_k_words(documents, k=k).coalesce(1).write.mode("overwrite").json(path)


def write_media_files(
    media: DataFrame,
    base_dir: str,
    id_col: str = "note_id",
    name_col: str = "file_name",
    content_col: str = "content",
) -> DataFrame:
    """K4 — media file sink (store/xhs/xhs_store_media.py:24-69 and the
    video twin): one file per media row at ``{base_dir}/{id}/{name}``,
    bytes written verbatim, directories created on demand.

    Executes distributed: each Arrow batch writes its rows' files from the
    executor it lands on (``mapInPandas`` — the Python here IS the sink
    action, the reference's ``aiofiles.open(...).write`` exactly; no
    per-row Python enters any query plan). Path components are sanitized
    against separators/traversal. Returns the written manifest
    ``(media_path, n_bytes)`` — persisted as a SIBLING of the media tree
    (``{base_dir}_manifest``, not inside it: a media id sanitizing to
    '_manifest' must never collide with the manifest dir, and directory
    scans of base_dir must see only media ids) for lineage, the
    per-partition counters the north rule asks of every sink. The file
    writes happen as a side effect of the manifest job; a mid-job failure
    leaves the manifest absent (never partial — parquet commit protocol),
    so "files without a manifest" is detectable and the write idempotent
    to re-run.
    """
    import pandas as pd  # local import: executor-side closure stays light

    def _write(batches):
        for pdf in batches:
            paths, sizes = [], []
            for mid, name, blob in zip(pdf[id_col], pdf[name_col], pdf[content_col]):
                safe_id = str(mid).replace(os.sep, "_").replace("..", "_")
                safe_name = str(name).replace(os.sep, "_").replace("..", "_")
                d = os.path.join(base_dir, safe_id)
                os.makedirs(d, exist_ok=True)
                p = os.path.join(d, safe_name)
                with open(p, "wb") as f:
                    f.write(bytes(blob) if blob is not None else b"")
                paths.append(p)
                sizes.append(len(blob) if blob is not None else 0)
            yield pd.DataFrame({"media_path": paths, "n_bytes": sizes})

    manifest = media.select(id_col, name_col, content_col).mapInPandas(
        _write, schema="media_path string, n_bytes long"
    )
    manifest_dir = base_dir.rstrip("/") + "_manifest"
    manifest.write.mode("overwrite").parquet(manifest_dir)
    return media.sparkSession.read.parquet(manifest_dir)
