"""Pre-stage the scaling-bench page corpora with a wide session.

The scaling worker stages its corpus on first touch, but a 2-core worker
staging a 1024x-amplified corpus wastes a bench slot on one-time setup.
This runs the identical staging write (same path, same bucketing — the
worker's integrity gate re-checks the 96-file layout) at local[32].

Usage: python tools/stage_corpus.py [amplify ...]   (default: 256 1024)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mediacrawler_spark import synth  # noqa: E402
from mediacrawler_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAGES_STAGE = os.environ.get("SPARK_GRAFT_PAGES_STAGE", "/tmp/scaling_pages")


def main() -> None:
    amps = [int(a) for a in sys.argv[1:]] or [256, 1024]
    cores = int(os.environ.get("SPARK_GRAFT_STAGE_CORES", "16"))
    spark = build_session(app_name="stage-corpus", master=f"local[{cores}]",
                          shuffle_partitions=96)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for amplify in amps:
        stage = f"{PAGES_STAGE}_x{amplify}_b"
        if os.path.isdir(stage):
            n = sum(1 for f in os.listdir(stage) if f.startswith("part-"))
            if n == 96:
                print(f"{stage}: already staged ({n} buckets)")
                continue
            print(f"{stage}: {n} buckets (truncated) — restaging")
        amp = spark.range(amplify).select(F.col("id").alias("rep"))
        docsA = docs.crossJoin(amp).select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        (
            synth.build_pages(spark, None, documents=docsA)
            .repartition(96, "url")
            .write.bucketBy(96, "url")
            .sortBy("url")
            .option("path", stage)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"pages_b{amplify}")
        )
        n = sum(1 for f in os.listdir(stage) if f.startswith("part-"))
        print(f"{stage}: staged {n} buckets")
        if n != 96:
            raise RuntimeError(f"staging produced {n} buckets, expected 96")
    spark.stop()


if __name__ == "__main__":
    main()
