"""spark-submit entry point for the crawl engine (north-rule deployment shape).

Packages the engine and runs a crawl job on whatever cluster the submit
targets — the same code path the sandbox exercises on local[N]:

    python tools/submit_crawl.py --package          # build dist/mediacrawler_spark.zip
    spark-submit --py-files dist/mediacrawler_spark.zip \
        tools/submit_crawl.py --pages <parquet> --seeds <parquet> \
        --checkpoint <dir> [--mode search|detail] [--max-rounds N]

On a real cluster, --pages points at the Iceberg/parquet pages table and
the checkpoint dir at shared storage; executors at N or 4N scale the same
job (BENCH/BASELINE.md records the sandbox proxy measurements).
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def build_package(repo_root: str, out: str = "dist/mediacrawler_spark.zip") -> str:
    os.makedirs(os.path.join(repo_root, "dist"), exist_ok=True)
    out_path = os.path.join(repo_root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo_root, "mediacrawler_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, repo_root))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--package", action="store_true", help="build the --py-files zip and exit")
    ap.add_argument("--pages", help="pages table path (parquet/Iceberg)")
    ap.add_argument("--seeds", help="seeds parquet (url, priority, keyword); default: synthetic")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mode", choices=["detail", "search"], default="detail")
    ap.add_argument("--max-rounds", type=int, default=20)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.package:
        print(build_package(repo_root))
        return

    sys.path.insert(0, repo_root)
    from pyspark.sql import SparkSession

    from mediacrawler_spark import synth
    from mediacrawler_spark.plans.crawl import CrawlEngine

    spark = SparkSession.builder.appName("mediacrawler-crawl").getOrCreate()
    pages = spark.read.parquet(args.pages)
    robots = synth.build_robots(spark)
    if args.seeds:
        seeds = spark.read.parquet(args.seeds)
    elif args.mode == "search":
        seeds = synth.build_search_seeds(spark)
    else:
        raise SystemExit("--seeds required in detail mode")
    eng = CrawlEngine(
        spark, pages, robots,
        checkpoint_dir=args.checkpoint,
        crawl_creators=(args.mode == "search"),
    )
    res = eng.run(seeds, max_rounds=args.max_rounds, resume=args.resume)
    print(
        f"rounds={res.rounds} seen={res.seen.count()} content={res.content.count()} "
        f"comments={res.comments.count()} creators={res.creators.count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
