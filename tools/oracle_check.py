"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every entry in ``mediacrawler_spark.queries.REGISTRY`` at the given
scale factor, executes the paired oracle SQL in DuckDB over the same
parquet, and compares: row count, sorted column names, and values under a
canonical (all-columns-sorted) row order. Exit code 1 on any mismatch.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np
                av, bv = a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float)
                bad = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
                exact = int(bad.sum())
                if exact:
                    errs.append(f"col {c}: {exact} value mismatches (max abs diff {abs(av - bv)[bad].max():.3e})")
            else:
                neq = (a[c].astype(str) != b[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    errs.append(f"col {c}: {int(neq.sum())} mismatches e.g. spark={a[c][i]!r} duck={b[c][i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from mediacrawler_spark.queries import REGISTRY
    from mediacrawler_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    failures = 0
    from mediacrawler_spark.session import release_persisted

    for name, (fn, sql) in REGISTRY.items():
        # Release the previous entry's tracked materialization caches (LSH
        # band tables etc.) so per-query timings and memory are independent
        # and the session never accumulates dead cached tables.
        release_persisted()
        spark.catalog.clearCache()
        if only and name not in only:
            continue
        if sql is None:
            t0 = time.time()
            try:
                n = fn(spark, sf_dir).count()
                print(f"[rows-only] {name}: {n} rows ({time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"[FAIL]      {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            duck_pdf = con.execute(sql).fetchdf()
            errs = compare(name, spark_pdf, duck_pdf)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[FAIL]      {name}: {type(e).__name__}: {str(e).splitlines()[0][:300]}")
            continue
        if errs:
            failures += 1
            print(f"[MISMATCH]  {name}: " + "; ".join(errs))
        else:
            print(f"[OK]        {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    release_persisted()
    spark.catalog.clearCache()
    leftover = spark.sparkContext._jsc.getPersistentRDDs().size()
    print(f"[cache] persistent RDDs after gate: {leftover}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
