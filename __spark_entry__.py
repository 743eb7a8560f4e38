"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl slice (SURVEY §3.2 minimum slice:
seed frontier → politeness/robots scheduling → fetch-join → extraction →
content table) on sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY §2 plus the training-data battery; pairs
are defined side-by-side in ``mediacrawler_spark/queries.py`` and verified
locally by ``tools/oracle_check.py`` (the replica of the driver's gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mediacrawler_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2-round detail crawl over synthetic pages at sf0.001."""
    from mediacrawler_spark.queries import q_crawl_slice

    return q_crawl_slice(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
