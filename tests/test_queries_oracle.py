"""Every oracle-paired query must match DuckDB at sf0.001 (fast gate;
the driver repeats this at sf0.01)."""

import pytest

from mediacrawler_spark.queries import REGISTRY
from tools.oracle_check import compare, duck_con

PAIRED = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name,fn,sql", PAIRED, ids=[p[0] for p in PAIRED])
def test_query_matches_oracle(spark, sf_dir, con, name, fn, sql):
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    errs = compare(name, spark_pdf, duck_pdf)
    assert not errs, errs
