"""Scalar function library (SURVEY §2.9 E1–E20).

Native ``pyspark.sql.functions`` column expressions wherever they are
byte-compatible with the reference helpers; Arrow-vectorized pandas UDFs
otherwise. No row-at-a-time Python UDFs anywhere.
"""

from mediacrawler_spark.functions.text import (  # noqa: F401
    extract_text_py,
    extract_text_udf,
    interact_count_col,
    gender_col,
    url_host_col,
    url_note_id_col,
    url_param_col,
)
