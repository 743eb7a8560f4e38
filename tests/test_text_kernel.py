"""Byte-identity of the text-extraction kernel (the input_hint invariant).

The oracle ``extract_text_py`` is a direct CPython port of the reference
kernel (tools/crawler_util.py:194-203); the engine path is the Arrow UDF.
Golden cases exercise every branch: script/style stripping with DOTALL,
the backreference pairing, '>' inside attributes, entities, unicode,
``.strip()`` placement, empty/None input.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.functions.text import extract_text_py, extract_text_udf

GOLDEN = [
    "",
    "plain text no tags",
    "  leading and trailing   ",
    "<p>hello</p>",
    "<script>var x = 1;</script>visible",
    "<script type='a'>\nmultiline\nbody\n</script>after",
    "<style>.c { color: red }</style>styled",
    # script containing markup — DOTALL + lazy match
    '<script>var s = "<div>inner</div>";</script>ok',
    # style/script nesting order
    "<style>a</style><script>b</script>c<style>d</style>",
    # '>' inside attribute value: reference regex treats the first '>' as
    # the tag end — replicate, don't "fix"
    '<div title="a>b">x</div>',
    # unclosed script: backreference fails to pair → tags stripped instead
    "<script>orphan <b>bold</b>",
    # mismatched pair: <script>...</style> not matched by \1
    "<script>x</style>y",
    "&lt;not a tag&gt; &amp; entities stay",
    "中文文本<p>标签</p>混合 🙂",
    "<SCRIPT>upper case not matched by lowercase regex</SCRIPT>tail",
    "<p>a</p>\n\n<p>b</p>\n",
    None,
]


def test_oracle_reference_semantics():
    # spot-check the exact semantics of the reference regexes
    assert extract_text_py("<script>var x=1</script>hi") == "hi"
    assert extract_text_py('<div title="a>b">x</div>') == 'b">x'
    assert extract_text_py("  padded  ") == "padded"
    assert extract_text_py("") == ""
    assert extract_text_py(None) == ""
    # uppercase tags: reference pattern is case-sensitive for script/style
    # pairing but the generic tag regex still strips the tags themselves
    assert extract_text_py("<SCRIPT>body</SCRIPT>tail") == "bodytail"


@pytest.mark.parametrize("html", GOLDEN, ids=range(len(GOLDEN)))
def test_vectorized_matches_oracle_rowwise(html):
    s = pd.Series([html])
    got = extract_text_udf.func(s).iloc[0]
    assert got == extract_text_py(html)


def test_udf_byte_identity_on_corpus(spark, sf_dir):
    """Engine kernel output == row-wise oracle, byte for byte, per url."""
    from mediacrawler_spark.synth import build_pages

    pages = build_pages(spark, sf_dir).select("url", "html", "text").limit(300)
    rows = pages.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["text"] == extract_text_py(r["html"]), r["url"]


def test_udf_accepts_binary_column(spark):
    df = spark.createDataFrame(
        [("u1", "<p>héllo</p>".encode()), ("u2", None)], "url string, html binary"
    )
    out = {r["url"]: r["t"] for r in df.select("url", extract_text_udf(F.col("html")).alias("t")).collect()}
    assert out["u1"] == "héllo"
    assert out["u2"] == ""
