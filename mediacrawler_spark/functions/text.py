"""Text-extraction kernel + string scalar functions.

The canonical text kernel replicates the reference's
``extract_text_from_html`` (reference: tools/crawler_util.py:194-203)
**byte-for-byte**: its exact regexes, DOTALL flag, backreference and
``.strip()`` placement. That single function feeds tieba and zhihu content
extraction in the reference (media_platform/tieba/help.py:157,191;
media_platform/zhihu/help.py:102,133,245), so the per-row invariant
"byte-identical extracted text per url" hinges on it.

Two implementations are provided and cross-checked in tests:

- ``extract_text_py``    — row-wise CPython port (the oracle);
- ``extract_text_udf``   — Arrow-batched pandas UDF (the engine path),
                           vectorized via ``pd.Series.str.replace``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType
from pyspark.sql.functions import pandas_udf

# Exact regexes of the reference kernel (tools/crawler_util.py:199-202).
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_py(html: str | bytes | None) -> str:
    """Row-wise oracle port of the reference kernel. Byte-identical output."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="strict")
    if not html:
        return ""
    clean_html = _SCRIPT_STYLE_RE.sub("", html)
    clean_text = _TAG_RE.sub("", clean_html).strip()
    return clean_text


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized kernel over a string or binary html column.

    Uses the same compiled regexes as the oracle; ``str.replace`` with a
    compiled pattern preserves flags (DOTALL) and backreferences, so the
    output is byte-identical to ``extract_text_py`` per row.
    """
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray)):
        html = html.map(lambda b: b.decode("utf-8") if b is not None else None)
    s = html.fillna("")
    s = s.str.replace(_SCRIPT_STYLE_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    return s.str.strip()


def html_as_string(col: Column) -> Column:
    """Decode the binary ``html`` column to a UTF-8 string, JVM-side."""
    return F.decode(col, "UTF-8")


# ---------------------------------------------------------------------------
# E7 — count-string → int (reference: tools/crawler_util.py:163-172):
# first run of digits, else 0. "1.2万"-style strings yield their leading
# integer part, exactly like the reference's `re.search(r'\d+')`.
def interact_count_col(c: Column) -> Column:
    return F.coalesce(
        F.nullif(F.regexp_extract(c, r"(\d+)", 1), F.lit("")).cast(LongType()),
        F.lit(0).cast(LongType()),
    ).alias("count")


# ---------------------------------------------------------------------------
# E13 — gender mapping. Note the platform inconsistency kept intact:
# xhs maps 1→'女',0→'男' (store/xhs/__init__.py:188-194) while zhihu maps
# 1→'男',0→'女' (media_platform/zhihu/help.py:301-316).
_GENDER_MAPS = {
    "xhs": {1: "女", 0: "男"},
    "zhihu": {1: "男", 0: "女"},
    "tieba": {"sex_male": "男", "sex_female": "女"},
}


def gender_col(c: Column, platform: str = "xhs") -> Column:
    m = _GENDER_MAPS[platform]
    expr: Column = F.lit(None).cast(StringType())
    for k, v in m.items():
        expr = F.when(c == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# E6 — URL parsing, all native (no UDF):
# note_id = last path segment before '?' (media_platform/xhs/help.py:294-306);
# params via parse_url; host via parse_url HOST.
def url_host_col(c: Column) -> Column:
    return F.parse_url(c, F.lit("HOST"))


def url_note_id_col(c: Column) -> Column:
    return F.element_at(F.split(F.element_at(F.split(c, r"\?"), 1), "/"), -1)


def url_param_col(c: Column, param: str) -> Column:
    return F.parse_url(c, F.lit("QUERY"), F.lit(param))


# ---------------------------------------------------------------------------
# E16 — cookie string ↔ map (tools/crawler_util.py:135-160); boundary only.
# Reference semantics (convert_str_cookie_to_dict): split on ';', strip each
# entry, keep only entries that split into exactly (name, value) — so this
# parses both reference-format strings (';'-joined, convert_cookies:138) and
# map_to_cookie_col's own output.
def cookie_to_map_col(c: Column) -> Column:
    parts = F.transform(F.split(c, ";"), lambda e: F.split(F.trim(e), "="))
    valid = F.filter(parts, lambda p: F.size(p) == 2)
    return F.map_from_entries(
        F.transform(
            valid,
            lambda p: F.struct(
                F.element_at(p, 1).alias("key"), F.element_at(p, 2).alias("value")
            ),
        )
    )


def map_to_cookie_col(c: Column) -> Column:
    entries = F.transform(
        F.map_entries(c), lambda e: F.concat_ws("=", e["key"], e["value"])
    )
    return F.array_join(entries, ";")


# ---------------------------------------------------------------------------
# E14 — list→CSV-string boundary compat (store/xhs/__init__.py:105-106):
# the engine keeps true arrays internally; `concat_ws(",")` only at the edge.
def array_to_csv_col(c: Column) -> Column:
    return F.concat_ws(",", c)


# ---------------------------------------------------------------------------
# E15 — map/struct→JSON-string store boundary (store/xhs/__init__.py:206-207:
# `json.dumps({tagType: name ...}, ensure_ascii=False)`). Spark's `to_json`
# emits the same compact `{"k":"v"}` form with non-ASCII preserved.
def map_to_json_col(c: Column) -> Column:
    return F.to_json(c)


# ---------------------------------------------------------------------------
# E20 — CDN URL builders (media_platform/xhs/help.py:274-291). The engine
# keeps the deterministic variants: `get_trace_id` (spectrum-path special
# case) and the all-CDNs `get_img_urls_by_trace_id`; the `random.choice`
# single-CDN variant is nondeterministic by design and excluded.
XHS_IMG_CDNS = [
    "https://sns-img-qc.xhscdn.com",
    "https://sns-img-hw.xhscdn.com",
    "https://sns-img-bd.xhscdn.com",
    "https://sns-img-qn.xhscdn.com",
]


def trace_id_col(img_url: Column) -> Column:
    last = F.element_at(F.split(img_url, "/"), -1)
    return F.when(
        img_url.contains("spectrum"), F.concat(F.lit("spectrum/"), last)
    ).otherwise(last)


def img_urls_by_trace_id_col(trace_id: Column, format_type: str = "png") -> Column:
    return F.array(*[
        F.concat(F.lit(cdn + "/"), trace_id, F.lit(f"?imageView2/format/{format_type}"))
        for cdn in XHS_IMG_CDNS
    ])
