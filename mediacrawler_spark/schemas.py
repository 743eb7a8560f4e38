"""Table schemas for the crawl engine, declared once.

The reference defines its at-rest schema in MySQL DDL
(reference: ``schema/tables.sql``, 20 tables of varchar/bigint/longtext) and
its in-flight schema implicitly as Python dicts. Here every table is an
explicit ``StructType``; platform count-strings stay ``StringType`` at ingest
with derived long columns (SURVEY §1.2).

``PAGES`` is the authoritative input shape from BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: StructField) -> StructType:
    return StructType(list(fields))


# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages (BASELINE.json input_hint).
PAGES = _st(
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
)

# ---------------------------------------------------------------------------
# Frontier: the reference keeps crawl state in loop-local variables
# (page counter / cursor / has_more — e.g. media_platform/xhs/client.py:344-368);
# the engine materializes it as a table so it shards, checkpoints and resumes.
FRONTIER = _st(
    StructField("url", StringType(), False),
    StructField("host", StringType(), False),
    StructField("priority", IntegerType(), False),
    StructField("depth", IntegerType(), False),
    StructField("state", StringType(), False),  # open|done|blocked|failed|robots_denied
    StructField("cursor", StringType(), True),
    StructField("attempts", IntegerType(), False),
    StructField("not_before_round", IntegerType(), False),
    # deterministic crawl-ordering key (SURVEY §2.6 W4): the reference's
    # sequential keyword→page→item→cursor loop order, made explicit.
    StructField("keyword", StringType(), True),
    StructField("page", IntegerType(), False),
    StructField("item_idx", IntegerType(), False),
    StructField("cursor_seq", IntegerType(), False),
    StructField("round_id", IntegerType(), False),
)

SEEN = _st(
    StructField("url", StringType(), False),
    StructField("round_id", IntegerType(), False),
)

# Normalized content rows (reference: store/xhs/__init__.py:89-111 and the
# pydantic models model/m_baidu_tieba.py:18-35, model/m_zhihu.py:18-39).
CONTENT = _st(
    StructField("note_id", StringType(), False),
    StructField("url", StringType(), False),
    StructField("platform", StringType(), False),
    StructField("title", StringType(), True),
    StructField("desc", StringType(), True),
    StructField("text", StringType(), True),  # byte-identical extracted text
    StructField("user_id", StringType(), True),
    StructField("nickname", StringType(), True),
    StructField("liked_count", StringType(), True),  # platform count-string
    StructField("time", LongType(), True),  # epoch millis
    StructField("source_keyword", StringType(), True),
    StructField("ord_keyword", StringType(), True),
    StructField("ord_page", IntegerType(), True),
    StructField("ord_item_idx", IntegerType(), True),
    StructField("ord_cursor_seq", IntegerType(), True),
    StructField("round_id", IntegerType(), True),
)

# Two-level comment thread encoded relationally via parent_comment_id
# (reference: schema/tables.sql:396-406 ALTER adds parent_comment_id).
COMMENTS = _st(
    StructField("comment_id", StringType(), False),
    StructField("note_id", StringType(), False),
    StructField("parent_comment_id", StringType(), True),
    StructField("content", StringType(), True),
    StructField("create_time", LongType(), True),
    StructField("sub_comment_count", IntegerType(), True),
    StructField("ord_cursor_seq", IntegerType(), True),
    StructField("ord_item_idx", IntegerType(), True),
    StructField("round_id", IntegerType(), True),
)

CREATORS = _st(
    StructField("user_id", StringType(), False),
    StructField("nickname", StringType(), True),
    StructField("gender", StringType(), True),
    StructField("follows", StringType(), True),
    StructField("fans", StringType(), True),
    StructField("round_id", IntegerType(), True),
)

# Per-host politeness rules (FIXTURES.md §3); the reference has only global
# sleeps + a semaphore (config/base_config.py:77,109).
ROBOTS = _st(
    StructField("host", StringType(), False),
    StructField("allow", BooleanType(), False),
    StructField("crawl_delay_ms", LongType(), False),
    StructField("max_per_round", IntegerType(), False),
)

# Per-round, per-partition lineage/metrics (north_rule: resumable with
# per-partition lineage and fetch/parse counters).
METRICS = _st(
    StructField("round_id", IntegerType(), False),
    StructField("host", StringType(), False),
    StructField("scheduled", LongType(), False),
    StructField("fetched", LongType(), False),
    StructField("parsed", LongType(), False),
    StructField("failed", LongType(), False),
    StructField("deduped", LongType(), False),
)

EMBEDDINGS = _st(
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(StringType()), True),  # informational
    StructField("label", IntegerType(), True),
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "pages": PAGES,
    "frontier": FRONTIER,
    "seen": SEEN,
    "content": CONTENT,
    "comments": COMMENTS,
    "creators": CREATORS,
    "robots": ROBOTS,
    "metrics": METRICS,
}
