"""The crawl engine: BSP rounds over a materialized frontier table.

The reference's crawl "plan" is hard-coded sequential control flow — per
keyword page loops, per-note comment cursor loops, per-comment sub-cursor
loops (media_platform/xhs/core.py:116-169, client.py:325-428), creator-posts
cursor loops (xhs/client.py:473-519), and the bilibili fans/followings/
dynamics walks (bilibili/client.py:394-546, core.py:553-657) — with all
state in loop-local variables and politeness enforced by sleeps + a
semaphore of 1 (config/base_config.py:77,109). The engine re-expresses that
as **iterative DataFrame rounds** (SURVEY §3 lifecycle mapping):

    round k:
      select   — robots gate + per-host politeness window + priority
                 (operators.scheduler; salted two-phase rank for hot hosts)
      fetch    — fetch-join of the scheduled batch against the pages table
                 (J1/S8; broadcast below threshold, co-located bucketed
                 equi-join above — the 100 TB pages scan stays pruned)
      parse    — ONE extraction pass immediately after the fetch-join
                 (operators.extract.parse_round): html decoded exactly once
                 per page into a narrow per-kind struct row; only that
                 narrow frame is cached — the html binary is never
                 persisted and never re-read (the round-1 scale-killer).
      expand   — content/comment/search/creator/posts/contact/dynamics
                 rows + next-cursor frontier emissions, all from the
                 parsed frame (frontier lineage rides along: no
                 self-joins back to the scheduled batch)
      dedup    — Bloom-prefiltered exact anti-join vs seen (operators.seen)
      merge    — frontier' = leftover + retries + new URLs; seen' += fetched;
                 checkpoint everything, truncating lineage

Driver does orchestration only — every data operation is a distributed
DataFrame op. State lives in checkpointed tables (parquet here; Iceberg
MERGE on a cluster — same logical semantics), so the crawl **resumes** from
the last completed round (north_rule; stronger than the reference, which
only has store-time dedup + START_PAGE skip, SURVEY §2.10). All per-round
output tables (content, comments, creators, contacts, dynamics, metrics,
denied, failed) are written per-round as per-table parquet shards whose
write jobs run thread-parallel under one round-commit marker.

Determinism: the crawl order is defined by explicit ordering-key columns
(keyword, page, item_idx, cursor_seq — W4), never by partition iteration
order; within-round URL collisions resolve to the MIN ordering key; frontier
rows carry the reference's per-platform cursor strings (S2/S3/S7 pagination
math) in the ``cursor`` column. Equivalence with a sequential
reference-semantics simulator is asserted in tests/test_crawl_equivalence.py.
"""

from __future__ import annotations

import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from mediacrawler_spark.functions.text import extract_text_udf, url_note_id_col
from mediacrawler_spark.operators import extract as X
from mediacrawler_spark.operators import scheduler as sched
from mediacrawler_spark.operators import seen as seen_ops

MAX_ATTEMPTS = 3  # reference: tenacity 3 retries (xhs/client.py:82)

_FRONTIER_COLS = [
    "url", "host", "priority", "depth", "state", "cursor", "attempts",
    "not_before_round", "keyword", "page", "item_idx", "cursor_seq", "round_id",
]

# Discovered-seed schema shared by every expansion path (cursor_val = the
# reference-identical pagination cursor this URL would be requested with).
_SEED_DDL = (
    "url string, host string, priority int, depth int, keyword string, "
    "page int, item_idx int, cursor_seq int, cursor_val string"
)

_FRONTIER_DDL = (
    "url string, host string, priority int, depth int, state string, "
    "cursor string, attempts int, not_before_round int, keyword string, "
    "page int, item_idx int, cursor_seq int, round_id int"
)

# Round-output table schemas (used to reconstruct empty frames when a round
# produced no rows for a table — the round write then has no subdir).
# ``frontier`` (next round's state) and ``seen`` (this round's fetched URLs,
# the append-only seen log) are written in the SAME round transaction as the
# ten output tables: per-table native-schema parquet jobs submitted
# thread-parallel, committed by one driver-side round marker — the Iceberg
# multi-table-transaction shape this maps to on a cluster. (History: one
# unified partitionBy mux write was tried first and bound the 2→8 scaling
# matrix at 0.34–0.46 write efficiency; parallel per-table jobs keep the
# extra cores busy through each job's encode/commit tail.)
DELTA_DDL = {
    "content": (
        "note_id string, url string, platform string, title string, desc string, "
        "text string, user_id string, nickname string, liked_count string, time bigint, "
        "source_keyword string, ord_keyword string, ord_page int, ord_item_idx int, "
        "ord_cursor_seq int, round_id int"
    ),
    "comments": (
        "comment_id string, note_id string, parent_comment_id string, content string, "
        "create_time bigint, sub_comment_count int, ord_cursor_seq int, ord_item_idx int, "
        "round_id int"
    ),
    "creators": (
        "url string, host string, platform string, user_id string, nickname string, "
        "gender string, follows string, fans string, round_id int"
    ),
    # J5 — the bilibili contact edge store keeps (up_id, fan_id) with
    # swapped args for followings (store/bilibili/__init__.py:138-161).
    "contacts": (
        "up_id string, fan_id string, src_kind string, contact_name string, "
        "ord_cursor_seq int, ord_item_idx int, round_id int"
    ),
    # S16 — dynamics rows (store/bilibili/__init__.py:164-183 field set).
    "dynamics": (
        "dynamic_id string, user_id string, text string, dynamic_type string, "
        "pub_ts bigint, comment_count int, like_count int, ord_cursor_seq int, "
        "ord_item_idx int, round_id int"
    ),
    "metrics": (
        "round_id int, host string, scheduled bigint, fetched bigint, parsed bigint, "
        "failed bigint, deduped bigint"
    ),
    # S10 in-loop — full TiebaNote field set from thread-detail pages
    # (model/m_baidu_tieba.py:18-35 via operators/tieba.extract_note_detail)
    "tieba_notes": (
        "note_id string, title string, desc string, note_url string, "
        "user_link string, user_nickname string, user_avatar string, "
        "tieba_name string, tieba_link string, ip_location string, "
        "publish_time string, total_replay_num string, total_replay_page string, "
        "ord_keyword string, ord_page int, ord_item_idx int, ord_cursor_seq int, "
        "round_id int"
    ),
    # E3 comments in-loop — full ZhihuComment field set
    # (model/m_zhihu.py:42-61 via operators/zhihu.zhihu_comment_cols)
    "zhihu_comments": (
        "comment_id string, parent_comment_id string, content string, "
        "publish_time bigint, ip_location string, sub_comment_count int, "
        "like_count int, dislike_count int, content_id string, "
        "user_id string, user_link string, user_nickname string, user_avatar string, "
        "ord_cursor_seq int, ord_item_idx int, round_id int"
    ),
    "denied": _FRONTIER_DDL,
    "failed": _FRONTIER_DDL,
    "seen": "url string, round_id int",
    "frontier": _FRONTIER_DDL,
}

# user-facing round outputs (accumulated into CrawlResult tables)
_DELTA_ORDER = [k for k in DELTA_DDL if k not in ("seen", "frontier")]
# everything the per-round multiplexed write carries
_MUX_ORDER = list(DELTA_DDL)


_DELTA_COLS: dict[str, list[str]] = {}


def _delta_cols(name: str) -> list[str]:
    """Cached DDL-order column names per table (fromDDL is a py4j
    round-trip; 12 tables × rounds adds up in the driver loop)."""
    if name not in _DELTA_COLS:
        _DELTA_COLS[name] = [
            f.name for f in StructType.fromDDL(DELTA_DDL[name]).fields
        ]
    return _DELTA_COLS[name]


_RC: dict | None = None
# process-wide cache of the seed fan-out Column tree, keyed by the engine
# budget config it bakes in (see CrawlEngine._seed_array_col)
_SEED_ARR_CACHE: dict[tuple, object] = {}


def _seed_cols(url_col, host_col, priority, depth, keyword, page, item_idx,
               cursor_seq, cursor_val):
    return [
        url_col.alias("url"), host_col.alias("host"),
        priority.cast("int").alias("priority"), depth.cast("int").alias("depth"),
        keyword.alias("keyword"), page.cast("int").alias("page"),
        item_idx.cast("int").alias("item_idx"), cursor_seq.cast("int").alias("cursor_seq"),
        cursor_val.cast("string").alias("cursor_val"),
    ]


# Seed rows as a nested type: the whole per-round link-discovery fan-out
# (14 logical branches in round 2) is ONE projection over the parsed frame
# — each branch contributes an array<seed_struct> guarded by its kind
# predicate, concatenated and exploded once. vs. the former 14-branch
# unionByName: one cache scan instead of 14, no union shuffle lineage, and
# ~6 s/round less driver-side plan analysis (each DataFrame op re-analyzes
# its whole subtree; 14 branches × deep parse tree was the round loop's
# dominant fixed cost).
_SEED_ARR_DDL = (
    "array<struct<url:string,host:string,priority:int,depth:int,"
    "keyword:string,page:int,item_idx:int,cursor_seq:int,cursor_val:string>>"
)


def _sstruct(url, host, priority, depth, keyword, page, item_idx,
             cursor_seq, cursor_val):
    return F.struct(
        url.cast("string").alias("url"), host.cast("string").alias("host"),
        priority.cast("int").alias("priority"), depth.cast("int").alias("depth"),
        keyword.cast("string").alias("keyword"), page.cast("int").alias("page"),
        item_idx.cast("int").alias("item_idx"),
        cursor_seq.cast("int").alias("cursor_seq"),
        cursor_val.cast("string").alias("cursor_val"),
    )


def _guard(cond, arr):
    """Piece of the seed array: ``arr`` where ``cond`` holds, else empty
    (NULL/false conditions both collapse to the typed empty array, exactly
    like the former per-branch ``filter(cond)``)."""
    return F.coalesce(F.when(cond, arr), F.array().cast(_SEED_ARR_DDL))


def _round_cols() -> dict:
    """Static per-round column lists, built once per process (the round
    loop re-issues these plans every round; caching the unresolved Columns
    removes ~1-2 s/round of py4j plan-construction latency). Round-scoped
    literals (round_id, not_before_round) are attached via withColumn."""
    global _RC
    if _RC is not None:
        return _RC
    c = F.col
    _RC = {
        # content rows from parsed kind=='content' rows
        "content": [
            c("content.note_id").alias("note_id"), c("url"), c("platform"),
            c("content.title").alias("title"), c("content.desc").alias("desc"),
            c("text"),
            c("content.user_id").alias("user_id"),
            c("content.nickname").alias("nickname"),
            c("content.liked_count").alias("liked_count"),
            c("content.time").alias("time"),
            c("keyword").alias("source_keyword"),
            c("keyword").alias("ord_keyword"),
            c("page").alias("ord_page"),
            c("item_idx").alias("ord_item_idx"),
            c("cursor_seq").alias("ord_cursor_seq"),
        ],
        # (seed emission lives in CrawlEngine._seed_array_col — J2 initial
        # cursors, cursor walks, tieba page ranges, search/posts fan-out)
        # comment-page explosion: stage1 keeps page-level cursor info +
        # lineage, stage2 flattens the exploded comment struct. note_id
        # is resolved per-protocol in parse (cpage.note_id).
        "cx_stage1": [
            c("url"), c("host"), c("platform"), c("kind"),
            c("cpage.target_id").alias("target_id"),
            c("cpage.note_id").alias("note_id_pg"),
            c("cpage.has_more").alias("has_more"),
            c("cpage.next_cursor").alias("next_cursor"),
            c("priority"), c("depth"), c("keyword"), c("page"),
            c("item_idx").alias("f_item_idx"), c("cursor_seq"),
            F.posexplode_outer(c("cpage.comments")).alias("item_idx", "cm"),
        ],
        "cx_stage2": [
            c("url"), c("host"), c("platform"), c("kind"), c("target_id"),
            c("note_id_pg"), c("has_more"),
            c("next_cursor"), c("priority"), c("depth"), c("keyword"), c("page"),
            c("f_item_idx"), c("cursor_seq"), c("item_idx"),
            c("cm.id").alias("comment_id"),
            c("cm.content").alias("content"),
            c("cm.create_time").alias("create_time"),
            c("cm.sub_comment_count").alias("sub_comment_count"),
            # weibo inline second-level comments (weibo/client.py:205-210:
            # subs ride ON the parent objects; weibo never fetches sub pages)
            c("cm.subs").alias("subs"),
        ],
        "comments": [
            c("comment_id"),
            c("note_id_pg").alias("note_id"),
            F.when(c("kind") == "subcomments", c("target_id"))
            .otherwise(F.lit(None).cast("string")).alias("parent_comment_id"),
            # zhihu comment bodies are HTML → byte-identical kernel
            # (zhihu/help.py:245); other platforms' are already plain text.
            # NULL-guarded input: non-zhihu rows ship Arrow nulls only.
            F.coalesce(
                extract_text_udf(
                    F.when((c("platform") == "zhihu")
                           & c("kind").isin("comments", "subcomments"),
                           c("content"))
                ),
                c("content"),
            ).alias("content"),
            c("create_time"), c("sub_comment_count"),
            c("cursor_seq").alias("ord_cursor_seq"),
            c("item_idx").alias("ord_item_idx"),
        ],
        # creators (S13)
        "creators": [
            c("url"), c("host"), c("platform"),
            c("creator.user_id").alias("user_id"),
            c("creator.nickname").alias("nickname"),
            c("creator.gender").alias("gender"),
            c("creator.follows").alias("follows"),
            c("creator.fans").alias("fans"),
        ],
        # fans/followings explosion (S15/J5)
        "fx": [
            c("url"), c("host"), c("kind"), c("keyword"), c("page"),
            c("cursor_seq"),
            c("fpage.target_uid").alias("target_uid"),
            F.posexplode_outer(c("fpage.users")).alias("fx_idx", "u"),
        ],
        # contact edge rows: fans page of U → (up=U, fan=item); followings
        # page of U → (up=item, fan=U) — the reference's swapped-args store
        # (store/bilibili/__init__.py:149-161)
        "contacts": [
            F.when(c("kind") == "fans", c("target_uid")).otherwise(c("u.id")).alias("up_id"),
            F.when(c("kind") == "fans", c("u.id")).otherwise(c("target_uid")).alias("fan_id"),
            c("kind").alias("src_kind"),
            c("u.name").alias("contact_name"),
            c("cursor_seq").alias("ord_cursor_seq"),
            c("fx_idx").alias("ord_item_idx"),
        ],
        # dynamics explosion (S16)
        "dx": [
            c("url"), c("host"), c("keyword"), c("page"), c("cursor_seq"),
            c("dpage.target_uid").alias("target_uid"),
            F.posexplode_outer(c("dpage.items")).alias("dx_idx", "it"),
        ],
        "dynamics": [
            c("it.id").alias("dynamic_id"),
            c("target_uid").alias("user_id"),
            c("it.text").alias("text"),
            c("it.type").alias("dynamic_type"),
            c("it.pub_ts").alias("pub_ts"),
            c("it.comment_count").alias("comment_count"),
            c("it.like_count").alias("like_count"),
            c("cursor_seq").alias("ord_cursor_seq"),
            c("dx_idx").alias("ord_item_idx"),
        ],
        "new_frontier": [
            c("url"), c("host"),
            c("priority").cast("int").alias("priority"),
            c("depth").cast("int").alias("depth"),
            F.lit("open").alias("state"),
            c("cursor_val").cast("string").alias("cursor"),
            F.lit(0).alias("attempts"),
            c("keyword"), c("page"), c("item_idx"), c("cursor_seq"),
        ],
    }
    return _RC


@dataclass
class CrawlResult:
    content: DataFrame
    comments: DataFrame
    creators: DataFrame
    contacts: DataFrame
    dynamics: DataFrame
    tieba_notes: DataFrame
    zhihu_comments: DataFrame
    seen: DataFrame
    frontier: DataFrame
    metrics: DataFrame
    denied: DataFrame
    failed: DataFrame
    rounds: int


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        robots: DataFrame,
        checkpoint_dir: str | None = None,
        enable_sub_comments: bool = True,  # reference ENABLE_GET_SUB_COMMENTS (base_config.py:90)
        max_comments_per_note: int | None = None,  # W1: CRAWLER_MAX_COMMENTS_COUNT_SINGLENOTES
        comment_page_size: int = 10,
        comment_order: str = "default",  # O2: CommentOrderType (bilibili/client.py:217-231)
        max_search_pages: int | None = None,  # O3 page budget (CRAWLER_MAX_NOTES_COUNT/page_size)
        crawl_creators: bool = False,  # §3.3 creator mode: fetch author profiles
        crawl_creator_posts: bool = False,  # S14/J4: walk creators' posts cursor
        max_creator_posts: int | None = None,  # CRAWLER_MAX_NOTES_COUNT analog (xhs/client.py:492)
        posts_page_size: int = 10,
        crawl_contacts: bool = False,  # S15/S16/J5: bilibili fans/followings/dynamics
        max_contacts: int | None = None,  # CRAWLER_MAX_CONTACTS_COUNT_SINGLENOTES
        contacts_page_size: int = 10,
        max_dynamics: int | None = None,  # CRAWLER_MAX_DYNAMICS_COUNT_SINGLENOTES
        dynamics_page_size: int = 10,
        use_bloom: bool = True,
        bloom_min_seen: int = 20_000,
        bloom_capacity_per_shard: int = 500_000,
        n_salts: int = 8,
        global_limit: int | None = None,
        broadcast_threshold: int = 3_000_000,
        fetch_join: str = "auto",  # auto | broadcast | colocated
        state_codec: str | None = None,  # intra-round state parquet codec
        async_writes: bool | None = None,  # overlap output writes with next round
    ):
        self.spark = spark
        # column-pruned pages scan: never drag html for rows we don't fetch
        self.pages = pages.select("url", "warc_ts", "html", "text")
        self.robots = robots
        self.ckpt = checkpoint_dir
        self.enable_sub_comments = enable_sub_comments
        self.max_comments_per_note = max_comments_per_note
        self.comment_page_size = comment_page_size
        self.comment_order = comment_order
        self.max_search_pages = max_search_pages
        self.crawl_creators = crawl_creators
        self.crawl_creator_posts = crawl_creator_posts
        self.max_creator_posts = max_creator_posts
        self.posts_page_size = posts_page_size
        self.crawl_contacts = crawl_contacts
        self.max_contacts = max_contacts
        self.contacts_page_size = contacts_page_size
        self.max_dynamics = max_dynamics
        self.dynamics_page_size = dynamics_page_size
        self.use_bloom = use_bloom
        # The Bloom prefilter is maintained *incrementally* (north_rule):
        # round r's filter = filter(r-1) OR build(delta_r) — never rebuilt
        # from the full seen table. It activates once the seen set is big
        # enough that the prefilter beats a plain anti-join; capacity is
        # fixed up front so per-round delta filters merge bit-compatibly.
        self.bloom_min_seen = bloom_min_seen
        self.bloom_capacity_per_shard = bloom_capacity_per_shard
        self._bloom: seen_ops.ShardedBloom | None = None
        self._seen_count = 0
        self.n_salts = n_salts
        self.global_limit = global_limit
        # Fetch-join strategy (J1):
        # - "broadcast": scheduled batch broadcast against pages — right for
        #   bounded politeness batches; driver-side broadcast build is a
        #   serial cost that grows with batch size (Amdahl at huge rounds).
        # - "colocated": pages is a url-bucketed table → plain equi-join;
        #   Catalyst shuffles ONLY the scheduled side into the bucket
        #   partitioning, pages never moves and no driver serial work.
        #   This is the 100 TB design (Iceberg bucket(url) / bucketBy).
        # - "auto": broadcast below broadcast_threshold rows, else plain
        #   join (colocated when the table is bucketed).
        self.fetch_join = fetch_join
        self.broadcast_threshold = broadcast_threshold
        # Round-state codec, decoupled from the session default (zstd, kept
        # for FINAL outputs where bytes-at-rest matter): intra-round state
        # is written once and read 1-2 times, so cheap-encode codecs win
        # when the write phase binds on the shared memory/storage stack.
        self.state_codec = state_codec or os.environ.get(
            "SPARK_GRAFT_STATE_CODEC", "zstd"
        )
        # One-round-deep write pipeline: a round's OUTPUT tables (content,
        # comments, … — read only at crawl end) are written on a background
        # pool while the NEXT round's build+parse runs; only frontier+seen —
        # the two tables the next round consumes — commit synchronously.
        # The round's _SUCCESS marker is written at drain time (next round's
        # write phase, or run() exit), so the crash contract is unchanged:
        # no marker → round incomplete → re-runs on resume. Rationale: the
        # write phase is the rounds-mode scaling bind (0.46–0.61 at 2→8
        # cores, BENCH/BASELINE.md) because state-write bandwidth is a
        # per-box resource here — overlapping it behind the next round's
        # compute hides it at BOTH levels and especially where write
        # fraction is largest. On a real cluster this is the standard
        # async-commit pattern (Iceberg commit of round N racing round
        # N+1's scan/compute, barriered one round deep).
        if async_writes is None:
            async_writes = os.environ.get("SPARK_GRAFT_ASYNC_WRITES", "1") == "1"
        self.async_writes = async_writes
        self._pending: dict | None = None
        self._write_pool: ThreadPoolExecutor | None = None
        # NOTE a parquet lineage-cut of the parsed frame (write once, rebuild
        # as a trivial scan so the ~15 consumer analyses stop re-walking the
        # ~1000-expression parse tree) was built and measured as a NET LOSS
        # at every round size — the per-table write analyses already run
        # thread-parallel, so the cut only saves ~3-4 s/round of driver CPU
        # while the encode+decode round-trip adds ~20 s/round of executor
        # work at 8 cores (same-day A/B, 11M-page corpus; BENCH/ANALYSIS.md
        # "parsed lineage cut" entry). The in-memory cache path stays.
        # per-process plan caches (driver fixed-cost discipline)
        self._seed_arr = None
        self._empty_cache: dict[str, DataFrame] = {}

    # -- state materialization ---------------------------------------------
    # Always a parquet round-trip: parallel write + clean lineage cut.
    # (localCheckpoint is NOT used: its block-manager writes contend
    # pathologically at high task parallelism — measured 123 s vs 13 s for
    # the same 560k-row delta at local[16] vs local[4].) When no checkpoint
    # dir is configured, a scratch dir serves the same role without the
    # resume guarantee.
    def _materialize(self, df: DataFrame, round_id: int, name: str) -> DataFrame:
        base = self.ckpt or self._scratch
        path = os.path.join(base, f"round={round_id:05d}", name)
        # small rounds: cap file count (32-partition writes of 100-row
        # deltas cost more in file overhead than they gain in parallelism)
        if getattr(self, "_small_round", False):
            df = df.coalesce(4)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _empty(self, ddl: str) -> DataFrame:
        if ddl not in self._empty_cache:
            self._empty_cache[ddl] = self.spark.createDataFrame([], ddl)
        return self._empty_cache[ddl]

    def _empty_seeds(self) -> DataFrame:
        return self._empty(_SEED_DDL)

    # -- round-output write ---------------------------------------------------
    # ALL state of a round — the ten output tables, the seen delta and the
    # next frontier — is written as per-table native-schema parquet dirs
    # (``deltas/tbl=<name>``) whose write jobs are submitted THREAD-PARALLEL.
    # Measured on the 12M-page superstep at 8 cores: one unified partitionBy
    # mux write 26.6 s, per-table serial 22.1 s, per-table parallel 11.9 s —
    # concurrent jobs keep executor slots full across each job's encode/commit
    # tail, and native schemas skip the ~55 all-null column writers per file
    # the 66-column unified layout paid. Crucially the parallel win is
    # executor-slot headroom: a saturated 2-core run gains nothing, so this is
    # a pure 2→8 (N→4N) write-efficiency lever. On a real cluster this maps to
    # one Iceberg multi-table transaction whose per-table file writes fan out
    # across executors. The driver-side ``deltas/_SUCCESS`` marker is written
    # only after EVERY table's job committed — it remains the round-
    # completeness flag for resume. A table with zero rows at plan-build time
    # (gate-disabled feature → _round hands the cached _empty frame through
    # unchanged) is pruned: no dir, reconstructed empty from DELTA_DDL.
    def _write_deltas(self, tables: dict[str, DataFrame], round_id: int) -> dict[str, DataFrame]:
        # join the PREVIOUS round's in-flight output writes first: at most
        # one round is ever pending, and its marker must land before any
        # later round's marker (resume reads the marker sequence).
        self._drain_pending()
        base = self.ckpt or self._scratch
        path = os.path.join(base, f"round={round_id:05d}", "deltas")
        # a re-run of a crashed round must not inherit stale tbl= dirs (the
        # live set can differ run-to-run); the marker goes last, so a crash
        # anywhere in here leaves the round incomplete and it re-runs
        if os.path.isdir(path):
            shutil.rmtree(path)
        empty_ids = {id(df) for df in self._empty_cache.values()}
        live = [n for n in _MUX_ORDER if id(tables[n]) not in empty_ids]
        # File-count discipline: big rounds write shuffle-width files per
        # table (read-back scans stay parallel), tiny rounds collapse to 2.
        n_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        width = 2 if getattr(self, "_small_round", False) else max(n_shuffle, 8)
        codec = self.state_codec

        def _write_one(name: str) -> None:
            cols = _delta_cols(name)
            (
                tables[name].select(*cols).coalesce(width)
                .write.mode("overwrite")
                .option("compression", codec)
                .parquet(os.path.join(path, f"tbl={name}"))
            )

        # frontier + seen are the only tables the NEXT round consumes — they
        # always commit synchronously; everything else is an end-of-crawl
        # output and may ride the async pipeline.
        critical = [n for n in live if n in ("frontier", "seen")]
        deferred = [n for n in live if n not in ("frontier", "seen")]
        if len(critical) > 1:
            with ThreadPoolExecutor(max_workers=len(critical)) as ex:
                list(ex.map(_write_one, critical))
        elif critical:
            _write_one(critical[0])
        if self.async_writes and deferred:
            if self._write_pool is None:
                self._write_pool = ThreadPoolExecutor(
                    max_workers=len(_MUX_ORDER), thread_name_prefix="delta-write"
                )
            futs = [self._write_pool.submit(_write_one, n) for n in deferred]
            # ownership of the round's persisted intermediates moves to the
            # pending record — the in-flight jobs still read them; drained
            # (and unpersisted) one round later or at run() exit.
            self._pending = {
                "round_id": round_id,
                "futures": futs,
                "path": path,
                "cache": getattr(self, "_round_cache", []),
            }
            self._round_cache = []
        else:
            if len(deferred) > 1:
                with ThreadPoolExecutor(max_workers=len(deferred)) as ex:
                    list(ex.map(_write_one, deferred))  # re-raises the first failure
            elif deferred:
                _write_one(deferred[0])
            with open(os.path.join(path, "_SUCCESS"), "w"):
                pass
        # only frontier + seen are consumed per-round; the output tables are
        # read once at the end as one multi-path scan per table (table())
        return {name: self._read_delta(round_id, name) for name in ("frontier", "seen")}

    def _drain_pending(self) -> None:
        """Join the pending round's deferred write jobs, commit its marker,
        release its cached intermediates. A failed job raises BEFORE the
        marker is written — the round stays uncommitted and re-runs on
        resume, exactly the synchronous crash contract."""
        p, self._pending = self._pending, None
        if p is None:
            self._t_drain = 0.0
            return
        t0 = time.time()
        try:
            for f in p["futures"]:
                f.result()
            with open(os.path.join(p["path"], "_SUCCESS"), "w"):
                pass
        finally:
            for df in p["cache"]:
                df.unpersist()
        self._t_drain = time.time() - t0

    def _read_delta(self, round_id: int, name: str) -> DataFrame:
        base = self.ckpt or self._scratch
        sub = os.path.join(base, f"round={round_id:05d}", "deltas", f"tbl={name}")
        if not os.path.isdir(sub):
            return self._empty(DELTA_DDL[name])
        # explicit schema: no footer-inference listing, pinned column order
        return self.spark.read.schema(DELTA_DDL[name]).parquet(sub)

    # -- seeding -----------------------------------------------------------
    def seed_frontier(self, seeds: DataFrame) -> DataFrame:
        return seeds.select(
            F.col("url"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            F.coalesce(F.col("priority"), F.lit(0)).cast("int").alias("priority"),
            F.lit(0).alias("depth"),
            F.lit("open").alias("state"),
            F.lit(None).cast("string").alias("cursor"),
            F.lit(0).alias("attempts"),
            F.lit(0).alias("not_before_round"),
            F.col("keyword"),
            F.lit(0).alias("page"),
            F.lit(0).alias("item_idx"),
            F.lit(0).alias("cursor_seq"),
            F.lit(0).alias("round_id"),
        ).dropDuplicates(["url"])

    # -- one BSP round ------------------------------------------------------
    def _seed_array_col(self):
        """The full link-discovery fan-out as one array<seed_struct> column
        over parsed rows (see _SEED_ARR_DDL). Built once per PROCESS per
        config (the gates bake in engine-constant budgets): the tree is
        thousands of py4j Column calls (~5-9 s of driver wall), and Column
        expressions are unresolved/source-free, so engines with the same
        budget config share it safely across instances and rounds."""
        cfg_key = (
            self.enable_sub_comments, self.max_comments_per_note,
            self.comment_page_size, self.max_search_pages,
            self.crawl_creator_posts, self.max_creator_posts,
            self.posts_page_size, self.crawl_contacts, self.max_contacts,
            self.contacts_page_size, self.max_dynamics,
            self.dynamics_page_size,
        )
        cached = _SEED_ARR_CACHE.get(cfg_key)
        if cached is not None:
            self._seed_arr = cached
            return cached
        if getattr(self, "_seed_arr", None) is not None:
            return self._seed_arr
        c = F.col
        kind = c("kind")
        host, priority, depth, keyword, page, item_idx, cursor_seq = (
            c("host"), c("priority"), c("depth"), c("keyword"), c("page"),
            c("item_idx"), c("cursor_seq"),
        )
        https = F.lit("https://")
        mc, ps = self.max_comments_per_note, self.comment_page_size
        pieces: list = []

        # comment page 0 from content rows (J2 first-request cursor per
        # platform rides the URL and the cursor column)
        icc = X.initial_comment_cursor_col(c("platform"))
        pieces.append(_guard(
            (kind == "content") & (c("n_comments") > 0),
            F.array(_sstruct(
                F.concat(https, host, F.lit("/api/comments/"),
                         url_note_id_col(c("url")), F.lit("?cursor="), icc),
                host, priority, depth + 1, keyword, page, item_idx, F.lit(0), icc,
            )),
        ))

        # next comment/sub-comment cursor page (J2/J3 iterative join)
        cursor_gate = c("cpage.has_more")
        if mc is not None:
            cursor_gate = cursor_gate & (
                (kind != "comments") | ((cursor_seq + 1) * ps < mc)
            )
        pieces.append(_guard(
            c("cpage").isNotNull() & cursor_gate,
            F.array(_sstruct(
                F.concat(
                    https, host,
                    F.when(kind == "comments", F.lit("/api/comments/"))
                    .otherwise(F.lit("/api/subcomments/")),
                    c("cpage.target_id"),
                    # bilibili level-two pages paginate by NUMBER
                    # (bilibili/client.py:326-337); every other walk is a
                    # cursor/offset token
                    F.when(
                        (kind == "subcomments") & (c("platform") == "bilibili"),
                        F.lit("?pn="),
                    ).otherwise(F.lit("?cursor=")),
                    c("cpage.next_cursor"),
                ),
                host, priority, depth, keyword, page,
                item_idx, cursor_seq + 1, c("cpage.next_cursor"),
            )),
        ))

        if self.enable_sub_comments:
            # per-platform sub-walk page 0 (J3): the parent item's own
            # trigger field and initial cursor, normalized at parse time to
            # (sub_more, sub_cursor0) — xhs sub_comment_has_more/_cursor,
            # dy reply_comment_total→"0", ks subCommentsPcursor→"", bili
            # rcount→pn=1, zhihu child_comment_count→""; weibo never (subs
            # are inline). i = the comment's position on its page (W4/W1).
            def _sub_one(cm, i):
                gate = cm["sub_more"]
                if mc is not None:
                    gate = gate & (cursor_seq * ps + i < mc)
                sub_url = F.when(
                    c("platform") == "bilibili",
                    F.concat(https, host, F.lit("/api/subcomments/"),
                             cm["id"], F.lit("?pn=1")),
                ).otherwise(
                    F.concat(https, host, F.lit("/api/subcomments/"), cm["id"],
                             F.lit("?cursor="), F.coalesce(cm["sub_cursor0"], F.lit(""))),
                )
                return F.when(gate, _sstruct(
                    sub_url, host, priority, depth + 1, keyword, page, i,
                    F.lit(0), cm["sub_cursor0"],
                ))
            pieces.append(_guard(
                (kind == "comments") & (c("platform") != "tieba") & c("cpage").isNotNull(),
                F.filter(F.transform(c("cpage.comments"), _sub_one),
                         lambda s: s.isNotNull()),
            ))

            # tieba sub panes: pn=1..(comment_num//10+1), the reference's
            # max_sub_page_num formula verbatim (tieba/client.py:267)
            def _tb_sub_one(cm, i):
                gate = cm["sub_comment_count"] > 0
                if mc is not None:
                    gate = gate & (cursor_seq * ps + i < mc)
                nsp = (F.floor(cm["sub_comment_count"] / 10) + 1).cast("int")
                return F.when(gate, F.transform(
                    F.sequence(F.lit(1), nsp),
                    lambda pn: _sstruct(
                        F.concat(https, host, F.lit("/p/comment?tid="),
                                 c("cpage.note_id"), F.lit("&pid="), cm["id"],
                                 F.lit("&pn="), pn.cast("string")),
                        host, priority, depth + 1, keyword, page, i,
                        pn - 1, pn.cast("string"),
                    ),
                ))
            pieces.append(_guard(
                (c("platform") == "tieba") & (kind != "subcomments")
                & c("cpage").isNotNull(),
                F.flatten(F.filter(F.transform(c("cpage.comments"), _tb_sub_one),
                                   lambda a: a.isNotNull())),
            ))

        # tieba thread reply pages ?pn=2..total_replay_page (S10 page range,
        # tieba/client.py:198-235; W1 trims pages wholly past the budget)
        pn_hi = c("tnote.total_replay_page").try_cast("int")
        if mc is not None:
            pn_hi = F.least(pn_hi, F.lit(-(-mc // ps)))
        pieces.append(_guard(
            (kind == "content") & (c("platform") == "tieba")
            & c("tnote").isNotNull() & (pn_hi >= 2),
            F.transform(
                F.sequence(F.lit(2), pn_hi),
                lambda pn: _sstruct(
                    F.concat(https, host, F.lit("/p/"), c("tnote.note_id"),
                             F.lit("?pn="), pn.cast("string")),
                    host, priority, depth + 1, keyword, page, item_idx,
                    pn - 1, pn.cast("string"),
                ),
            ),
        ))

        # search listing → note detail seeds (S1–S7 → J1 fan-out)
        pieces.append(_guard(
            (kind == "search") & c("spage").isNotNull(),
            F.filter(
                F.transform(
                    c("spage.note_urls"),
                    lambda u, i: _sstruct(
                        u, F.parse_url(u, F.lit("HOST")), priority, depth + 1,
                        keyword, c("spage.search_page"), i, F.lit(0),
                        F.lit(None).cast("string"),
                    ),
                ),
                lambda s: s["url"].isNotNull(),
            ),
        ))

        # next search page (S2/S3/S7 reference-identical cursor math)
        next_pg = c("spage.search_page") + 1
        search_gate = c("spage.has_more")
        if self.max_search_pages is not None:
            search_gate = search_gate & (next_pg <= F.lit(self.max_search_pages))
        pieces.append(_guard(
            (kind == "search") & search_gate,
            F.array(_sstruct(
                F.concat(https, host, F.lit("/search/"), c("spage.search_kw"),
                         F.lit("?page="), next_pg.cast("string")),
                host, priority, depth, keyword, next_pg, F.lit(0), F.lit(0),
                X.search_cursor_col(c("platform"), next_pg, c("spage.session_id")),
            )),
        ))

        uid = F.regexp_extract(c("url"), r"/user/([^/?]+)", 1)
        is_tb = c("platform") == "tieba"
        if self.crawl_creator_posts:
            # creator profile → posts cursor page 0 (S14/J4). Tieba speaks
            # the getthread API keyed by user_name (tieba/client.py:312-330,
            # 1-based pn); everyone else the generic /posts cursor walk.
            posts0_url = F.when(
                is_tb,
                F.concat(https, host, F.lit("/home/get/getthread?un="),
                         c("tcreator.user_name"), F.lit("&pn=1")),
            ).otherwise(
                F.concat(https, host, F.lit("/user/"), uid, F.lit("/posts?cursor=0"))
            )
            pieces.append(_guard(
                kind == "creator",
                F.array(_sstruct(
                    posts0_url, host, priority, depth + 1, keyword, page,
                    item_idx, F.lit(0),
                    F.when(is_tb, F.lit("1")).otherwise(F.lit("0")),
                )),
            ))
            # tieba homepage special case: the first ≤10 threads ride on the
            # creator page itself and are NOT in the API ("前10个帖子…通过API
            # 获取不到", tieba/client.py:351-360) — detail-fetched directly,
            # ungated by max_note_count (the reference fetches them before
            # the budgeted while loop)
            pieces.append(_guard(
                (kind == "creator") & is_tb & c("tb_tids").isNotNull(),
                F.transform(c("tb_tids"), lambda t, i: _sstruct(
                    F.concat(https, host, F.lit("/p/"), t),
                    host, priority, depth + 1, keyword, page, i, F.lit(0),
                    F.lit(None).cast("string"),
                )),
            ))
            # posts listing → note seeds (inherit the page's cursor_seq).
            # Tieba items are ungated: the reference's budget counts PAGES
            # (total_get_count += page_per_count), never trims thread_list.
            def _post_note(u, i):
                s = _sstruct(
                    u, F.parse_url(u, F.lit("HOST")), priority, depth + 1,
                    keyword, page, i, cursor_seq, F.lit(None).cast("string"),
                )
                if self.max_creator_posts is not None:
                    return F.when(
                        is_tb
                        | (cursor_seq * self.posts_page_size + i < self.max_creator_posts),
                        s,
                    )
                return s
            pieces.append(_guard(
                (kind == "creator_posts") & c("ppage").isNotNull(),
                F.filter(
                    F.transform(c("ppage.note_urls"), _post_note),
                    lambda s: s.isNotNull() & s["url"].isNotNull(),
                ),
            ))
            # next posts page: generic gate is item-budgeted; the tieba gate
            # is the reference's page-granular total_get_count math
            # (page_per_count=20, tieba/client.py:364-385)
            posts_gate = c("ppage.has_more")
            if self.max_creator_posts is not None:
                posts_gate = posts_gate & (
                    F.when(is_tb, (cursor_seq + 1) * 20 < self.max_creator_posts)
                    .otherwise(
                        (cursor_seq + 1) * self.posts_page_size < self.max_creator_posts
                    )
                )
            posts_next_url = F.when(
                is_tb,
                F.concat(https, host, F.lit("/home/get/getthread?un="),
                         c("ppage.target_uid"), F.lit("&pn="), c("ppage.next_cursor")),
            ).otherwise(
                F.concat(https, host, F.lit("/user/"), c("ppage.target_uid"),
                         F.lit("/posts?cursor="), c("ppage.next_cursor")),
            )
            pieces.append(_guard(
                (kind == "creator_posts") & posts_gate,
                F.array(_sstruct(
                    posts_next_url,
                    host, priority, depth, keyword, page, item_idx,
                    cursor_seq + 1, c("ppage.next_cursor"),
                )),
            ))

        if self.crawl_contacts:
            # bilibili creator → fans/followings/dynamics page 1 (S15/S16/J5)
            pieces.append(_guard(
                (kind == "creator") & (c("platform") == "bilibili"),
                F.array(
                    _sstruct(
                        F.concat(https, host, F.lit("/user/"), uid, F.lit("/fans?pn=1")),
                        host, priority, depth + 1, keyword, page, item_idx,
                        F.lit(0), F.lit("1"),
                    ),
                    _sstruct(
                        F.concat(https, host, F.lit("/user/"), uid, F.lit("/followings?pn=1")),
                        host, priority, depth + 1, keyword, page, item_idx,
                        F.lit(0), F.lit("1"),
                    ),
                    _sstruct(
                        F.concat(https, host, F.lit("/user/"), uid, F.lit("/dynamics?offset=0")),
                        host, priority, depth + 1, keyword, page, item_idx,
                        F.lit(0), F.lit("0"),
                    ),
                ),
            ))
            fans_gate = c("fpage.has_more")
            if self.max_contacts is not None:
                fans_gate = fans_gate & (
                    (cursor_seq + 1) * self.contacts_page_size < self.max_contacts
                )
            pieces.append(_guard(
                kind.isin("fans", "followings") & fans_gate,
                F.array(_sstruct(
                    F.concat(https, host, F.lit("/user/"), c("fpage.target_uid"),
                             F.when(kind == "fans", F.lit("/fans?pn="))
                             .otherwise(F.lit("/followings?pn=")),
                             (cursor_seq + 2).cast("string")),
                    host, priority, depth, keyword, page, item_idx,
                    cursor_seq + 1, (cursor_seq + 2).cast("string"),
                )),
            ))
            dyn_gate = c("dpage.has_more")
            if self.max_dynamics is not None:
                dyn_gate = dyn_gate & (
                    (cursor_seq + 1) * self.dynamics_page_size < self.max_dynamics
                )
            pieces.append(_guard(
                (kind == "dynamics") & dyn_gate,
                F.array(_sstruct(
                    F.concat(https, host, F.lit("/user/"), c("dpage.target_uid"),
                             F.lit("/dynamics?offset="), c("dpage.next_offset")),
                    host, priority, depth, keyword, page, item_idx,
                    cursor_seq + 1, c("dpage.next_offset"),
                )),
            ))

        self._seed_arr = F.concat(*pieces) if len(pieces) > 1 else pieces[0]
        _SEED_ARR_CACHE[cfg_key] = self._seed_arr
        return self._seed_arr

    def _round(self, frontier: DataFrame, seen: DataFrame, round_id: int):
        scheduled, denied = sched.select_round(
            frontier, self.robots, round_id, self.n_salts, self.global_limit
        )
        # The round's two expensive intermediates — the politeness-window
        # selection and the parsed fetch output — feed several consumers
        # (content, comments, seeds, seen, frontier, metrics); cache them
        # for the round (unpersisted by run() after checkpointing). The
        # parsed frame is NARROW: html is decoded once in parse_round and
        # never cached. Skipping THIS persist was measured as a net loss
        # (4.48M-URL superstep, 8 cores: build 19.8→7.3 s but the seen-union
        # consumer re-runs the politeness select inside the write phase,
        # 39.2→62.1 s — round total 334.5→347.0 s), so the select is cached.
        scheduled = scheduled.persist()
        _t = time.time()
        n_scheduled = scheduled.count()
        self._t_select = time.time() - _t
        self._small_round = n_scheduled < 20_000
        # Adaptive shuffle width, sized from THIS round's scheduled count
        # (politeness-bounded rounds are often 10^3 rows on a session tuned
        # for 10^6+ — a 32-wide groupBy over 2k rows is pure task-launch
        # overhead, measured ~25% of round wall at sf0.1). The count above
        # already ran the select phase, so everything downstream — parse,
        # dedup, the round write — sees the right width even on a small-to-
        # large frontier transition. run() restores the session default in
        # a finally.
        width = self._default_shuffle if not self._small_round \
            else min(8, self._default_shuffle)
        self.spark.conf.set("spark.sql.shuffle.partitions", str(width))
        # Fetch-join (J1) — see fetch_join in __init__.
        colocated = self.fetch_join == "colocated" or (
            self.fetch_join == "auto" and n_scheduled > self.broadcast_threshold
        )
        probe = scheduled if colocated else F.broadcast(scheduled)
        fetched = self.pages.join(probe, on="url", how="inner")
        # In broadcast mode the fetch-join output inherits the pages table's
        # partitioning — hundreds of near-empty partitions for a politeness-
        # bounded batch. The parsed frame is scanned by ~a dozen consumers
        # per round (seed branches, outputs, metrics, the seen delta), so
        # cache it at shuffle-partition granularity: one cheap narrow-row
        # shuffle replaces consumers × N-partition cache scans (measured:
        # the frontier job alone launched >2000 near-empty cache-scan tasks
        # per round without this). In colocated mode the bucketed join's
        # output is already at bucket granularity (one partition per
        # bucket), so the extra full shuffle of the batch is pure cost —
        # skip it.
        n_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        parsed = X.parse_round(fetched, self.comment_order)
        if not colocated:
            parsed = parsed.repartition(n_shuffle)
        parsed = parsed.persist()
        self._round_cache = [scheduled, parsed]
        misses = scheduled.join(parsed.select("url"), on="url", how="left_anti")

        rc = _round_cols()
        kind = F.col("kind")

        rlit = F.lit(round_id).alias("round_id")

        # --- content (P1 + E2–E5) ---
        content_rows = parsed.filter(kind == "content")
        content = content_rows.select(*rc["content"], rlit)

        # --- comment expansion (J2/J3; tieba detail rows carry page-1
        # comments on their cpage, so the filter keys on cpage presence) ---
        cbase = parsed.filter(F.col("cpage").isNotNull())
        # item_idx from the explosion = comment position on the page (W4
        # key); f_item_idx = the frontier row's inherited position.
        cx = cbase.select(*rc["cx_stage1"]).select(*rc["cx_stage2"])
        comments = (
            cx.filter(F.col("comment_id").isNotNull())
            .select(*rc["comments"], rlit)
        )
        # W1 per-note top-level comment budget (reference trims at
        # collection, xhs/client.py:347-356): a top-level comment's global
        # position is cursor_seq·page_size + item_idx — deterministic, no
        # running state needed.
        if self.max_comments_per_note is not None:
            mc, ps = self.max_comments_per_note, self.comment_page_size
            pos = F.col("ord_cursor_seq") * ps + F.col("ord_item_idx")
            comments = comments.filter(
                F.col("parent_comment_id").isNotNull() | (pos < mc)
            )
        # weibo inline second-level rows (weibo/client.py:205-210): subs
        # ride on the parent objects of top-level pages — a trimmed parent
        # (W1) drops its inline subs with it, like the reference's
        # trim-before-callback order.
        wb_inline = cx.filter(F.col("subs").isNotNull())
        if self.max_comments_per_note is not None:
            mc, ps = self.max_comments_per_note, self.comment_page_size
            wb_inline = wb_inline.filter(
                F.col("cursor_seq") * ps + F.col("item_idx") < mc
            )
        wb_inline = wb_inline.select(
            F.col("note_id_pg"),
            F.col("comment_id").alias("parent_id"),
            F.col("cursor_seq"),
            F.posexplode(F.col("subs")).alias("s_idx", "s"),
        ).select(
            F.col("s.id").alias("comment_id"),
            F.col("note_id_pg").alias("note_id"),
            F.col("parent_id").alias("parent_comment_id"),
            F.col("s.content").alias("content"),
            F.col("s.create_time").alias("create_time"),
            F.lit(0).alias("sub_comment_count"),
            F.col("cursor_seq").alias("ord_cursor_seq"),
            F.col("s_idx").alias("ord_item_idx"),
            rlit,
        )
        comments = comments.unionByName(wb_inline)

        # (comment/sub-comment/tieba-page/search/posts/contacts seed
        # emission now lives in _seed_array_col — one projection below)

        # --- tieba thread-page notes (S6/S10 in-loop: the reference's tieba
        # crawl IS the six HTML extractors, tieba/core.py:113-205) ---
        tb_detail = parsed.filter(
            (F.col("platform") == "tieba") & (kind == "content") & F.col("tnote").isNotNull()
        )
        tieba_notes = tb_detail.select(
            "tnote.*",
            F.col("keyword").alias("ord_keyword"),
            F.col("page").alias("ord_page"),
            F.col("item_idx").alias("ord_item_idx"),
            F.col("cursor_seq").alias("ord_cursor_seq"),
            rlit,
        )

        # --- zhihu comment rows, full field surface (E3 comments:
        # _extract_comment + author member fallback, zhihu/help.py:213-298) ---
        from mediacrawler_spark.operators import zhihu as Z

        zx = (
            parsed.filter(F.col("zcm").isNotNull())
            .select(
                F.col("cpage.note_id").alias("content_id"),
                F.col("cursor_seq"),
                F.posexplode_outer(F.col("zcm")).alias("z_idx", "zc"),
            )
            .filter(F.col("zc").isNotNull())
        )
        zc = F.col("zc")
        zhihu_comments = zx.select(
            *Z.zhihu_comment_cols(zc),
            F.col("content_id"),
            # author sub-extraction minus the url_token passthrough
            *Z._author_cols(zc["author"])[:4],
            F.col("cursor_seq").alias("ord_cursor_seq"),
            F.col("z_idx").alias("ord_item_idx"),
            rlit,
        )

        # --- creator profiles (S13, §3.3 creator mode) ---
        crbase = parsed.filter(kind == "creator")
        creators = crbase.select(*rc["creators"], rlit)
        if self.crawl_creators:
            # same author on many notes → one seed; the winner's ordering
            # metadata is the MIN (keyword,page,item_idx) — deterministic,
            # mirrored exactly by the sequential simulator
            creator_seeds = (
                content.filter(F.col("user_id").isNotNull())
                .groupBy(
                    F.concat(
                        F.lit("https://h0."), F.col("platform"),
                        F.lit(".example/user/"), F.col("user_id"),
                    ).alias("url"),
                    F.concat(F.lit("h0."), F.col("platform"), F.lit(".example")).alias("host"),
                )
                .agg(
                    F.min(
                        F.struct(
                            F.col("source_keyword").alias("keyword"),
                            F.col("ord_page").alias("page"),
                            F.col("ord_item_idx").alias("item_idx"),
                        )
                    ).alias("_o")
                )
                .select(
                    *_seed_cols(
                        F.col("url"), F.col("host"), F.lit(0), F.lit(0),
                        F.col("_o.keyword"), F.col("_o.page"), F.col("_o.item_idx"),
                        F.lit(0), F.lit(None),
                    )
                )
            )
        else:
            creator_seeds = None  # folded into _seed_array_col paths only

        # --- bilibili contact/dynamics edge rows (S15/S16/J5 outputs; their
        # cursor-walk seeds live in _seed_array_col) ---
        if self.crawl_contacts:
            fbase = parsed.filter(kind.isin("fans", "followings"))
            fx = fbase.select(*rc["fx"])
            contacts = fx.filter(F.col("u").isNotNull())
            if self.max_contacts is not None:
                cpos = F.col("cursor_seq") * self.contacts_page_size + F.col("fx_idx")
                contacts = contacts.filter(cpos < self.max_contacts)
            contacts = contacts.select(*rc["contacts"], rlit)
            dbase = parsed.filter(kind == "dynamics")
            dx = dbase.select(*rc["dx"])
            dynamics = dx.filter(F.col("it").isNotNull())
            if self.max_dynamics is not None:
                dpos = F.col("cursor_seq") * self.dynamics_page_size + F.col("dx_idx")
                dynamics = dynamics.filter(dpos < self.max_dynamics)
            dynamics = dynamics.select(*rc["dynamics"], rlit)
        else:
            contacts = self._empty(DELTA_DDL["contacts"])
            dynamics = self._empty(DELTA_DDL["dynamics"])

        # --- frontier maintenance ---
        # Within-round URL collision rule: when several discovery paths emit
        # the same URL with different (keyword,page,item_idx,…) metadata, the
        # survivor is the deterministic MIN over the ordering key (null
        # keyword compares as '' — same rule as the scheduler and the
        # sequential simulator, reference_sim.py best-dict).
        seeds = parsed.select(
            F.explode(self._seed_array_col()).alias("_s")
        ).select("_s.*")
        if self.crawl_creators:
            seeds = seeds.unionByName(creator_seeds)
        discovered = (
            seeds
            .groupBy("url", "host")
            .agg(
                F.min(
                    F.struct(
                        F.coalesce(F.col("keyword"), F.lit("")).alias("kw_ord"),
                        F.col("page"), F.col("item_idx"), F.col("cursor_seq"),
                        F.col("priority"), F.col("depth"), F.col("keyword"),
                        F.col("cursor_val"),
                    )
                ).alias("_o")
            )
            .select(
                "url", "host",
                F.col("_o.priority").alias("priority"),
                F.col("_o.depth").alias("depth"),
                F.col("_o.keyword").alias("keyword"),
                F.col("_o.page").alias("page"),
                F.col("_o.item_idx").alias("item_idx"),
                F.col("_o.cursor_seq").alias("cursor_seq"),
                F.col("_o.cursor_val").alias("cursor_val"),
            )
        )
        # The dedup + frontier-emission chain reads `discovered` twice (the
        # Bloom prefilter forks into definitely-new ∪ verified-new); persist
        # the deduped seed set so the 12-branch union + min-struct aggregate
        # is computed once per round.
        discovered = discovered.persist()
        self._round_cache.append(discovered)
        active_urls = frontier.select("url")
        if self._bloom is not None:
            new_urls = seen_ops.unseen_bloom_prefiltered(discovered, seen, bloom=self._bloom)
        else:
            new_urls = seen_ops.unseen_exact(discovered, seen)
        new_urls = new_urls.join(active_urls, on="url", how="left_anti")
        # politeness: newly discovered URLs wait at least one round
        # (crawl_delay analog; retries use exponential backoff below)
        new_frontier_rows = new_urls.select(
            *rc["new_frontier"],
            F.lit(round_id + 1).alias("not_before_round"),
            F.lit(round_id).alias("round_id"),
        ).select(*_FRONTIER_COLS)

        na = F.col("attempts") + 1
        retries = misses.select(
            "url", "host", "priority", "depth",
            F.when(na >= MAX_ATTEMPTS, F.lit("failed")).otherwise(F.lit("open")).alias("state"),
            "cursor",
            na.alias("attempts"),
            (F.lit(round_id) + sched.backoff_round(na)).alias("not_before_round"),
            "keyword", "page", "item_idx", "cursor_seq",
            F.lit(round_id).alias("round_id"),
        ).select(*_FRONTIER_COLS)
        # terminal failed table (north_rule lineage: exhausted-retry rows are
        # queryable, like denied — they never silently vanish)
        failed = retries.filter(F.col("state") == "failed")

        leftover = frontier.filter(F.col("state") == "open").join(
            scheduled.select("url").unionByName(denied.select("url")),
            on="url", how="left_anti",
        )
        new_frontier = (
            leftover
            .unionByName(retries.filter(F.col("state") == "open"))
            .unionByName(new_frontier_rows)
        )

        # seen delta (append-only log): only this round's fetched URLs —
        # the full seen table is never rewritten
        seen_delta = parsed.select("url", F.lit(round_id).alias("round_id"))

        # --- per-host round metrics (north_rule lineage counters) ---
        # one tagged union + one aggregation (scheduled = fetched ∪ misses)
        tagged = parsed.select(
            "host",
            F.lit(1).cast("long").alias("_f"),
            (kind == "content").cast("long").alias("_p"),
            F.lit(0).cast("long").alias("_m"),
        ).unionByName(
            misses.select(
                "host",
                F.lit(0).cast("long").alias("_f"),
                F.lit(0).cast("long").alias("_p"),
                F.lit(1).cast("long").alias("_m"),
            )
        )
        metrics = tagged.groupBy("host").agg(
            F.count("*").alias("scheduled"),
            F.sum("_f").alias("fetched"),
            F.sum("_p").alias("parsed"),
            F.sum("_m").alias("failed"),
        ).select(
            F.lit(round_id).alias("round_id"),
            "host", "scheduled", "fetched", "parsed", "failed",
            F.lit(0).cast("long").alias("deduped"),
        )
        return {
            "content": content,
            "comments": comments,
            "creators": creators,
            "contacts": contacts,
            "dynamics": dynamics,
            "tieba_notes": tieba_notes,
            "zhihu_comments": zhihu_comments,
            "metrics": metrics,
            "denied": denied,
            "failed": failed,
        }, seen_delta, new_frontier

    # -- seen log (append-only, sharded per round inside the round write) ---
    def _seen_dirs(self, upto_round: int) -> list[str]:
        base = self.ckpt or self._scratch
        out = []
        for d in sorted(os.listdir(base)) if os.path.isdir(base) else []:
            if not d.startswith("round="):
                continue
            sub = os.path.join(base, d, "deltas", "tbl=seen")
            if int(d.split("=")[1]) < upto_round and os.path.isdir(sub):
                out.append(sub)
        return out

    def _read_seen(self, upto_round: int) -> DataFrame:
        """Seen set visible to round ``upto_round``: rounds < upto_round.

        Round visibility is enforced at the *path* level (only completed
        earlier rounds' tbl=seen shards are listed), which also makes
        resume crash-safe: a crashed round's partial tbl= shards are
        never read (its round re-runs with mode=overwrite, replacing it).
        """
        dirs = self._seen_dirs(upto_round)
        if not dirs:
            return self.spark.createDataFrame([], "url string, round_id int")
        return self.spark.read.parquet(*dirs).select("url", "round_id")

    # -- the driver loop ----------------------------------------------------
    def run(self, seeds: DataFrame, max_rounds: int = 50, resume: bool = False) -> CrawlResult:
        spark = self.spark
        start_round = 0
        # rounds whose round write committed — CrawlResult reads each table
        # back as ONE multi-path parquet scan over these (constant plan
        # depth; the former per-round unionByName chain grew linearly and
        # became a driver-analysis cost at hundreds of rounds)
        written_rounds: list[int] = []

        if self.ckpt:
            self._scratch = None
            base = self.ckpt
        else:
            import atexit
            import tempfile

            self._scratch = tempfile.mkdtemp(prefix="crawl_state_")
            base = self._scratch
            # Self-created scratch (no checkpoint_dir → no resume contract)
            # is reclaimed at interpreter exit even if the caller never
            # calls clear_scratch — keeps test/bench runs from littering
            # /tmp. Explicit clear_scratch still works (rmtree is a no-op
            # on a missing dir).
            atexit.register(shutil.rmtree, self._scratch, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        round_dirs = sorted(d for d in os.listdir(base) if d.startswith("round="))
        if resume and self.ckpt:
            # a round is complete iff its round marker committed (_SUCCESS) —
            # the round's write transaction IS the checkpoint boundary
            done = [
                d for d in round_dirs
                if os.path.isfile(os.path.join(base, d, "deltas", "_SUCCESS"))
            ]
            if done:
                last_rid = int(done[-1].split("=")[1])
                frontier = self._read_delta(last_rid, "frontier")
                start_round = last_rid + 1
                self._seen_count = self._read_seen(start_round).count()
                # prior rounds' outputs carry forward by path
                written_rounds.extend(int(d.split("=")[1]) for d in done)
        if start_round == 0:
            # fresh start over an existing dir: stale round shards must not
            # leak into the path-level seen-log listing
            for d in round_dirs:
                shutil.rmtree(os.path.join(base, d))
            frontier = self._materialize(self.seed_frontier(seeds), 0, "frontier_seed")

        r = start_round
        debug = os.environ.get("SPARK_GRAFT_CRAWL_DEBUG") == "1"
        # Adaptive shuffle width (set per round inside _round once the
        # scheduled count is known); the session default is restored in the
        # finally even if a round raises mid-run — the session is shared.
        self._default_shuffle = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        try:
            for r in range(start_round, max_rounds):
                t0 = time.time()
                seen = self._read_seen(r)
                tables, seen_delta, frontier_next = self._round(frontier, seen, r)
                tables["denied"] = tables["denied"].select(*_FRONTIER_COLS)
                tables["seen"] = seen_delta
                tables["frontier"] = frontier_next
                t_build = time.time() - t0

                # Warm the round cache with ONE narrow pass (the parse
                # compute) before the fan-out write: the per-table write jobs
                # then all hit a populated cache instead of stampeding the
                # same partitions.
                t1 = time.time()
                delta_n = seen_delta.count()
                self._seen_count += delta_n
                t_parse = time.time() - t1

                # one write transaction persists every round output (10 tables + seen
                # delta + next frontier); its _SUCCESS marks the round done.
                t1 = time.time()
                out = self._write_deltas(tables, r)
                written_rounds.append(r)
                frontier = out["frontier"]
                t_write = time.time() - t1

                # incremental Bloom maintenance (delta merge, never a rebuild
                # once active) — fed from the read-back, no recompute. Skipped
                # after the final round: the filter only prefilters the NEXT
                # round's dedup, and there isn't one (resume rebuilds it from
                # the seen log, so nothing is lost).
                if self.use_bloom and r + 1 < max_rounds:
                    if self._bloom is None and self._seen_count >= self.bloom_min_seen:
                        self._bloom = seen_ops.ShardedBloom.build(
                            self._read_seen(r + 1),
                            expected_per_shard=self.bloom_capacity_per_shard,
                        )
                    elif self._bloom is not None and delta_n > 0:
                        self._bloom = self._bloom.merge(
                            seen_ops.ShardedBloom.build(
                                out["seen"],
                                expected_per_shard=self.bloom_capacity_per_shard,
                            )
                        )
                for df in getattr(self, "_round_cache", []):
                    df.unpersist()
                if debug:
                    print(
                        f"[crawl r{r}] build={t_build:.2f}s "
                        f"(select_job={getattr(self, '_t_select', 0.0):.2f}s) "
                        f"parse={t_parse:.2f}s "
                        f"write={t_write:.2f}s "
                        # drain = previous round's deferred output writes
                        # joined inside THIS round's write phase (async
                        # pipeline); already included in write= above
                        f"drain={getattr(self, '_t_drain', 0.0):.2f}s "
                        f"total={time.time()-t0:.2f}s seen_n={self._seen_count}"
                    )
                if frontier.filter(F.col("not_before_round") <= F.lit(max_rounds)).limit(1).count() == 0:
                    break
        finally:
            # the last round's deferred writes must land (and its marker
            # commit) before the result tables are read back — and before
            # the engine reports the crawl done. A deferred-write failure
            # raises here with the round uncommitted (re-runs on resume).
            try:
                self._drain_pending()
            finally:
                if self._write_pool is not None:
                    self._write_pool.shutdown(wait=True)
                    self._write_pool = None
                self.spark.conf.set(
                    "spark.sql.shuffle.partitions", str(self._default_shuffle)
                )

        def table(name: str) -> DataFrame:
            """One multi-path parquet read per table over all completed
            rounds' tbl= shards (plan depth constant in rounds; a table with
            no rows in any round has no shards → typed empty frame)."""
            dirs = [
                os.path.join(base, f"round={rid:05d}", "deltas", f"tbl={name}")
                for rid in written_rounds
            ]
            dirs = [d for d in dirs if os.path.isdir(d)]
            if not dirs:
                return self._empty(DELTA_DDL[name])
            return spark.read.schema(DELTA_DDL[name]).parquet(*dirs)

        return CrawlResult(
            content=table("content"),
            comments=table("comments"),
            creators=table("creators"),
            contacts=table("contacts"),
            dynamics=table("dynamics"),
            tieba_notes=table("tieba_notes"),
            zhihu_comments=table("zhihu_comments"),
            seen=self._read_seen(r + 1).dropDuplicates(["url"]),
            frontier=frontier,
            metrics=table("metrics"),
            denied=table("denied"),
            failed=table("failed"),
            rounds=r + 1,
        )

    def clear_checkpoint(self):
        if self.ckpt and os.path.isdir(self.ckpt):
            shutil.rmtree(self.ckpt)

    def clear_scratch(self):
        if getattr(self, "_scratch", None) and os.path.isdir(self._scratch):
            shutil.rmtree(self._scratch)


