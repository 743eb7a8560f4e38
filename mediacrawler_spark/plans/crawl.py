"""The crawl engine: BSP rounds over a materialized frontier table.

The reference's crawl "plan" is hard-coded sequential control flow — per
keyword page loops, per-note comment cursor loops, per-comment sub-cursor
loops (media_platform/xhs/core.py:116-169, client.py:325-428) — with all
state in loop-local variables and politeness enforced by sleeps + a
semaphore of 1 (config/base_config.py:77,109). The engine re-expresses that
as **iterative DataFrame rounds** (SURVEY §3 lifecycle mapping):

    round k:
      select   — robots gate + per-host politeness window + priority
                 (operators.scheduler; salted two-phase rank for hot hosts)
      fetch    — broadcast fetch-join of the scheduled batch against the
                 pages table (J1/S8: the scheduled side is small by
                 construction — per-host budgets bound it — so it
                 broadcasts; the 100 TB pages scan stays pruned to
                 url/host/html/text columns)
      extract  — native from_json/regexp extraction (operators.extract);
                 content rows + comment rows + next-cursor emissions
      dedup    — Bloom-prefiltered exact anti-join vs seen (operators.seen)
      merge    — frontier' = leftover + retries + new URLs; seen' += fetched;
                 checkpoint everything, truncating lineage

Driver does orchestration only — every data operation is a distributed
DataFrame op. State lives in checkpointed tables (parquet here; Iceberg
MERGE on a cluster — same logical semantics), so the crawl **resumes** from
the last completed round (north_rule; stronger than the reference, which
only has store-time dedup + START_PAGE skip, SURVEY §2.10).

Determinism: the crawl order is defined by explicit ordering-key columns
(keyword, page, item_idx, cursor_seq — W4), never by partition iteration
order; equivalence with a sequential reference-semantics simulator is
asserted in tests/test_crawl_equivalence.py.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediacrawler_spark.functions.text import url_note_id_col
from mediacrawler_spark.operators import extract as X
from mediacrawler_spark.operators import scheduler as sched
from mediacrawler_spark.operators import seen as seen_ops

MAX_ATTEMPTS = 3  # reference: tenacity 3 retries (xhs/client.py:82)

_FRONTIER_COLS = [
    "url", "host", "priority", "depth", "state", "cursor", "attempts",
    "not_before_round", "keyword", "page", "item_idx", "cursor_seq", "round_id",
]

_RC: dict | None = None


def _round_cols() -> dict:
    """Static per-round column lists, built once per process (the round
    loop re-issues these plans every round; caching the unresolved Columns
    removes ~1-2 s/round of py4j plan-construction latency). Round-scoped
    literals (round_id, not_before_round) are attached via withColumn."""
    global _RC
    if _RC is not None:
        return _RC
    _RC = {
        "content": [
            F.col("note_id"), F.col("url"), F.col("platform"), F.col("title"),
            F.col("desc"), F.col("text"), F.col("user_id"), F.col("nickname"),
            F.col("liked_count"), F.col("time"),
            F.col("keyword").alias("source_keyword"),
            F.col("keyword").alias("ord_keyword"),
            F.col("page").alias("ord_page"),
            F.col("item_idx").alias("ord_item_idx"),
            F.col("cursor_seq").alias("ord_cursor_seq"),
        ],
        "comment_seed": [
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/api/comments/"),
                url_note_id_col(F.col("url")), F.lit("?cursor=0"),
            ).alias("url"),
            F.col("host"), F.col("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.col("keyword"), F.col("page"), F.col("item_idx"),
            F.lit(0).alias("cursor_seq"),
        ],
        "comments": [
            F.col("comment_id"),
            F.when(F.col("kind") == "comments", F.col("target_id"))
            .otherwise(F.regexp_extract(F.col("target_id"), r"^(.*?)c\d+$", 1)).alias("note_id"),
            F.when(F.col("kind") == "subcomments", F.col("target_id"))
            .otherwise(F.lit(None).cast("string")).alias("parent_comment_id"),
            F.col("content"), F.col("create_time"), F.col("sub_comment_count"),
            F.col("cursor_seq").alias("ord_cursor_seq"),
            F.col("item_idx").alias("ord_item_idx"),
        ],
        "next_cursor_seed": [
            F.concat(
                F.lit("https://"), F.col("host"),
                F.when(F.col("kind") == "comments", F.lit("/api/comments/"))
                .otherwise(F.lit("/api/subcomments/")),
                F.col("target_id"), F.lit("?cursor="), F.col("next_cursor"),
            ).alias("url"),
            F.col("host"), F.col("priority"), F.col("depth"), F.col("keyword"), F.col("page"),
            F.col("f_item_idx").alias("item_idx"),
            (F.col("cursor_seq") + 1).alias("cursor_seq"),
        ],
        "sub_seed": [
            F.concat(
                F.lit("https://"), F.col("host"), F.lit("/api/subcomments/"),
                F.col("comment_id"), F.lit("?cursor=0"),
            ).alias("url"),
            F.col("host"), F.col("priority"),
            (F.col("depth") + 1).alias("depth"),
            F.col("keyword"), F.col("page"), F.col("item_idx"),
            F.lit(0).alias("cursor_seq"),
        ],
        "new_frontier": [
            F.col("url"), F.col("host"),
            F.col("priority").cast("int").alias("priority"),
            F.col("depth").cast("int").alias("depth"),
            F.lit("open").alias("state"),
            F.lit(None).cast("string").alias("cursor"),
            F.lit(0).alias("attempts"),
            F.col("keyword"), F.col("page"), F.col("item_idx"), F.col("cursor_seq"),
        ],
    }
    return _RC


@dataclass
class CrawlResult:
    content: DataFrame
    comments: DataFrame
    creators: DataFrame
    seen: DataFrame
    frontier: DataFrame
    metrics: DataFrame
    denied: DataFrame
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
        max_search_pages: int | None = None,  # O3 page budget (CRAWLER_MAX_NOTES_COUNT/page_size)
        crawl_creators: bool = False,  # §3.3 creator mode: fetch author profiles
        use_bloom: bool = True,
        bloom_min_seen: int = 20_000,
        bloom_capacity_per_shard: int = 500_000,
        n_salts: int = 8,
        global_limit: int | None = None,
        broadcast_threshold: int = 3_000_000,
        fetch_join: str = "auto",  # auto | broadcast | colocated
    ):
        self.spark = spark
        # column-pruned pages scan: never drag html for rows we don't fetch
        self.pages = pages.select("url", "warc_ts", "html", "text")
        self.robots = robots
        self.ckpt = checkpoint_dir
        self.enable_sub_comments = enable_sub_comments
        self.max_comments_per_note = max_comments_per_note
        self.comment_page_size = comment_page_size
        self.max_search_pages = max_search_pages
        self.crawl_creators = crawl_creators
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
    def _round(self, frontier: DataFrame, seen: DataFrame, round_id: int):
        scheduled, denied = sched.select_round(
            frontier, self.robots, round_id, self.n_salts, self.global_limit
        )
        # The round's two expensive intermediates — the politeness-window
        # selection and the fetch-join — feed several outputs (content,
        # comments, seen, frontier, metrics); cache them for the round so
        # each is computed once (unpersisted by run() after checkpointing).
        scheduled = scheduled.persist()
        n_scheduled = scheduled.count()
        self._small_round = n_scheduled < 20_000
        # Fetch-join (J1) — see fetch_join in __init__.
        if self.fetch_join == "colocated" or (
            self.fetch_join == "auto" and n_scheduled > self.broadcast_threshold
        ):
            probe = scheduled
        else:
            probe = F.broadcast(scheduled)
        fetched = self.pages.join(probe, on="url", how="inner").persist()
        self._round_cache = [scheduled, fetched]
        misses = scheduled.join(fetched.select("url"), on="url", how="left_anti")

        kind = X.classify_url_col(F.col("url"))
        fetched = fetched.withColumn("kind", kind)

        rc = _round_cols()
        # --- content extraction (P1 + E2–E5) ---
        content_pages = fetched.filter(F.col("kind") == "content")
        content = X.extract_content(content_pages).join(
            content_pages.select("url", "keyword", "page", "item_idx", "cursor_seq"),
            on="url",
        ).select(*rc["content"]).withColumn("round_id", F.lit(round_id))

        # comment-count discovery from the page body → seed first cursor page
        n_com = F.regexp_extract(F.decode(F.col("html"), "UTF-8"), r"comments:(\d+)", 1)
        comment_seeds = (
            content_pages.withColumn("_n", F.nullif(n_com, F.lit("")).cast("int"))
            .filter(F.col("_n") > 0)
            .select(*rc["comment_seed"])
        )

        # --- comment extraction (J2/J3) ---
        comment_pages = fetched.filter(F.col("kind").isin("comments", "subcomments"))
        # item_idx from extraction = comment position on the page (W4 key);
        # f_item_idx = the frontier row's inherited position.
        cx = X.extract_comment_pages(
            comment_pages.select("url", "host", "html")
        ).join(
            comment_pages.select(
                "url", "priority", "depth", "keyword", "page",
                F.col("item_idx").alias("f_item_idx"), "cursor_seq",
            ),
            on="url",
        )
        comments = (
            cx.filter(F.col("comment_id").isNotNull())
            .select(*rc["comments"])
            .withColumn("round_id", F.lit(round_id))
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

        page_info = cx.select(
            "url", "host", "kind", "target_id", "has_more", "next_cursor",
            "priority", "depth", "keyword", "page", "f_item_idx", "cursor_seq",
        ).dropDuplicates(["url"])
        cursor_gate = F.col("has_more")
        sub_gate = (F.col("kind") == "comments") & (F.col("sub_comment_count") > 0)
        if self.max_comments_per_note is not None:
            mc, ps = self.max_comments_per_note, self.comment_page_size
            # stop paging a note once the budget is reachable on fetched pages
            cursor_gate = cursor_gate & (
                (F.col("kind") != "comments") | ((F.col("cursor_seq") + 1) * ps < mc)
            )
            # comments past the budget don't expand their sub-threads either
            sub_gate = sub_gate & (F.col("cursor_seq") * ps + F.col("item_idx") < mc)
        next_cursor_seeds = page_info.filter(cursor_gate).select(*rc["next_cursor_seed"])
        sub_seeds = (
            cx.filter(sub_gate).select(*rc["sub_seed"])
            if self.enable_sub_comments
            else self.spark.createDataFrame(
                [], "url string, host string, priority int, depth int, keyword string, page int, item_idx int, cursor_seq int"
            )
        )

        # --- search-page expansion (S1–S7: keyword page loop → J1 fan-out) ---
        search_pages = fetched.filter(F.col("kind") == "search")
        sx = X.extract_search_pages(search_pages.select("url", "host", "html")).join(
            search_pages.select("url", "priority", "depth", "keyword"), on="url"
        )
        note_seeds = sx.filter(F.col("note_url").isNotNull()).select(
            F.col("note_url").alias("url"),
            F.parse_url(F.col("note_url"), F.lit("HOST")).alias("host"),
            "priority",
            (F.col("depth") + 1).alias("depth"),
            "keyword",
            F.col("search_page").alias("page"),
            "item_idx",
            F.lit(0).alias("cursor_seq"),
        )
        next_search_gate = F.col("has_more") & (
            F.lit(True)
            if self.max_search_pages is None
            else (F.col("search_page") + 1 <= F.lit(self.max_search_pages))
        )
        next_search_seeds = (
            sx.dropDuplicates(["url"])
            .filter(next_search_gate)
            .select(
                F.concat(
                    F.lit("https://"), F.col("host"), F.lit("/search/"),
                    F.col("search_kw"), F.lit("?page="),
                    (F.col("search_page") + 1).cast("string"),
                ).alias("url"),
                "host", "priority", "depth", "keyword",
                (F.col("search_page") + 1).alias("page"),
                F.lit(0).alias("item_idx"),
                F.lit(0).alias("cursor_seq"),
            )
        )

        # --- creator profiles (S13, §3.3 creator mode) ---
        creator_pages = fetched.filter(F.col("kind") == "creator")
        creators = X.extract_creators(
            creator_pages.select("url", "host", "html")
        ).withColumn("round_id", F.lit(round_id))
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
                    "url", "host",
                    F.lit(0).alias("priority"),
                    F.lit(0).alias("depth"),
                    F.col("_o.keyword").alias("keyword"),
                    F.col("_o.page").alias("page"),
                    F.col("_o.item_idx").alias("item_idx"),
                    F.lit(0).alias("cursor_seq"),
                )
            )
        else:
            creator_seeds = self.spark.createDataFrame(
                [], "url string, host string, priority int, depth int, keyword string, page int, item_idx int, cursor_seq int"
            )

        # --- frontier maintenance ---
        discovered = (
            comment_seeds.unionByName(next_cursor_seeds).unionByName(sub_seeds)
            .unionByName(note_seeds).unionByName(next_search_seeds)
            .unionByName(creator_seeds)
            .dropDuplicates(["url"])
        )
        active_urls = frontier.select("url")
        if self._bloom is not None:
            new_urls = seen_ops.unseen_bloom_prefiltered(discovered, seen, bloom=self._bloom)
        else:
            new_urls = seen_ops.unseen_exact(discovered, seen)
        new_urls = new_urls.join(active_urls, on="url", how="left_anti")
        new_frontier_rows = (
            new_urls.select(*rc["new_frontier"])
            # politeness: newly discovered URLs wait at least one round
            # (crawl_delay analog; retries use exponential backoff below)
            .withColumn("not_before_round", F.lit(round_id + 1))
            .withColumn("round_id", F.lit(round_id))
            .select(*_FRONTIER_COLS)
        )

        retries = (
            misses.withColumn("attempts", F.col("attempts") + 1)
            .withColumn(
                "state",
                F.when(F.col("attempts") >= MAX_ATTEMPTS, F.lit("failed")).otherwise(F.lit("open")),
            )
            .withColumn(
                "not_before_round",
                F.lit(round_id) + sched.backoff_round(F.col("attempts")),
            )
            .withColumn("round_id", F.lit(round_id))
            .select(*_FRONTIER_COLS)
        )

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
        seen_delta = fetched.select("url").withColumn("round_id", F.lit(round_id))

        # --- per-host round metrics (north_rule lineage counters) ---
        # one tagged union + one aggregation (scheduled = fetched ∪ misses)
        tagged = fetched.select(
            "host",
            F.lit(1).cast("long").alias("_f"),
            (F.col("kind") == "content").cast("long").alias("_p"),
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
        return content, comments, creators, seen_delta, new_frontier, metrics, denied

    # -- seen log (append-only) ---------------------------------------------
    def _read_seen(self, upto_round: int) -> DataFrame:
        """Seen set visible to round ``upto_round``: rounds < upto_round.

        The round_id filter both defines round visibility and makes resume
        crash-safe: a partially-written delta from a crashed round is
        superseded when that round re-runs (duplicate url rows are harmless
        for anti-join semantics; the result view dedups).
        """
        if not any(f.endswith(".parquet") for f in os.listdir(self._seen_dir)):
            return self.spark.createDataFrame([], "url string, round_id int")
        return self.spark.read.parquet(self._seen_dir).filter(
            F.col("round_id") < F.lit(upto_round)
        )

    # -- the driver loop ----------------------------------------------------
    def run(self, seeds: DataFrame, max_rounds: int = 50, resume: bool = False) -> CrawlResult:
        spark = self.spark
        empty = lambda ddl: spark.createDataFrame([], ddl)  # noqa: E731
        start_round = 0
        all_content, all_comments, all_metrics, all_denied = [], [], [], []
        all_creators = []

        if self.ckpt:
            self._seen_dir = os.path.join(self.ckpt, "seen")
            self._scratch = None
        else:
            import tempfile

            self._scratch = tempfile.mkdtemp(prefix="crawl_state_")
            self._seen_dir = os.path.join(self._scratch, "seen")
        if resume and self.ckpt and os.path.isdir(self.ckpt):
            # a round is complete iff its frontier dir exists (written last)
            done = sorted(
                d for d in os.listdir(self.ckpt)
                if d.startswith("round=") and os.path.isdir(os.path.join(self.ckpt, d, "frontier"))
            )
            if done:
                last = os.path.join(self.ckpt, done[-1])
                frontier = spark.read.parquet(os.path.join(last, "frontier"))
                start_round = int(done[-1].split("=")[1]) + 1
                if os.path.isdir(self._seen_dir):
                    self._seen_count = self._read_seen(start_round).count()
                for d in done:  # carry forward prior rounds' outputs
                    base = os.path.join(self.ckpt, d)
                    all_content.append(spark.read.parquet(os.path.join(base, "content_delta")))
                    all_comments.append(spark.read.parquet(os.path.join(base, "comments_delta")))
                    all_metrics.append(spark.read.parquet(os.path.join(base, "metrics_delta")))
                    all_denied.append(spark.read.parquet(os.path.join(base, "denied_delta")))
                    if os.path.isdir(os.path.join(base, "creators_delta")):
                        all_creators.append(spark.read.parquet(os.path.join(base, "creators_delta")))
        if start_round == 0:
            if os.path.isdir(self._seen_dir):
                shutil.rmtree(self._seen_dir)
            frontier = self._materialize(self.seed_frontier(seeds), 0, "frontier_seed")
        os.makedirs(self._seen_dir, exist_ok=True)

        r = start_round
        debug = os.environ.get("SPARK_GRAFT_CRAWL_DEBUG") == "1"
        for r in range(start_round, max_rounds):
            t0 = time.time()
            seen = self._read_seen(r)
            content, comments, creators, seen_delta, frontier_next, metrics, denied = self._round(
                frontier, seen, r
            )
            t_build = time.time() - t0
            denied = denied.select(*_FRONTIER_COLS)

            # persist round outputs; frontier is written LAST — its presence
            # marks the round complete for resume
            t1 = time.time()
            seen_delta = seen_delta.persist()
            delta_n = seen_delta.count()
            seen_delta.write.mode("append").parquet(self._seen_dir)
            self._seen_count += delta_n
            t_seen = time.time() - t1
            content = self._materialize(content, r, "content_delta")
            comments = self._materialize(comments, r, "comments_delta")
            creators = self._materialize(creators, r, "creators_delta")
            metrics = self._materialize(metrics, r, "metrics_delta")
            denied = self._materialize(denied, r, "denied_delta")
            t1 = time.time()
            frontier = self._materialize(frontier_next, r, "frontier")
            t_frontier = time.time() - t1
            all_content.append(content)
            all_comments.append(comments)
            all_creators.append(creators)
            all_metrics.append(metrics)
            all_denied.append(denied)

            # incremental Bloom maintenance (delta merge, never a rebuild
            # once active)
            if self.use_bloom:
                if self._bloom is None and self._seen_count >= self.bloom_min_seen:
                    self._bloom = seen_ops.ShardedBloom.build(
                        self._read_seen(r + 1),
                        expected_per_shard=self.bloom_capacity_per_shard,
                    )
                elif self._bloom is not None and delta_n > 0:
                    self._bloom = self._bloom.merge(
                        seen_ops.ShardedBloom.build(
                            seen_delta,
                            expected_per_shard=self.bloom_capacity_per_shard,
                        )
                    )
            seen_delta.unpersist()
            for df in getattr(self, "_round_cache", []):
                df.unpersist()
            if debug:
                print(
                    f"[crawl r{r}] build={t_build:.2f}s seen_delta={t_seen:.2f}s "
                    f"frontier={t_frontier:.2f}s deltas={time.time()-t0-t_build-t_seen-t_frontier:.2f}s "
                    f"total={time.time()-t0:.2f}s seen_n={self._seen_count}"
                )
            if frontier.filter(F.col("not_before_round") <= F.lit(max_rounds)).limit(1).count() == 0:
                break

        return CrawlResult(
            content=_union_all(all_content) if all_content else empty("note_id string"),
            comments=_union_all(all_comments) if all_comments else empty("comment_id string"),
            creators=_union_all(all_creators) if all_creators else empty("user_id string"),
            seen=self._read_seen(r + 1).dropDuplicates(["url"]),
            frontier=frontier,
            metrics=_union_all(all_metrics) if all_metrics else empty("round_id int, host string"),
            denied=_union_all(all_denied) if all_denied else empty("url string"),
            rounds=r + 1,
        )

    def clear_checkpoint(self):
        if self.ckpt and os.path.isdir(self.ckpt):
            shutil.rmtree(self.ckpt)

    def clear_scratch(self):
        if getattr(self, "_scratch", None) and os.path.isdir(self._scratch):
            shutil.rmtree(self._scratch)


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
