"""Frontier scheduling: robots gate, per-host politeness quota, priority (W3/O6).

The reference serializes all requests behind ``MAX_CONCURRENCY_NUM = 1`` plus
random sleeps (config/base_config.py:77,109; media_platform/xhs/core.py:313-317)
— global, not per-host. The engine's contract (north_rule) is stronger:

- **robots gate** — broadcast join against the small ``robots`` rules table;
  denied hosts are marked, never fetched (the reference has no robots
  handling at all, SURVEY S18).
- **per-host budget** — at most ``max_per_round`` URLs per host per round,
  chosen by (priority, ordering-key): a rank-per-host window.
- **skew** — frontier URLs follow a Zipf host distribution, so a naive
  ``Window.partitionBy(host)`` funnels the hot host into one task. The
  two-phase salted rank keeps parallelism: phase 1 ranks within
  (host, salt) shards; phase 2 only re-ranks the ≤ S·budget survivors per
  host — the second window sees a bounded row count per host regardless of
  how hot the host is, so the plan survives a 100× scale-up.

Budget correctness is per **host**, never per salted shard (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "keyword", "page", "item_idx", "cursor_seq", "url"]

_W1 = None
_W2 = None
_ORDER_ASC = None


def _windows():
    """Window specs + order list, built once (py4j round-trip economy).

    A null keyword sorts as '' (i.e. FIRST among strings) — the sequential
    simulator maps None→'' in its ORDER key, and a budget truncation over a
    host with mixed null/non-null keywords must pick the same winners on
    both sides (engine≡sim equivalence)."""
    global _W1, _W2, _ORDER_ASC
    if _W1 is None:
        _ORDER_ASC = [
            (F.coalesce(F.col(c), F.lit("")) if c == "keyword" else F.col(c)).asc_nulls_last()
            for c in ORDER_COLS
        ]
        _W1 = Window.partitionBy("host", "_salt").orderBy(*_ORDER_ASC)
        _W2 = Window.partitionBy("host").orderBy(*_ORDER_ASC)
    return _W1, _W2, _ORDER_ASC


def robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Split-mark frontier rows by the robots rules table (broadcast dim).

    Unknown hosts default to allowed with the default budget (matches real
    crawler behavior for hosts without robots.txt).
    """
    r = F.broadcast(robots.select("host", "allow", "max_per_round"))
    joined = frontier.join(r, on="host", how="left")
    return joined.withColumn(
        "allow", F.coalesce(F.col("allow"), F.lit(True))
    ).withColumn("max_per_round", F.coalesce(F.col("max_per_round"), F.lit(200)))


def select_round(
    frontier: DataFrame,
    robots: DataFrame,
    round_id: int,
    n_salts: int = 8,
    global_limit: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pick this round's fetch set under robots + per-host budget.

    Returns ``(scheduled, denied)``; ``denied`` rows carry
    ``state='robots_denied'`` and leave the frontier permanently.
    """
    gated = robots_gate(
        frontier.filter(
            (F.col("state") == "open") & (F.col("not_before_round") <= F.lit(round_id))
        ),
        robots,
    )
    denied = (
        gated.filter(~F.col("allow"))
        .drop("allow", "max_per_round")
        .withColumn("state", F.lit("robots_denied"))
    )
    eligible = gated.filter(F.col("allow"))

    # Uncontended fast path: a host whose eligible row count fits its budget
    # schedules every row — rank ≤ budget is vacuously true, so the window
    # would only serialize the host's rows through one task for nothing.
    # This matters whenever budgets are large relative to per-host frontier
    # slices (a 10^7-URL superstep round with politeness effectively off
    # would otherwise funnel the whole frontier through #hosts tasks). The
    # per-host count is a tiny broadcast dim (#hosts rows).
    # The count join keys on a NULL-SAFE host (malformed seeds parse to a
    # NULL host; a plain equi-join would never match them, leaving both
    # filters NULL → the row vanishes from the round and sits 'open'
    # forever, stalling the loop's empty-frontier termination).
    host_key = F.coalesce(F.col("host"), F.lit("")).alias("_hk")
    eligible = eligible.withColumn("_hk", host_key)
    host_counts = eligible.groupBy("_hk").agg(F.count(F.lit(1)).alias("_hn"))
    eligible = eligible.join(F.broadcast(host_counts), on="_hk", how="left")
    passthrough = eligible.filter(F.col("_hn") <= F.col("max_per_round")).drop(
        "_hk", "_hn", "allow", "max_per_round"
    )
    contended = eligible.filter(F.col("_hn") > F.col("max_per_round")).drop("_hk", "_hn")

    # Phase 1: rank within (host, salt) shards — fully parallel even for a
    # host holding 50% of the frontier. Keep only rows that could possibly
    # make the per-host cut: shard-rank ≤ host budget.
    w1, w2, order_asc = _windows()
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts))
    pre = (
        contended.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("max_per_round"))
    )
    # Phase 2: exact rank within host over ≤ n_salts·budget survivors.
    scheduled = passthrough.unionByName(
        pre.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= F.col("max_per_round"))
        .drop("_salt", "_r1", "_r2", "allow", "max_per_round")
    )
    if global_limit is not None:
        # O3-style global budget: deterministic order, then limit.
        scheduled = scheduled.orderBy(*order_asc).limit(global_limit)
    return scheduled, denied


def backoff_round(attempts_col: F.Column) -> F.Column:
    """Retry backoff in rounds: the bilibili schedule 5·2^n (client.py:257-269)
    mapped from seconds to rounds — attempt n retries after 2^n rounds."""
    return F.least(F.pow(F.lit(2.0), attempts_col).cast("int"), F.lit(8))
