"""URL-seen dedup: sharded numpy Bloom prefilter + exact anti-join (J7/U4).

The reference dedups at store time with a per-row ``SELECT by id → INSERT or
UPDATE`` against MySQL/SQLite (store/xhs/xhs_store_impl.py:127-133, unique
index schema/tables.sql:365). At 10^10 URLs that per-row lookup is the
bottleneck, so the engine uses the standard two-stage design:

1. **Sharded Bloom prefilter.** Hashes are computed **JVM-side**
   (``xxhash64`` twice, double-hashing g_i = h1 + i·h2 — Kirsch-Mitzenmacher);
   per-shard bitmaps are built with ``groupBy(shard).applyInPandas`` (each
   shard's partition ORs its bits locally — the north_rule's per-partition
   delta merge), and the small packed bitmaps are broadcast. Membership is
   an Arrow pandas UDF doing pure vectorized numpy bit math — **no per-row
   Python anywhere**. Candidates the filter rejects are *definitely unseen*
   and skip the anti-join shuffle entirely.
2. **Exact anti-join.** Only Bloom positives (true dupes + ~fpp of unseen)
   are verified with ``left_anti`` against ``seen``. The north_rule requires
   the exact URL-seen set, so Bloom is only ever trusted for non-membership.

Sizing: fpp=0.03 ≈ 7.3 bits/URL → 10^10 URLs ≈ 9 GB total, which is why
bitmaps are sharded by url-hash: each shard stays well under the broadcast
limit and is maintained independently (per-round delta = OR of the round's
inserts). Property-tested: output ≡ the exact anti-join for every fpp.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_H2_SEED = 0x9E3779B9  # second-hash salt column mixed into xxhash64


def unseen_exact(candidates: DataFrame, seen: DataFrame, key: str = "url") -> DataFrame:
    """Reference semantics: exact set difference via left_anti."""
    return candidates.join(seen.select(key).distinct(), on=key, how="left_anti")


def _hash_cols(key: str):
    h1 = F.xxhash64(F.col(key))
    h2 = F.xxhash64(F.lit(_H2_SEED), F.col(key))
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n,) uint64 pair → (n, k) bit positions; identical math on build/check."""
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + h2[:, None] * ks[None, :]) % np.uint64(m)


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round((m / n) * math.log(2)))
    return m, k


class ShardedBloom:
    """Per-shard packed bitmaps; small enough to broadcast per shard."""

    def __init__(self, bitmaps: dict[int, np.ndarray], m: int, k: int, n_shards: int):
        self.bitmaps = bitmaps  # shard -> uint8 array of m/8 bytes
        self.m = m
        self.k = k
        self.n_shards = n_shards

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        """OR-in another filter with identical (m, k, n_shards) — the
        per-round delta merge: round r's filter = filter(r-1) | build(delta_r)."""
        assert (self.m, self.k, self.n_shards) == (other.m, other.k, other.n_shards)
        merged = {
            s: self.bitmaps[s] | other.bitmaps[s] for s in range(self.n_shards)
        }
        return ShardedBloom(merged, self.m, self.k, self.n_shards)

    @classmethod
    def build(cls, seen: DataFrame, key: str = "url", n_shards: int = 8, fpp: float = 0.03,
              expected_per_shard: int | None = None) -> "ShardedBloom":
        if expected_per_shard is None:
            expected_per_shard = max(seen.count() // n_shards, 1)
        m, k = _params(expected_per_shard, fpp)
        h1, h2 = _hash_cols(key)
        hashed = seen.select(
            h1.alias("_h1"), h2.alias("_h2"), F.pmod(h1, F.lit(n_shards)).cast("int").alias("_shard")
        )

        nbytes = (m + 7) // 8

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(nbytes, dtype=np.uint8)
            pos = _positions(
                pdf["_h1"].to_numpy().astype(np.uint64),
                pdf["_h2"].to_numpy().astype(np.uint64),
                k, m,
            ).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))
            return pd.DataFrame({"shard": [int(pdf["_shard"].iloc[0])], "bitmap": [bm.tobytes()]})

        rows = (
            hashed.groupBy("_shard")
            .applyInPandas(_build, "shard int, bitmap binary")
            .collect()
        )
        bitmaps = {r["shard"]: np.frombuffer(r["bitmap"], dtype=np.uint8).copy() for r in rows}
        empty = np.zeros(nbytes, dtype=np.uint8)
        for s in range(n_shards):
            bitmaps.setdefault(s, empty)
        return cls(bitmaps, m, k, n_shards)


def unseen_bloom_prefiltered(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url",
    n_shards: int = 8,
    fpp: float = 0.03,
    bloom: ShardedBloom | None = None,
) -> DataFrame:
    """Bloom-prefiltered exact dedup; output identical to ``unseen_exact``."""
    if bloom is None:
        bloom = ShardedBloom.build(seen, key, n_shards, fpp)
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((bloom.bitmaps, bloom.m, bloom.k, bloom.n_shards))

    @pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bitmaps, m, k, n_shards = b.value
        h1s = h1.to_numpy().astype(np.int64)
        h1v = h1s.view(np.uint64)
        h2v = h2.to_numpy().astype(np.int64).view(np.uint64)
        if len(h1v) == 0:
            return pd.Series([], dtype=bool)
        # shard must match the BUILD side's JVM pmod(h1, n_shards) on the
        # SIGNED long: numpy's % on int64 with a positive divisor is floored
        # (non-negative), which equals pmod for every n_shards — the uint64
        # remainder only agrees when n_shards is a power of two.
        shards = h1s % np.int64(n_shards)
        pos = _positions(h1v, h2v, k, m)  # (n, k)
        out = np.ones(len(h1v), dtype=bool)
        for s in np.unique(shards):
            bm = bitmaps[int(s)]
            sel = shards == s
            p = pos[sel]
            bits = (bm[(p >> np.uint64(3)).astype(np.int64)] >> (p & np.uint64(7)).astype(np.uint8)) & 1
            out[sel] = bits.all(axis=1)
        return pd.Series(out)

    h1, h2 = _hash_cols(key)
    flagged = candidates.withColumn("_maybe_seen", might_contain(h1, h2))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    verified_new = needs_check.join(seen.select(key).distinct(), on=key, how="left_anti")
    return definitely_new.unionByName(verified_new)
