"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is store-time insert-or-update keyed on note_id
(store/xhs/xhs_store_impl.py:127-133); a web-scale corpus needs content
dedup. Shuffle discipline:

- **exact**      — one hash-groupBy on a fingerprint (md5 of normalized
                   text): a single shuffle on a short key, never on the
                   full text bytes.
- **MinHash+LSH** — shingle → k portable min-hashes → bands → *one*
                   groupBy per band-key join to get candidate pairs →
                   exact Jaccard verify on candidates only. Pair cost is
                   O(collisions), never O(n²). Hashes are md5-based so the
                   DuckDB oracle reproduces them bit-for-bit.
- **SimHash**    — 64-bit signature via per-token xxhash64 bit votes; an
                   explode + single groupBy(doc) with 64 conditional sums;
                   near-dup = signatures equal in all bands (hamming ≤ r
                   via band equality).
- **n-gram Jaccard** — exact verify kernel used by the LSH path; also
                   exposed standalone for candidate pair lists.

At 100 TB the LSH path is the only viable one: everything is
linear-per-doc + one band-key shuffle; AQE handles band-bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.operators.textstats import fingerprint_col, tokens_col


# ---------------------------------------------------------------------------
# Exact dedup
def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Fingerprint groups with >1 member (duplicate clusters)."""
    return (
        documents.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
    )


def exact_dedup_keep_first(documents: DataFrame) -> DataFrame:
    """Keep min-doc_id representative per fingerprint (the dedup sink)."""
    reps = exact_dedup_groups(documents).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    return documents.join(reps, on="doc_id", how="left_semi")


# ---------------------------------------------------------------------------
# Shingles
def shingles_col(text, n: int = 3):
    """Word n-gram shingles (distinct), lowercase."""
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    k = F.size(toks)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# MinHash + LSH (portable md5 variant — reproducible in the SQL oracle)
def minhash_signatures(
    documents: DataFrame, n_hashes: int = 8, shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """k min-hashes per doc.

    ``hash_fn="md5"``: hash_i(s) = md5(i || '|' || s), min as string —
    a uniform permutation proxy any ANSI engine reproduces exactly, chosen
    for oracle portability (the ``minhash_sigs`` correctness pair).
    ``hash_fn="xxhash64"``: hash_i(s) = xxhash64(i, s), min as long —
    JVM-native and several× faster; the scale path used by the near-dup
    pipeline (no portable oracle, checked by the planted-dup test).
    """
    from mediacrawler_spark.session import spread

    sh = shingles_col(F.col("text"), shingle_n).alias("sh")
    base = spread(documents, "doc_id").select("doc_id", sh).filter(F.size("sh") > 0)
    if hash_fn == "xxhash64":
        sig_cols = [
            F.array_min(F.transform("sh", lambda s: F.xxhash64(F.lit(i), s))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    else:
        sig_cols = [
            F.array_min(
                F.transform("sh", lambda s: F.md5(F.concat(F.lit(str(i)), F.lit("|"), s)))
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    return base.select("doc_id", *sig_cols)


def lsh_candidate_pairs(
    documents: DataFrame, n_hashes: int = 8, band_size: int = 2, shingle_n: int = 3,
    max_band_bucket: int | None = 64, hash_fn: str = "md5",
) -> DataFrame:
    """Docs sharing any LSH band → candidate (a,b) pairs, a<b, distinct.

    ``max_band_bucket`` is the standard frequency cutoff: a band key shared
    by k docs yields k² pair rows in the self-join, and degenerate keys
    (near-empty docs, boilerplate) can hold millions of docs at corpus
    scale. Keys above the cutoff are DROPPED before the self-join — an
    explicit recall/robustness trade (docs in a dropped bucket usually
    share several other, selective bands). Pass ``None`` to disable.
    """
    sigs = minhash_signatures(documents, n_hashes, shingle_n, hash_fn)
    n_bands = n_hashes // band_size

    def band_key(b):
        members = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        if hash_fn == "xxhash64":
            return F.xxhash64(*members).cast("string")
        return F.md5(F.concat_ws("#", *members))

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_key(b).alias("key"))
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # The band table feeds up to four consumers (bucket-count aggregate,
    # the frequency-cutoff semi-join, both sides of the self-join); without
    # a cache each consumer would recompute the md5 signature pass — the
    # single most expensive stage of the pipeline. The table is narrow
    # (doc_id + 2 short keys); at cluster scale this is the natural
    # materialization point (checkpoint/Iceberg table between stages).
    from mediacrawler_spark.session import persist_tracked

    bands = persist_tracked(bands)
    if max_band_bucket is not None:
        ok = (
            bands.groupBy("band", "key")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_band_bucket)
            .select("band", "key")
        )
        bands = bands.join(ok, on=["band", "key"], how="left_semi")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(right, on=["band", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    documents: DataFrame, pairs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (broadcast-friendly)."""
    sh = documents.select(
        "doc_id", shingles_col(F.col("text"), shingle_n).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "doc_a", "doc_b",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6).alias("jaccard"),
    )


def jaccard_verify_hashed(
    documents: DataFrame, pairs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Scale-path exact-Jaccard verify: shingles hashed to int64 before the
    pair join, and shingle sets computed ONLY for docs that appear in a
    candidate pair (semi-join prefilter).

    The string variant (``jaccard_verify``) ships full string-array shingle
    sets through the join — ~20+ bytes/shingle both ways; this ships 8
    bytes/shingle and only for candidate docs. Jaccard over distinct
    xxhash64 values equals Jaccard over the shingles themselves up to
    vanishing 64-bit collisions. Kept separate because the md5/string
    variant is the DuckDB-oracle-reproducible one (``jaccard_pairs``)."""
    needed = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    from mediacrawler_spark.session import spread

    sh = (
        spread(documents, "doc_id").join(needed, on="doc_id", how="left_semi")
        .select(
            "doc_id",
            F.transform(
                shingles_col(F.col("text"), shingle_n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
    )
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "doc_a", "doc_b",
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6).alias("jaccard"),
    )


def minhash_near_dups(
    documents: DataFrame,
    threshold: float = 0.8,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_band_bucket: int | None = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.

    Uses the hashed verify kernel (int64 shingles, candidate-doc semi-join)
    — the 100 TB shape; round-1 bench showed the string verify join was the
    single most expensive query at sf0.1.

    ``hash_fn`` picks the LSH candidate hash only (the verify kernel's
    internal xxhash64 shingle hashing never changes the Jaccard VALUE —
    Jaccard over distinct hashed shingles equals Jaccard over the shingles):
    "xxhash64" (JVM-native, the scale default) or "md5" (the SQL-oracle-
    reproducible twin — DuckDB can regenerate the exact candidate set)."""
    # the candidate-pair list is read three times by the hashed verify
    # (doc_a ∪ doc_b prefilter + the pair join itself) — cache it so the
    # LSH pipeline runs once
    from mediacrawler_spark.session import persist_tracked

    pairs = persist_tracked(lsh_candidate_pairs(
        documents, n_hashes, band_size, shingle_n, max_band_bucket, hash_fn=hash_fn
    ))
    return jaccard_verify_hashed(documents, pairs, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash (JVM-native xxhash64 bit votes; no SQL oracle — rows-only check)
def simhash_signatures(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash: majority vote over token-hash bits.

    explode → one groupBy(doc_id) with 64 conditional-sum aggregates →
    recombine. All codegen'd; scales as a single shuffle on doc_id.
    """
    from mediacrawler_spark.session import spread

    toks = spread(documents, "doc_id").select(
        "doc_id",
        F.explode(F.transform(tokens_col(F.col(text_col)), lambda t: F.lower(t))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    # bit b set iff ones > half the tokens
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"b{b}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_signatures_md5(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Portable SimHash twin: per-token 64-bit hash derived from the md5
    hex digest (hex digit b//4, bit b%4) instead of xxhash64 — any ANSI
    engine reproduces it bit-for-bit, so this variant gets a DuckDB oracle
    (the xxhash64 variant stays the JVM-fast scale path; same dual-path
    pattern as MinHash's md5/xxhash64 split)."""
    from mediacrawler_spark.session import spread

    toks = spread(documents, "doc_id").select(
        "doc_id",
        F.explode(F.transform(tokens_col(F.col(text_col)), lambda t: F.lower(t))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    digits = toks.select(
        "doc_id",
        *[
            F.conv(F.substring("h", d + 1, 1), 16, 10).cast("int").alias(f"d{d}")
            for d in range(16)
        ],
    )
    votes = digits.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(F.lit(1))).alias(f"b{b}")
            for b in range(64)
        ],
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        # shiftleft(1L, 63) wraps to LONG_MIN — the two's-complement bit-63
        # encoding the SQL twin mirrors explicitly
        sim = sim + F.when(
            F.col(f"b{b}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_dups(
    documents: DataFrame,
    n_bands: int = 4,
    hash_fn: str = "xxhash64",
    max_hamming: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: band-equality candidates (any identical
    16-bit band — the classic Hamming-radius pigeonhole: distance ≤
    n_bands-1 guarantees one equal band), then an exact popcount-of-XOR
    Hamming verify. One shuffle for the band self-join; the per-band key
    space (2^16) bounds bucket fan-out. ``hash_fn='md5'`` uses the
    portable digit-derived token hash so a DuckDB oracle reproduces the
    pairs bit-for-bit (same dual-path pattern as MinHash)."""
    sigs = (
        simhash_signatures(documents) if hash_fn == "xxhash64"
        else simhash_signatures_md5(documents)
    )
    w = 64 // n_bands
    bands = sigs.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * w).bitwiseAND(F.lit((1 << w) - 1)).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(r, on=["band", "key"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    return pairs
