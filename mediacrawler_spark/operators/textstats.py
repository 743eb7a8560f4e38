"""Text-analysis operators for a training-data pipeline over ``documents``.

All JVM-native column expressions (whole-stage-codegen friendly, no Python):
language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex piece count), document fingerprinting. Each has
an exact ANSI-SQL oracle twin in ``__spark_entry__.oracle_sql``.

The reference's only text analytics is jieba word-frequency + wordcloud
(tools/words.py:29-83); these generalize that to the feature set a
100 TB-corpus curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small fixed English stopword list — deterministic, mirrored in the SQL oracle.
EN_STOPWORDS = [
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty-safe."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_piece_count_col(text: Column) -> Column:
    """BPE-ish piece estimate: word-chars in runs of ≤4 + punctuation marks.

    ceil(len(word)/4) per word plus one per non-space symbol — a cheap,
    deterministic proxy for subword token counts.
    """
    words = tokens_col(text)
    word_pieces = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    punct = F.length(F.regexp_replace(text, r"[\w\s]", ""))
    return (word_pieces + punct).alias("bpe_pieces")


def stopword_hits_col(text: Column) -> Column:
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


CJK_CLASS = "[一-鿿]"


def cjk_ratio_col(text: Column) -> Column:
    """Fraction of characters in the CJK Unified Ideographs block."""
    n = F.length(text).cast("double")
    cjk = F.regexp_count(text, F.lit(CJK_CLASS)).cast("double")
    return F.when(n > 0, cjk / n).otherwise(F.lit(0.0))


def lang_id_col(text: Column, threshold: float = 0.08, cjk_threshold: float = 0.3) -> Column:
    """Language heuristic: CJK char density ≥ 0.3 → zh (ideographs don't
    tokenize on whitespace, so the stopword path can't see them); else EN
    stopword density ≥ threshold → en; else unk."""
    n = token_count_col(text)
    hits = stopword_hits_col(text)
    ratio = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return (
        F.when(cjk_ratio_col(text) >= cjk_threshold, F.lit("zh"))
        .when(ratio >= threshold, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: length band + stopword density + word shape.

    Deterministic arithmetic only, mirrored exactly in the SQL oracle:
      0.4·min(len/200,1) + 0.4·min(stop_ratio/0.1,1) + 0.2·(mean token len in [3,8])
    """
    n_chars = F.length(text).cast("double")
    n_tok = token_count_col(text).cast("double")
    stop_ratio = F.when(n_tok > 0, stopword_hits_col(text).cast("double") / n_tok).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * F.least(n_chars / F.lit(200.0), F.lit(1.0))
        + F.lit(0.4) * F.least(stop_ratio / F.lit(0.1), F.lit(1.0))
        + F.lit(0.2) * F.when((mean_tok >= 3.0) & (mean_tok <= 8.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def fingerprint_col(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercase, whitespace-collapsed
    text (portable: md5 is identical in Spark and the DuckDB oracle)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def gopher_quality_flags(documents: DataFrame) -> DataFrame:
    """Gopher-style document quality flags (Rae et al. 2021, §A1.1 subset).

    The published repetition/boilerplate heuristics that are exactly
    expressible as deterministic column algebra (each mirrored in the SQL
    oracle; thresholds are the paper's):

    - ``ok_word_count``: 50 ≤ words ≤ 100,000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: ("#" or "…") per word ≤ 0.1
    - ``ok_bullet_ratio``: ≤ 90% of lines start with a bullet
    - ``ok_ellipsis_ratio``: ≤ 30% of lines end with "…"
    - ``ok_alpha_ratio``: ≥ 80% of words contain an [A-Za-z] char
      (portable proxy for the paper's "alphabetic character" test)
    - ``ok_stopwords``: ≥ 2 distinct common stopwords present
    - ``keep``: conjunction of all flags

    One narrow map-only projection — no shuffle, no Python; composes with
    the dedup battery as the pre-dedup quality gate of a curation run.
    """
    from mediacrawler_spark.session import spread

    documents = spread(documents, "doc_id")
    t = F.col("text")
    words = tokens_col(t)
    n_words = F.size(words).cast("double")
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines).cast("double")
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        ) / n_words,
    ).otherwise(F.lit(0.0))
    n_symbols = (F.length(t) - F.length(F.regexp_replace(t, r"[#…]", ""))).cast("double")
    bullets = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))).cast("double")
    ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"…$"))).cast("double")
    alpha = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))).cast("double")
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(F.transform(words, F.lower)), stop)
    )
    flags = {
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "ok_symbol_ratio": F.when(n_words > 0, n_symbols / n_words <= 0.1).otherwise(F.lit(False)),
        "ok_bullet_ratio": F.when(n_lines > 0, bullets / n_lines <= 0.9).otherwise(F.lit(True)),
        "ok_ellipsis_ratio": F.when(n_lines > 0, ellipsis / n_lines <= 0.3).otherwise(F.lit(True)),
        "ok_alpha_ratio": F.when(n_words > 0, alpha / n_words >= 0.8).otherwise(F.lit(False)),
        "ok_stopwords": n_stop_distinct >= 2,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return documents.select(
        "doc_id",
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )


def winnow_fingerprints(documents: DataFrame, k: int = 20, w: int = 8) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, MOSS).

    Hash every character ``k``-gram (md5 — byte-identical in Spark and the
    DuckDB oracle), slide a window of ``w`` consecutive k-gram hashes, keep
    each window's minimum, return the sorted distinct set per document.
    Guarantees any shared substring of length ≥ k+w-1 contributes at least
    one common fingerprint — the edit-position-robust near-dup primitive
    exact/MinHash dedup lacks. All native expressions (sequence/transform/
    slice/array_min): one narrow projection, no shuffle, no Python; at
    100 TB this is a map-only stage feeding a fingerprint→docs explode+join.
    """
    from mediacrawler_spark.session import spread

    documents = spread(documents, "doc_id")
    t = F.col("text")
    n_grams = F.length(t) - F.lit(k) + 1
    kh = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.substring(t, i, k)),
    )
    docs = documents.filter(F.length(t) >= k + w - 1).select("doc_id", kh.alias("kh"))
    mins = F.transform(
        F.sequence(F.lit(1), F.size(F.col("kh")) - F.lit(w) + 1),
        lambda j: F.array_min(F.slice(F.col("kh"), j, w)),
    )
    return docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(mins)).alias("fingerprints"),
    )


def winnow_near_dups(
    documents: DataFrame, k: int = 20, w: int = 8, min_shared: int = 4,
    max_fp_bucket: int | None = 64,
) -> DataFrame:
    """Doc pairs sharing ≥ ``min_shared`` winnowing fingerprints (a<b).

    The rolling-hash near-dup path: explode fingerprints → self-join on the
    fingerprint key → count per pair. ``max_fp_bucket`` is the same
    frequency cutoff the LSH path uses — a fingerprint held by n docs
    yields n² self-join rows, and boilerplate fingerprints hold millions
    at corpus scale, so hot keys are dropped before the join (near-dups
    share many selective fingerprints). One shuffle on the fingerprint
    key, one on the pair key; partial aggregation keeps both map-side
    combined.
    """
    from mediacrawler_spark.session import persist_tracked

    fp = winnow_fingerprints(documents, k, w).select(
        "doc_id", F.explode("fingerprints").alias("fp")
    )
    fp = persist_tracked(fp)
    if max_fp_bucket is not None:
        ok = (
            fp.groupBy("fp").agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_fp_bucket)
            .select("fp")
        )
        fp = fp.join(ok, on="fp", how="left_semi")
    left, right = fp.alias("l"), fp.alias("r")
    return (
        left.join(right, on="fp")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def document_profile(documents: DataFrame) -> DataFrame:
    """One-pass profile over the documents table — the headline text op."""
    from mediacrawler_spark.session import spread

    documents = spread(documents, "doc_id")
    t = F.col("text")
    return documents.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_actual"),
        token_count_col(t).cast("long").alias("n_tokens"),
        bpe_piece_count_col(t).cast("long").alias("bpe_pieces"),
        stopword_hits_col(t).cast("long").alias("stop_hits"),
        lang_id_col(t).alias("lang_pred"),
        F.round(quality_score_col(t), 6).alias("quality"),
        fingerprint_col(t).alias("fingerprint"),
    )
