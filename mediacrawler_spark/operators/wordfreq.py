"""Word-frequency + top-k (reference: tools/words.py:41-83, A2/A3/O5).

The reference tokenizes with jieba into a ``Counter`` and keeps the top 20.
Engine form: ``explode(split) → groupBy(word).count() → orderBy desc → limit``
— map-side partial aggregation and a top-k sort, all JVM-native. jieba is
unavailable in this container and unnecessary for the synthetic corpus;
the tokenizer is whitespace + lowercase with a broadcast stopword set
(config analog: STOP_WORDS_FILE, config/base_config.py:94-106).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.operators.textstats import EN_STOPWORDS, tokens_col


def fmm_segment(text: str, words: set[str], max_len: int) -> list[str]:
    """Forward-maximum-matching segmentation — the dictionary half of
    jieba.lcut (tools/words.py:41 + add_word customs, words.py:28-31).
    jieba itself is not installed in this container; FMM over the same
    dictionary is the documented approximation and agrees with jieba on
    dictionary-unambiguous text. Latin/digit runs group as one token (as
    jieba does); unmatched CJK falls back to single characters.

    Plain function so tests can run it row-wise as its own oracle and the
    Arrow UDF below can call it per batch.
    """
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch.isascii() and ch.isalnum():
            j = i + 1
            while j < n and text[j].isascii() and text[j].isalnum():
                j += 1
            out.append(text[i:j].lower())
            i = j
            continue
        match = None
        for ln in range(min(max_len, n - i), 1, -1):
            cand = text[i : i + ln]
            if cand in words:
                match = cand
                break
        if match is not None:
            out.append(match)
            i += len(match)
        else:
            out.append(ch)
            i += 1
    return out


def fmm_tokens_col(text: Column, dict_words: list[str]) -> Column:
    """E18 — CJK tokenizer column: Arrow-batched pandas UDF over a
    broadcast-closure dictionary (array<string> out; never per-row
    Python — shows as ArrowEvalPython, not BatchEvalPython)."""
    from pyspark.sql.functions import pandas_udf

    words = frozenset(dict_words)
    max_len = max((len(w) for w in words), default=1)

    @pandas_udf("array<string>")
    def _seg(s):
        return s.fillna("").map(lambda t: fmm_segment(t, words, max_len))

    return _seg(text)


def dag_hmm_tokens_col(text: Column, dict_words) -> Column:
    """E18 full-fidelity mode — jieba-algorithm segmentation (prefix-dict
    DAG + max-prob route + BMES-HMM OOV discovery,
    functions/cjkseg.py) as an Arrow-batched pandas UDF. The segmenter is
    built ONCE per executor python worker from the broadcast-closure
    dictionary (constructor cost is per-batch-stream, not per-row)."""
    from pyspark.sql.functions import pandas_udf

    from mediacrawler_spark.functions.cjkseg import DagHmmSegmenter

    words = dict(dict_words) if isinstance(dict_words, dict) else list(dict_words)
    seg_box: list = []

    @pandas_udf("array<string>")
    def _seg(s):
        if not seg_box:
            seg_box.append(DagHmmSegmenter(words))
        seg = seg_box[0]
        return s.fillna("").map(seg.cut)

    return _seg(text)


def word_freq(
    documents: DataFrame,
    text_col: str = "text",
    drop_stopwords: bool = False,
    dict_words: list[str] | None = None,
    segmenter: str = "fmm",
) -> DataFrame:
    """A2/A3 word frequency. ``dict_words`` switches the tokenizer from
    whitespace (latin corpora) to dictionary segmentation (CJK corpora —
    the reference's jieba path): ``segmenter="fmm"`` (forward maximum
    matching, the documented container-constraint default) or
    ``"dag_hmm"`` (the jieba algorithm itself — prefix-dict DAG,
    max-prob route, HMM Viterbi for out-of-dict words)."""
    from mediacrawler_spark.session import spread

    if dict_words is not None:
        if segmenter == "dag_hmm":
            toks = dag_hmm_tokens_col(F.col(text_col), dict_words)
        else:
            toks = fmm_tokens_col(F.col(text_col), dict_words)
    else:
        toks = F.transform(tokens_col(F.col(text_col)), lambda t: F.lower(t))
    df = spread(documents).select(F.explode(toks).alias("word"))
    if drop_stopwords:
        stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
        df = df.filter(~F.array_contains(stop, F.col("word")))
    return df.groupBy("word").agg(F.count("*").alias("freq"))


def top_k_words(documents: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Deterministic top-k: ties broken by word asc (W4-style explicit order)."""
    return (
        word_freq(documents, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(k)
    )
