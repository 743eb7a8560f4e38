"""Word-frequency + top-k (reference: tools/words.py:41-83, A2/A3/O5).

The reference tokenizes with jieba into a ``Counter`` and keeps the top 20.
Engine form: ``explode(split) → groupBy(word).count() → orderBy desc → limit``
— map-side partial aggregation and a top-k sort, all JVM-native. jieba is
unavailable in this container and unnecessary for the synthetic corpus;
the tokenizer is whitespace + lowercase with a broadcast stopword set
(config analog: STOP_WORDS_FILE, config/base_config.py:94-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediacrawler_spark.operators.textstats import EN_STOPWORDS, tokens_col


def word_freq(documents: DataFrame, text_col: str = "text", drop_stopwords: bool = False) -> DataFrame:
    from mediacrawler_spark.session import spread

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
