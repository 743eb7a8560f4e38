"""E18 full-fidelity mode — jieba-algorithm DAG+HMM segmentation.

The reference's tokenizer is ``jieba.lcut`` (tools/words.py:29-43). jieba
is absent from this container, so functions/cjkseg.py implements the
published algorithm; these tests pin (a) the algorithm's distinguishing
behaviors — frequency-weighted max-prob routing beating greedy FMM, HMM
discovery of out-of-dictionary words — and (b) the Arrow UDF against the
row-wise CPython kernel (the same row-oracle pattern the FMM path uses).
"""

from collections import Counter

from pyspark.sql import functions as F

from mediacrawler_spark.functions.cjkseg import DagHmmSegmenter
from mediacrawler_spark.operators.wordfreq import (
    dag_hmm_tokens_col, fmm_segment, word_freq,
)

DICT = {
    "研究": 50, "研究生": 2, "生命": 50, "起源": 10,
    "喜欢": 10, "朋友": 10, "学校": 10, "中文": 10, "分词": 10,
    "数据": 20, "爬虫": 5,
}


def test_max_prob_route_beats_greedy_fmm():
    # the canonical ambiguity: greedy forward matching eats 研究生 and
    # strands 命; the max-prob route, weighted by word frequency, prefers
    # 研究 | 生命 | 起源 — jieba's published motivating example
    seg = DagHmmSegmenter(DICT)
    assert seg.cut("研究生命起源") == ["研究", "生命", "起源"]
    greedy = fmm_segment("研究生命起源", frozenset(DICT), 3)
    assert greedy == ["研究生", "命", "起源"]


def test_dict_unambiguous_text_matches_fmm():
    text = "中文分词数据爬虫"
    seg = DagHmmSegmenter(DICT)
    assert seg.cut(text) == fmm_segment(text, frozenset(DICT), 3)


def test_hmm_discovers_oov_words():
    # 小明 / 小红 are NOT in the dictionary; the route leaves them as
    # single-char runs and the BMES Viterbi (trained on the dictionary's
    # two-char shape) merges each pair back into a word — the jieba
    # finalseg behavior FMM cannot reproduce
    seg = DagHmmSegmenter(DICT)
    assert seg.cut("小明喜欢小红") == ["小明", "喜欢", "小红"]
    # with HMM off the same buffer falls apart into characters
    assert seg.cut("小明喜欢小红", hmm=False) == ["小", "明", "喜欢", "小", "红"]


def test_mixed_latin_and_numbers():
    seg = DagHmmSegmenter(DICT)
    # latin/digit runs ride the DAG block whole and lowercase, matching
    # the engine's FMM path; punctuation outside the han/latin class
    # yields char-wise
    assert seg.cut("数据Spark2024分词") == ["数据", "spark2024", "分词"]
    assert seg.cut("爬虫，分词") == ["爬虫", "，", "分词"]


def test_arrow_udf_matches_rowwise_kernel_and_plans_arrow(spark):
    rows = [
        (0, "研究生命起源"),
        (1, "小明喜欢小红"),
        (2, "中文分词数据爬虫 research 2024"),
        (3, None),
        (4, "学校朋友研究数据"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = df.select("i", dag_hmm_tokens_col(F.col("t"), DICT).alias("toks"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    got = {r["i"]: r["toks"] for r in out.collect()}
    seg = DagHmmSegmenter(DICT)
    for i, t in rows:
        assert got[i] == seg.cut(t or ""), (i, got[i])


def test_word_freq_dag_hmm_matches_counter_oracle(spark):
    texts = [
        "研究生命起源 研究生命起源",
        "小明喜欢小红 小明喜欢学校",
        "中文分词数据爬虫",
        "学校朋友研究数据 research data",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["word"], r["freq"])
        for r in word_freq(df, dict_words=DICT, segmenter="dag_hmm").collect()
    }
    seg = DagHmmSegmenter(DICT)
    want = Counter()
    for t in texts:
        want.update(seg.cut(t))
    assert got == set(want.items())
