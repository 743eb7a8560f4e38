"""Search-mode crawl (§3.1 flagship lifecycle) ≡ sequential simulator.

Seeds are keyword-search page-1 URLs; the engine must walk search pages →
note fan-out (with W4 ordering keys = keyword/search-page/position) →
comment cursors → creator profiles, matching the simulator's seen set,
content ordering keys and creator set, under the page budget (O3).
"""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth
from mediacrawler_spark.plans.crawl import CrawlEngine
from tests.reference_sim import simulate

MAX_SEARCH_PAGES = 2


@pytest.fixture(scope="module")
def corpus(spark, documents):
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 80))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_search_seeds(spark, keywords=["kw1", "kw3"])
    robots = synth.build_robots(spark)
    return pages, seeds, robots


@pytest.fixture(scope="module")
def engine_result(spark, corpus):
    pages, seeds, robots = corpus
    eng = CrawlEngine(
        spark, pages, robots,
        crawl_creators=True, max_search_pages=MAX_SEARCH_PAGES, use_bloom=True,
    )
    return eng.run(seeds, max_rounds=20)


@pytest.fixture(scope="module")
def sim_result(spark, corpus):
    pages, seeds, robots = corpus
    return simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=20, crawl_creators=True, max_search_pages=MAX_SEARCH_PAGES,
    )


def test_search_seen_set_equal(engine_result, sim_result):
    got = {r["url"] for r in engine_result.seen.collect()}
    assert got == sim_result.seen
    # the budget really bit: no search page beyond MAX_SEARCH_PAGES fetched
    assert not any("page=3" in u for u in got if "/search/" in u)
    assert any("/search/" in u for u in got)


def test_search_content_ordering_keys_equal(engine_result, sim_result):
    got = {
        (r["note_id"], r["ord_keyword"], r["ord_page"], r["ord_item_idx"], r["ord_cursor_seq"])
        for r in engine_result.content.collect()
    }
    assert got == sim_result.content
    # search-derived ordering: page ≥ 1 and real item positions
    assert any(p >= 1 and i > 0 for (_n, _k, p, i, _c) in got)


def test_creator_set_equal(engine_result, sim_result):
    got = {(r["user_id"], r["platform"]) for r in engine_result.creators.collect()}
    assert got == sim_result.creators
    assert len(got) > 0


def test_creator_fields_extracted(engine_result):
    rows = engine_result.creators.collect()
    for r in rows:
        assert r["user_id"].startswith("user")
        # tieba creators go through the HTML extractor, whose gender label
        # set includes 未知 (reference help.py:292-305)
        assert r["gender"] in ("男", "女", "未知", None)
        assert r["fans"] is not None


def test_comments_match_in_search_mode(engine_result, sim_result):
    got = {
        (r["comment_id"], r["note_id"], r["parent_comment_id"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in engine_result.comments.collect()
    }
    assert got == sim_result.comments
