"""W1 per-note comment budget: engine ≡ simulator and hard cap holds."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth
from mediacrawler_spark.plans.crawl import CrawlEngine
from tests.reference_sim import simulate

BUDGET = 15


@pytest.fixture(scope="module")
def corpus(spark, documents):
    # doc_id 0 is the viral note (200 comments → 20 cursor pages): exactly
    # the case the budget exists for
    docs = documents.filter(F.col("doc_id") <= 30)
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_seeds(spark, None, documents=docs)
    robots = synth.build_robots(spark)
    return pages, seeds, robots


def test_budget_engine_equals_sim_and_caps(spark, corpus):
    pages, seeds, robots = corpus
    eng = CrawlEngine(spark, pages, robots, max_comments_per_note=BUDGET, use_bloom=False)
    res = eng.run(seeds, max_rounds=15)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=15, max_comments_per_note=BUDGET,
    )
    got = {
        (r["comment_id"], r["note_id"], r["parent_comment_id"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in res.comments.collect()
    }
    assert got == sim.comments
    # hard cap on top-level comments per note
    top = res.comments.filter(F.col("parent_comment_id").isNull())
    per_note = top.groupBy("note_id").agg(F.count("*").alias("n"))
    assert per_note.filter(F.col("n") > BUDGET).count() == 0
    # the viral note hit the cap exactly (it has 200 top-level comments)
    viral = per_note.filter(F.col("note_id") == "n0").collect()
    if viral:  # n0 is seeded (0 % 3 == 0)
        assert viral[0]["n"] == BUDGET
    # budget also bounds paging: with 10 comments per page, no note needs
    # more than ceil(B/10) comment pages fetched. Cursor tokens are now
    # per-platform protocol strings (J2), so count pages per note instead
    # of parsing the cursor value.
    from collections import Counter

    pages_per_note = Counter(
        r["url"].split("/api/comments/")[1].split("?")[0]
        for r in res.seen.collect()
        if "/api/comments/" in r["url"]
    )
    max_pages = (BUDGET + 9) // 10
    overdeep = {nid: n for nid, n in pages_per_note.items() if n > max_pages}
    assert overdeep == {}
