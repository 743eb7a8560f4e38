"""Creator-graph expansions (S14–S16 / J4–J5) ≡ sequential simulator.

Detail-mode crawl with the full creator tail enabled: content → author
profiles (S13) → creator-posts cursor walk (S14/J4, with the
CRAWLER_MAX_NOTES_COUNT cap) → bilibili fans/followings edge pages
(S15/J5, swap-args contact store) → dynamics offset pages (S16, with the
dynamics cap). Also asserts the per-platform search-pagination cursor
strings (S2/S3/S7) carried on frontier rows match the simulator's.
"""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth
from mediacrawler_spark.plans.crawl import CrawlEngine
from tests.reference_sim import simulate

MAX_POSTS = 15
MAX_CONTACTS = 12
MAX_DYN = 15


@pytest.fixture(scope="module")
def corpus(spark, documents):
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 60))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_seeds(spark, None, documents=docs)
    robots = synth.build_robots(spark)
    return pages, seeds, robots


@pytest.fixture(scope="module")
def engine_result(spark, corpus):
    pages, seeds, robots = corpus
    eng = CrawlEngine(
        spark, pages, robots, use_bloom=True,
        crawl_creators=True,
        crawl_creator_posts=True, max_creator_posts=MAX_POSTS,
        crawl_contacts=True, max_contacts=MAX_CONTACTS, max_dynamics=MAX_DYN,
    )
    return eng.run(seeds, max_rounds=25)


@pytest.fixture(scope="module")
def sim_result(spark, corpus):
    pages, seeds, robots = corpus
    return simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=25, crawl_creators=True,
        crawl_creator_posts=True, max_creator_posts=MAX_POSTS,
        crawl_contacts=True, max_contacts=MAX_CONTACTS, max_dynamics=MAX_DYN,
    )


def test_seen_set_equal_with_graph(engine_result, sim_result):
    got = {r["url"] for r in engine_result.seen.collect()}
    assert got == sim_result.seen
    assert any("/posts" in u for u in got)
    assert any("/fans" in u for u in got)
    assert any("/dynamics" in u for u in got)
    # tieba creators walk the getthread API, not the generic /posts cursor
    assert any("/home/get/getthread" in u for u in got)
    assert not any("/posts" in u and ".tieba." in u for u in got)


def test_posts_content_keys_equal(engine_result, sim_result):
    got = {
        (r["note_id"], r["ord_keyword"], r["ord_page"], r["ord_item_idx"], r["ord_cursor_seq"])
        for r in engine_result.content.collect()
    }
    assert got == sim_result.content
    # posts-derived notes carry the cursor-walk position (cursor_seq ≥ 1
    # exists somewhere once a creator has >10 posts — the cap allows 2 pages)
    assert len(got) > 0


def test_contact_edges_equal(engine_result, sim_result):
    got = {
        (r["up_id"], r["fan_id"], r["src_kind"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in engine_result.contacts.collect()
    }
    assert got == sim_result.contacts
    assert len(got) > 0
    # swap-args rule really applied: followings rows have the crawled
    # creator on the fan side (store/bilibili/__init__.py:149-161)
    fans_up = {u for (u, _f, k, _c, _i) in got if k == "fans"}
    fol_fan = {f for (_u, f, k, _c, _i) in got if k == "followings"}
    assert fans_up and fol_fan


def test_contacts_capped(engine_result):
    per_page = (
        engine_result.contacts.groupBy("up_id", "fan_id", "src_kind")
        .count().filter(F.col("count") > 1).count()
    )
    assert per_page == 0  # no duplicate edges from the cursor walk
    maxpos = engine_result.contacts.agg(
        F.max(F.col("ord_cursor_seq") * 10 + F.col("ord_item_idx"))
    ).collect()[0][0]
    assert maxpos < MAX_CONTACTS


def test_dynamics_equal_and_capped(engine_result, sim_result):
    got = {
        (r["dynamic_id"], r["user_id"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in engine_result.dynamics.collect()
    }
    assert got == sim_result.dynamics
    assert len(got) > 0
    maxpos = engine_result.dynamics.agg(
        F.max(F.col("ord_cursor_seq") * 10 + F.col("ord_item_idx"))
    ).collect()[0][0]
    assert maxpos < MAX_DYN


def test_failed_set_equal(engine_result, sim_result):
    got = {r["url"] for r in engine_result.failed.collect()}
    assert got == sim_result.failed
    assert len(got) > 0  # the unknown.example seeds exhaust their retries


def test_dynamics_fields(engine_result):
    rows = engine_result.dynamics.limit(20).collect()
    for r in rows:
        assert r["dynamic_id"].startswith("dyn-")
        assert r["dynamic_type"].startswith("DYNAMIC_TYPE_")
        assert r["pub_ts"] > 0


def test_tieba_creator_getthread_paging(spark):
    """S13/J4 tieba in-loop: one creator with 51 h0-hosted threads — the
    homepage lists the first 10 (fetched ungated, reference
    tieba/client.py:351-360), the getthread API pages the remaining 41 at
    20/page, and max_creator_posts=30 cuts the walk after pn=2 via the
    reference's page-granular total_get_count math (client.py:364-385):
    pn=3 exists in the corpus but is never fetched. Engine ≡ simulator on
    seen/content/ordering keys + getthread cursor strings."""
    from pyspark.sql import functions as F

    # doc_ids ≡ 1 (mod 707) share platform=tieba (707 ≡ 0 mod 7) and
    # user_id=user1 (707 ≡ 0 mod 101); keep the h0-hosted, non-viral ones
    cand = spark.range(0, 200).select(
        (F.col("id") * 707 + 1).alias("doc_id")
    ).filter(
        (F.pmod(F.xxhash64(F.lit("host"), F.col("doc_id")), F.lit(16)) < 8)
        & (F.pmod(F.col("doc_id"), F.lit(97)) != 0)
    ).orderBy("doc_id").limit(51)
    docs = cand.select(
        "doc_id",
        F.concat(F.lit("正文 text "), F.col("doc_id").cast("string")).alias("text"),
        F.lit("zh").alias("lang"),
    )
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    tb_pages = {r["url"] for r in pages.select("url").collect()}
    assert any("getthread" in u and "pn=3" in u for u in tb_pages)  # corpus has pn=3
    seeds = spark.createDataFrame(
        [("https://h0.tieba.example/user/user1", 0, None)],
        "url string, priority int, keyword string",
    )
    robots = synth.build_robots(spark)
    eng = CrawlEngine(
        spark, pages, robots, use_bloom=False,
        crawl_creator_posts=True, max_creator_posts=30,
    )
    res = eng.run(seeds, max_rounds=20)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=20, crawl_creator_posts=True, max_creator_posts=30,
    )
    got_seen = {r["url"] for r in res.seen.collect()}
    assert got_seen == sim.seen
    gt = sorted(u for u in got_seen if "getthread" in u)
    assert [u.split("pn=")[1] for u in gt] == ["1", "2"]  # pn=3 budget-cut
    # first-10 + 20 + 20 threads fetched = 50 of the 51
    got_content = {
        (r["note_id"], r["ord_keyword"], r["ord_page"], r["ord_item_idx"], r["ord_cursor_seq"])
        for r in res.content.collect()
    }
    assert got_content == sim.content
    assert len({n for (n, *_rest) in got_content}) == 50
    # frontier cursor strings for the getthread pages matched the sim's
    creators = {(r["user_id"], r["platform"]) for r in res.creators.collect()}
    assert creators == sim.creators == {("user1", "tieba")}
    pages.unpersist()


def test_search_cursor_strings_match_sim(spark, documents):
    """Frontier rows carry reference-identical pagination cursors (S2/S3/S7)."""
    # ≥2 search pages per (platform, keyword): ~11 docs each at 400 docs
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 400))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_search_seeds(spark, keywords=["kw1", "kw3"])
    robots = synth.build_robots(spark)
    eng = CrawlEngine(spark, pages, robots, use_bloom=False)
    # 1 round: page-1 fetched, page-2 seeds (cursor strings) sit in frontier
    res = eng.run(seeds, max_rounds=1)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=1,
    )
    frontier_rows = {
        r["url"]: r["cursor"]
        for r in res.frontier.collect()
        if r["url"] in sim.cursor_vals
    }
    assert frontier_rows, "expected open discovered rows after 1 round"
    for url, cur in frontier_rows.items():
        assert cur == sim.cursor_vals[url], url
    # platform math spot checks (page 2 of each platform's search walk)
    next_search = {u: c for u, c in frontier_rows.items() if "/search/" in u}
    assert any(c and c.startswith("offset=10") for u, c in next_search.items() if ".douyin." in u)
    assert any(c and "searchSessionId=ss-kuaishou-" in c for u, c in next_search.items() if ".kuaishou." in u)
    assert any(c and c.startswith("offset=20") for u, c in next_search.items() if ".zhihu." in u)
    assert any(c and c.startswith("pn=10") for u, c in next_search.items() if ".tieba." in u)
    pages.unpersist()
