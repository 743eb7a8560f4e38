"""North-rule check: engine ≡ sequential reference-semantics simulator.

Same seeds + robots budgets ⇒ equal URL-seen set, equal content/comment
sets including the deterministic crawl-ordering keys (W4), equal denied
set. Also: resume-after-kill produces the identical seen set.
"""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth
from mediacrawler_spark.plans.crawl import CrawlEngine
from tests.reference_sim import simulate


@pytest.fixture(scope="module")
def corpus(spark, documents):
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 40))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_seeds(spark, None, documents=docs)
    robots = synth.build_robots(spark)
    return pages, seeds, robots


@pytest.fixture(scope="module")
def engine_result(spark, corpus):
    pages, seeds, robots = corpus
    eng = CrawlEngine(spark, pages, robots, use_bloom=True)
    return eng.run(seeds, max_rounds=25)


@pytest.fixture(scope="module")
def sim_result(spark, corpus):
    pages, seeds, robots = corpus
    return simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=25,
    )


def test_seen_set_equal(engine_result, sim_result):
    got = {r["url"] for r in engine_result.seen.collect()}
    assert got == sim_result.seen


def test_denied_set_equal(engine_result, sim_result):
    got = {r["url"] for r in engine_result.denied.collect()}
    assert got == sim_result.denied


def test_content_with_ordering_keys_equal(engine_result, sim_result):
    got = {
        (r["note_id"], r["ord_keyword"], r["ord_page"], r["ord_item_idx"], r["ord_cursor_seq"])
        for r in engine_result.content.collect()
    }
    assert got == sim_result.content


def test_comments_with_ordering_keys_equal(engine_result, sim_result):
    got = {
        (r["comment_id"], r["note_id"], r["parent_comment_id"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in engine_result.comments.collect()
    }
    assert got == sim_result.comments


def test_tieba_notes_equal(engine_result, sim_result):
    """S10 in-loop: tieba thread pages crawled end-to-end, extraction equal
    to the row-wise reference extractor (full TiebaNote surface + W4 keys)."""
    got = {
        (r["note_id"], r["title"], r["desc"], r["user_nickname"], r["ip_location"],
         r["publish_time"], r["total_replay_num"], r["total_replay_page"],
         r["ord_keyword"], r["ord_page"], r["ord_item_idx"], r["ord_cursor_seq"])
        for r in engine_result.tieba_notes.collect()
    }
    assert got == sim_result.tieba_notes
    assert len(got) > 0


def test_zhihu_comments_equal(engine_result, sim_result):
    """E3 comments in-loop: full ZhihuComment surface (_extract_comment +
    member-fallback author, zhihu/help.py:213-298) equals the row oracle."""
    got = {
        (r["comment_id"], r["parent_comment_id"], r["content"], r["publish_time"],
         r["ip_location"], r["sub_comment_count"], r["like_count"], r["dislike_count"],
         r["content_id"], r["user_id"], r["user_nickname"],
         r["ord_cursor_seq"], r["ord_item_idx"])
        for r in engine_result.zhihu_comments.collect()
    }
    assert got == sim_result.zhihu_comments
    assert len(got) > 0


def test_comment_cursor_strings_match_sim(spark, documents):
    """J2 — frontier rows carry reference-identical per-platform comment
    cursor strings (weibo max_id, kuaishou pcursor, bilibili next, zhihu
    offset, xhs opaque cursor, douyin offset)."""
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 150))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_seeds(spark, None, documents=docs)
    robots = synth.build_robots(spark)
    eng = CrawlEngine(spark, pages, robots, use_bloom=False)
    # round 0 fetches content → seeds comment page 0 (initial cursors);
    # round 1 fetches page 0 → page-1 seeds carry the protocol cursors
    res = eng.run(seeds, max_rounds=2)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=2,
    )
    frontier_rows = {
        r["url"]: r["cursor"]
        for r in res.frontier.collect()
        if r["url"] in sim.cursor_vals
    }
    assert frontier_rows
    for url, cur in frontier_rows.items():
        assert cur == sim.cursor_vals[url], url
    cm = {u: c for u, c in frontier_rows.items() if "/api/comments/" in u}
    assert cm, "expected comment page-1 seeds in the frontier"
    # protocol shape spot checks (presence depends on which platforms drew
    # notes with >10 comments in this corpus slice — check what exists)
    for u, c in cm.items():
        if ".weibo." in u:
            assert c.isdigit() and int(c) > 0, (u, c)  # max_id chain
        elif ".zhihu." in u:
            assert c.endswith("_0_0"), (u, c)  # offset token from paging.next
        elif ".xhs." in u:
            assert "c" in c, (u, c)  # opaque last-comment-id cursor
        elif ".douyin." in u or ".bilibili." in u or ".kuaishou." in u:
            assert c.isdigit(), (u, c)
    pages.unpersist()


def test_sub_comment_cursor_strings_match_sim(spark, documents):
    """J3 — sub-walk frontier rows carry reference-identical per-platform
    cursor strings: xhs opaque last-sub id (client.py:385-407), douyin
    offset (client.py:262-267), kuaishou pcursor token ending at "no_more"
    (client.py:249-264), bilibili PAGE NUMBER (?pn=, client.py:306-337),
    zhihu offset token (client.py:304-350); weibo seeds no sub pages at
    all (subs are inline, weibo/client.py:205-210)."""
    docs = documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 150))
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    seeds = synth.build_seeds(spark, None, documents=docs)
    robots = synth.build_robots(spark)
    eng = CrawlEngine(spark, pages, robots, use_bloom=False)
    # r0 content → comment p0 seeds; r1 comment p0 → sub p0 seeds (parent
    # trigger fields); r2 sub p0 → sub p1 seeds carrying protocol cursors
    res = eng.run(seeds, max_rounds=3)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=3,
    )
    frontier_rows = {
        r["url"]: r["cursor"]
        for r in res.frontier.collect()
        if r["url"] in sim.cursor_vals
    }
    for url, cur in frontier_rows.items():
        assert cur == sim.cursor_vals[url], url
    sub = {u: c for u, c in frontier_rows.items() if "/api/subcomments/" in u}
    assert sub, "expected sub-comment seeds in the frontier"
    seen_plats = set()
    for u, c in sub.items():
        plat = u.split(".")[1]
        seen_plats.add(plat)
        if plat == "weibo":
            raise AssertionError(f"weibo must not seed sub pages: {u}")
        if "?pn=" in u:  # bilibili page-number walk
            assert plat == "bilibili" and c in ("1", "2"), (u, c)
        elif plat == "bilibili":
            raise AssertionError(f"bilibili subs must page by number: {u}")
        elif plat == "xhs":
            assert c == "" or c.endswith("s9"), (u, c)
        elif plat == "douyin":
            assert c in ("0", "10"), (u, c)
        elif plat == "kuaishou":
            assert c in ("", "sp1"), (u, c)
        elif plat == "zhihu":
            assert c in ("", "10_0_0"), (u, c)
    # page-1 cursors (the protocol's moving part) must actually appear
    page1 = {c for c in sub.values() if c not in ("", "0", "1", None)}
    assert page1, "expected sub page-1 cursor tokens in the frontier"
    pages.unpersist()


def test_failed_set_equal_including_null_host(engine_result, sim_result):
    """Exhausted-retry rows match the simulator — in particular the
    malformed seed (NULL parse_url host) must travel through the scheduler's
    null-safe budget key into `failed`, not sit 'open' forever."""
    got = {r["url"] for r in engine_result.failed.collect()}
    assert got == sim_result.failed
    assert "not-a-url" in got


def test_politeness_budget_never_exceeded(engine_result, spark, corpus):
    _, _, robots = corpus
    budgets = {r["host"]: r["max_per_round"] for r in robots.collect()}
    for r in engine_result.metrics.collect():
        cap = budgets.get(r["host"], 200)
        assert r["scheduled"] <= cap, f"{r['host']} round {r['round_id']}: {r['scheduled']} > {cap}"


def test_resume_equals_uninterrupted(spark, corpus, engine_result, tmp_path):
    pages, seeds, robots = corpus
    ck = str(tmp_path / "ckpt")
    eng1 = CrawlEngine(spark, pages, robots, checkpoint_dir=ck, use_bloom=False)
    eng1.run(seeds, max_rounds=4)  # simulated kill after round 4
    eng2 = CrawlEngine(spark, pages, robots, checkpoint_dir=ck, use_bloom=False)
    resumed = eng2.run(seeds, max_rounds=25, resume=True)
    a = {r["url"] for r in resumed.seen.collect()}
    b = {r["url"] for r in engine_result.seen.collect()}
    assert a == b


def test_crashed_round_write_reruns_on_resume(spark, corpus, engine_result, tmp_path):
    """The round write transaction commits via a driver-side
    ``deltas/_SUCCESS`` marker written only after EVERY per-table job
    committed. A crash mid-write leaves partial ``tbl=`` shards with no
    marker: resume must treat the round as incomplete, never read its
    partial shards (path-level seen visibility), and re-run it — final
    seen set identical to an uninterrupted crawl."""
    import os

    pages, seeds, robots = corpus
    ck = str(tmp_path / "ckpt_crash")
    eng1 = CrawlEngine(spark, pages, robots, checkpoint_dir=ck, use_bloom=False)
    eng1.run(seeds, max_rounds=4)
    # simulate a crash during round 3's write: the per-table shards are
    # (partially) on disk but the round marker never landed
    r3 = os.path.join(ck, "round=00003", "deltas")
    assert os.path.isfile(os.path.join(r3, "_SUCCESS"))
    assert any(d.startswith("tbl=") for d in os.listdir(r3))
    os.remove(os.path.join(r3, "_SUCCESS"))
    eng2 = CrawlEngine(spark, pages, robots, checkpoint_dir=ck, use_bloom=False)
    resumed = eng2.run(seeds, max_rounds=25, resume=True)
    a = {r["url"] for r in resumed.seen.collect()}
    b = {r["url"] for r in engine_result.seen.collect()}
    assert a == b


def test_comment_order_time_desc_equivalence(spark, corpus):
    """O2 — CommentOrderType=time_desc: engine and simulator re-rank each
    comment page's item_idx by (create_time DESC, id ASC) and stay
    equivalent on the full comment set including ordering keys. The mode
    must actually change positions vs default (synthetic create_times are
    strictly increasing within a page, so time_desc reverses them)."""
    pages, seeds, robots = corpus
    eng = CrawlEngine(spark, pages, robots, use_bloom=False, comment_order="time_desc")
    res = eng.run(seeds, max_rounds=25)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=25, comment_order="time_desc",
    )
    got = {
        (r["comment_id"], r["note_id"], r["parent_comment_id"], r["ord_cursor_seq"], r["ord_item_idx"])
        for r in res.comments.collect()
    }
    assert got == sim.comments
    default_sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=25,
    )
    assert got != default_sim.comments  # the mode is not a no-op


def test_xhs_api_html_fallback_in_loop(spark):
    """S9 composition in-loop (xhs/core.py:272-283): some xhs notes get an
    EMPTY feed-API envelope and resolve ONLY through the __INITIAL_STATE__
    HTML fallback (client.py:535-592). Their content rows must carry the
    full field set (values pinned against the corpus attribute columns, not
    the extractor), and the engine's creator seeds — which come from the
    PARSED user_id — must equal the simulator's (data-uid regex, an
    independent path)."""
    # doc_id % 7 == 0 (xhs), % 11 == 4 (API-empty), and on robots-allowed
    # hosts (xxhash host bucket != 3)
    fb_ids = [224, 301, 378]
    api_ids = [77, 231, 385]      # xhs, API-success, allowed hosts
    docs = spark.createDataFrame(
        [(i, f"正文 body {i}", "zh") for i in fb_ids + api_ids],
        "doc_id long, text string, lang string",
    )
    pages = synth.build_pages(spark, None, documents=docs).cache()
    pages.count()
    xhs_pages = {
        r["url"]: bytes(r["html"]).decode()
        for r in pages.filter(
            (F.col("platform") == "xhs") & (F.col("kind") == "content")
        ).collect()
    }
    # corpus sanity: the fallback subset is API-empty + INITIAL_STATE
    for u, h in xhs_pages.items():
        did = int(u.split("/explore/n")[1].split("?")[0])
        if did in fb_ids:
            assert '"api-json" type="application/json">{}</script>' in h
            assert "__INITIAL_STATE__" in h and "noteDetailMap" in h
        else:
            assert '"note_card":' in h and "__INITIAL_STATE__" not in h

    seeds = spark.createDataFrame(
        [(u, 0, None) for u in sorted(xhs_pages)],
        "url string, priority int, keyword string",
    )
    robots = synth.build_robots(spark)
    eng = CrawlEngine(spark, pages, robots, use_bloom=False, crawl_creators=True)
    res = eng.run(seeds, max_rounds=6)
    sim = simulate(
        [r.asDict() for r in pages.select("url", "html").collect()],
        [r.asDict() for r in seeds.collect()],
        [r.asDict() for r in robots.collect()],
        max_rounds=6, crawl_creators=True,
    )
    got_seen = {r["url"] for r in res.seen.collect()}
    assert got_seen == sim.seen
    # parsed user_id seeded a creator page for EVERY note, fallback included
    assert sum("/user/" in u for u in got_seen) > 0

    # field values pinned against the corpus attribute columns
    exp = {
        r["note_id"]: r
        for r in synth._base(docs).filter(F.col("platform") == "xhs").collect()
    }
    content = {r["note_id"]: r for r in res.content.collect()}
    assert set(content) == {f"n{i}" for i in fb_ids + api_ids}
    for nid, r in content.items():
        e = exp[nid]
        assert r["title"] == f"title-{nid}"
        assert r["user_id"] == e["user_id"] and r["nickname"] == e["nickname"]
        assert r["liked_count"] == e["liked_count"]
        assert r["time"] == e["create_ms"]
    eng.clear_scratch()
    pages.unpersist()


def test_async_write_pipeline_equals_sync(spark, corpus, engine_result, tmp_path):
    """The one-round-deep async output-write pipeline must be a pure
    latency optimization: identical seen set, identical comment rows, and
    every round's _SUCCESS marker committed by run()'s drain — vs the
    synchronous write path (async_writes=False)."""
    import os

    pages, seeds, robots = corpus
    ck = str(tmp_path / "ckpt_async")
    eng = CrawlEngine(
        spark, pages, robots, checkpoint_dir=ck, use_bloom=True, async_writes=True
    )
    res = eng.run(seeds, max_rounds=25)
    sync_eng = CrawlEngine(spark, pages, robots, use_bloom=True, async_writes=False)
    sync = sync_eng.run(seeds, max_rounds=25)
    assert {r["url"] for r in res.seen.collect()} == {
        r["url"] for r in sync.seen.collect()
    }
    a = {(r["comment_id"], r["note_id"]) for r in res.comments.collect()}
    b = {(r["comment_id"], r["note_id"]) for r in sync.comments.collect()}
    assert a == b
    # every completed round committed its marker (drain ran to the end)
    rounds = sorted(d for d in os.listdir(ck) if d.startswith("round="))
    assert rounds
    for d in rounds:
        assert os.path.isfile(os.path.join(ck, d, "deltas", "_SUCCESS")), d
    # nothing left pending and the pool is shut down
    assert eng._pending is None and eng._write_pool is None
