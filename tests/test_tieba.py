"""E2 tieba extractor surface: Arrow-UDF path ≡ row-wise oracle, plus
independent golden asserts per reference branch (title-suffix strip,
data-field unescape→json, comment bodies through the byte-identical
kernel, E17 IP/pub-time/concern/吧龄 regexes, gender markers)."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark import synth_tieba
from mediacrawler_spark.operators import tieba as T

N_DOCS = 25


@pytest.fixture(scope="module")
def docs(spark, documents):
    return documents.filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= N_DOCS))


def _html_rows(pages_df):
    return {
        r["url"]: bytes(r["html"]).decode("utf-8")
        for r in pages_df.select("url", "html").collect()
    }


# -- UDF ≡ row-wise oracle over every fixture page ---------------------------

def test_search_notes_udf_equals_oracle(spark, docs):
    pages = synth_tieba.build_search_fixture_pages(docs)
    got = {
        (r["url"], r["item_idx"]): (r["note_id"], r["title"], r["desc"], r["note_url"],
                                    r["user_nickname"], r["user_link"], r["tieba_name"],
                                    r["tieba_link"], r["publish_time"])
        for r in T.extract_search_notes(pages).collect()
    }
    want = {}
    for url, page in _html_rows(pages).items():
        for i, n in enumerate(T.extract_search_note_list(page)):
            want[(url, i)] = (n["note_id"], n["title"], n["desc"], n["note_url"],
                              n["user_nickname"], n["user_link"], n["tieba_name"],
                              n["tieba_link"], n["publish_time"])
    assert got == want and len(got) == 2 * N_DOCS


def test_forum_notes_udf_equals_oracle(spark, docs):
    pages = synth_tieba.build_forum_list_fixture_pages(docs)
    got = {
        (r["url"], r["item_idx"]): (r["note_id"], r["title"], r["desc"],
                                    r["user_nickname"], r["total_replay_num"])
        for r in T.extract_forum_notes(pages).collect()
    }
    want = {}
    for url, page in _html_rows(pages).items():
        for i, n in enumerate(T.extract_tieba_note_list(page)):
            want[(url, i)] = (n["note_id"], n["title"], n["desc"],
                              n["user_nickname"], n["total_replay_num"])
    assert got == want and len(got) == 2 * N_DOCS


def test_detail_udf_equals_oracle(spark, docs):
    pages = synth_tieba.build_detail_fixture_pages(docs)
    got = {r["url"]: (r["note_id"], r["title"], r["ip_location"], r["publish_time"],
                      r["total_replay_num"], r["total_replay_page"])
           for r in T.extract_details(pages).collect()}
    want = {}
    for url, page in _html_rows(pages).items():
        d = T.extract_note_detail(page)
        want[url] = (d["note_id"], d["title"], d["ip_location"], d["publish_time"],
                     d["total_replay_num"], d["total_replay_page"])
    assert got == want and len(got) == N_DOCS


def test_parent_comments_udf_equals_oracle(spark, docs):
    pages = synth_tieba.build_comments_fixture_pages(docs)
    got = {
        (r["url"], r["item_idx"]): (r["comment_id"], r["content"], r["sub_comment_count"],
                                    r["tieba_id"], r["ip_location"], r["publish_time"], r["note_id"])
        for r in T.extract_parent_comments(pages).collect()
    }
    want = {}
    for r in pages.select("url", "html", "note_id").collect():
        page = bytes(r["html"]).decode("utf-8")
        for i, c in enumerate(T.extract_note_parent_comments(page, r["note_id"])):
            want[(r["url"], i)] = (c["comment_id"], c["content"], c["sub_comment_count"],
                                   c["tieba_id"], c["ip_location"], c["publish_time"], c["note_id"])
    assert got == want and len(got) == 2 * N_DOCS


def test_creator_udf_equals_oracle(spark, docs):
    pages = synth_tieba.build_creator_fixture_pages(docs)
    got = {r["url"]: (r["user_id"], r["user_name"], r["nickname"], r["gender"],
                      r["ip_location"], r["follows"], r["fans"], r["registration_duration"])
           for r in T.extract_creators_tieba(pages).collect()}
    want = {}
    for url, page in _html_rows(pages).items():
        c = T.extract_creator_info(page)
        want[url] = (c["user_id"], c["user_name"], c["nickname"], c["gender"],
                     c["ip_location"], c["follows"], c["fans"], c["registration_duration"])
    assert got == want and len(got) > 0


# -- independent golden asserts (generator and extractor are separate code
#    paths; field values are re-derived from the doc row) -------------------

def test_detail_branches_golden(spark, docs):
    rows = {r["doc_id"]: r for r in synth_tieba.build_detail_fixture_pages(docs).collect()}
    r = rows[7]
    d = T.extract_note_detail(bytes(r["html"]).decode("utf-8"))
    assert d["note_id"] == "t7"
    assert d["title"] == "题目7"          # 【吧2】_百度贴吧 suffix stripped
    assert d["tieba_name"] == "吧2"
    assert d["ip_location"] == r["ip"]     # E17 IP属地 regex
    assert d["publish_time"] == r["ts"]    # E17 tail-info timestamp regex
    assert d["total_replay_num"] == "7" and d["total_replay_page"] == "8"
    assert d["user_nickname"] == "作者7"
    assert d["note_url"] == "https://tieba.baidu.com/p/t7"


def test_comment_kernel_and_unescape_golden(spark, docs):
    pages = synth_tieba.build_comments_fixture_pages(docs)
    r = [x for x in pages.collect() if x["doc_id"] == 3][0]
    cs = T.extract_note_parent_comments(bytes(r["html"]).decode("utf-8"), "t3")
    assert len(cs) == 2
    c0 = cs[0]
    assert c0["comment_id"] == "t3p0"
    # data-field html.unescape → json.loads → byte-identical kernel:
    # tags stripped, double-escaped &amp;amp; resolved exactly once
    assert c0["content"] == "回复 作者3 &amp; 内容0 链接"
    assert c0["sub_comment_count"] == 3  # (doc_id + 0) % 4
    assert c0["tieba_id"] == "f3"
    assert c0["note_url"] == "https://tieba.baidu.com/p/t3"
    assert c0["tieba_link"] == "https://tieba.baidu.com/f?kw=吧3"


def test_subcomments_golden(spark, docs):
    pages = synth_tieba.build_subcomments_fixture_pages(docs)
    r = [x for x in pages.collect() if x["doc_id"] == 5][0]
    parent = {"comment_id": "t5p0", "note_id": "t5",
              "note_url": "https://tieba.baidu.com/p/t5", "tieba_id": "f0",
              "tieba_name": "吧0", "tieba_link": "https://tieba.baidu.com/f?kw=吧0"}
    subs = T.extract_note_sub_comments(bytes(r["html"]).decode("utf-8"), parent)
    assert len(subs) == 2
    assert {s["comment_id"] for s in subs} == {"t5s0", "t5s1"}
    s0 = [s for s in subs if s["comment_id"] == "t5s0"][0]
    assert s0["content"] == "回复 楼主: 子评论0"  # kernel strips <b>
    assert s0["user_nickname"] == "作者5"
    assert s0["parent_comment_id"] == "t5p0"
    assert s0["publish_time"] == r["ts"]


def test_creator_branches_golden(spark, docs):
    pages = synth_tieba.build_creator_fixture_pages(docs)
    rows = {r["doc_id"]: r for r in pages.collect()}
    # doc 3 → marker index (3%3)+1 = 1 → sex_male → 男
    c3 = T.extract_creator_info(bytes(rows[3]["html"]).decode("utf-8"))
    assert c3["gender"] == "男"
    c4 = T.extract_creator_info(bytes(rows[4]["html"]).decode("utf-8"))
    assert c4["gender"] == "女"
    c5 = T.extract_creator_info(bytes(rows[5]["html"]).decode("utf-8"))
    assert c5["gender"] == "未知"
    assert c3["user_id"] == "u3" and c3["user_name"] == "作者3"
    assert c3["follows"] == "3" and c3["fans"] == "9"     # doc_id%500, 3·doc_id%9000
    assert c3["registration_duration"] == "4.5年"          # (3%15)+1 = 4 → 吧龄 regex
    assert c3["ip_location"] == rows[3]["ip"]
    ids = T.extract_thread_ids_from_creator_page(bytes(rows[3]["html"]).decode("utf-8"))
    assert ids == ["t3", "t3b"]  # ?pn=1 stripped from the first


def test_search_notes_golden(spark, docs):
    pages = synth_tieba.build_search_fixture_pages(docs)
    r = [x for x in pages.collect() if x["doc_id"] == 9][0]
    notes = T.extract_search_note_list(bytes(r["html"]).decode("utf-8"))
    assert len(notes) == 2
    assert notes[0]["note_id"] == "t9"
    assert notes[0]["note_url"] == "https://tieba.baidu.com/p/t9"
    assert notes[0]["user_link"].startswith("https://tieba.baidu.com/home/main?un=作者9")
    assert notes[1]["note_id"] == "t9b" and notes[1]["user_nickname"] == "作者9乙"
    assert notes[0]["publish_time"] == r["ts"]


def test_forum_list_comment_strip_golden(spark, docs):
    """`<!--` noise must not leak ghost rows (help.py:73 strip branch)."""
    pages = synth_tieba.build_forum_list_fixture_pages(docs)
    r = [x for x in pages.collect() if x["doc_id"] == 2][0]
    notes = T.extract_tieba_note_list(bytes(r["html"]).decode("utf-8"))
    assert [n["note_id"] for n in notes] == ["t2", "t2b"]
    assert notes[0]["total_replay_num"] == 2  # doc_id % 50 from data-field
    assert notes[0]["user_nickname"] == "作者2"
    assert notes[0]["tieba_name"] == "吧2"
    assert notes[1]["total_replay_num"] == 7


def test_no_batch_eval_python_in_tieba_plan(spark, docs):
    """Arrow-only UDF surface (§2.11) holds for the tieba extractors."""
    pages = synth_tieba.build_search_fixture_pages(docs)
    plan = T.extract_search_notes(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
