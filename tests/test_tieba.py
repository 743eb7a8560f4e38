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


# -- nested-markup goldens (the balanced-tag captures vs the old non-greedy
# close-tag regexes, which truncated at the first nested close) -------------

def test_nested_markup_thread_list_and_desc():
    """A thread list whose abstract div nests another div, and whose list
    body nests a ul — both must survive whole (reference xpath semantics)."""
    page = (
        '<a class="card_title_fname" href="/f?kw=吧x">吧x</a>'
        '<ul id="thread_list">'
        '<li data-field="{&quot;id&quot;:&quot;t1&quot;,&quot;author_name&quot;:&quot;甲&quot;,&quot;reply_num&quot;:3}">'
        '<a class="j_th_tit " href="/p/t1">题一</a>'
        '<div class="threadlist_abs threadlist_abs_onlyline ">前 <div class="em">中</div> 后</div>'
        '<a class="frs-author-name j_user_card " href="/home/main?id=u1">甲</a>'
        '<ul class="inner"><li>噪声</li></ul>'
        '</li>'
        '<li data-field="{&quot;id&quot;:&quot;t2&quot;,&quot;author_name&quot;:&quot;乙&quot;,&quot;reply_num&quot;:0}">'
        '<a class="j_th_tit " href="/p/t2">题二</a>'
        '<div class="threadlist_abs threadlist_abs_onlyline ">简介二</div>'
        '<a class="frs-author-name j_user_card " href="/home/main?id=u2">乙</a>'
        '</li>'
        '</ul><div class="footer">页脚</div>'
    )
    notes = T.extract_tieba_note_list(page)
    # the nested </ul> inside li #1 must NOT cut off li #2
    assert [n["note_id"] for n in notes] == ["t1", "t2"]
    # the nested div inside the abstract is kept whole
    assert notes[0]["desc"] == '前 <div class="em">中</div> 后'
    assert notes[1]["desc"] == "简介二"
    # the nested li (inside the inner ul) has no data-field → skipped, and
    # does not corrupt the real rows
    assert notes[0]["user_nickname"] == "甲" and notes[1]["user_nickname"] == "乙"


def test_nested_markup_detail_first_floor():
    """p_postlist nests divs (tail wrap, body) — the first-floor capture
    must span them so author fields resolve; l_reply_num li holds spans."""
    page = (
        "<html><head><title>帖 题【吧y】_百度贴吧</title>"
        '<meta name="description" content="描述"></head><body>'
        '<a class="card_title_fname" href="/f?kw=吧y">吧y</a>'
        '<a id="lzonly_cntn" href="/p/t9?see_lz=1">只看楼主</a>'
        '<div class="p_postlist">'
        '<div class="d_post_content">正文 <div class="inner">嵌套</div> 尾</div>'
        '<a class="p_author_face " href="/home/main?id=u9"><img src="https://img/u9.png"></a>'
        '<a class="p_author_name j_user_card" href="#">作者九</a>'
        '<div class="post-tail-wrap"><span class="tail-info">IP属地:北京</span>'
        '<span class="tail-info">2024-03-05 12:30</span></div>'
        "</div>"
        '<div id="thread_theme_5"><li class="l_reply_num"><span class="red">37</span>'
        '<span class="red">4</span></li></div></body></html>'
    )
    note = T.extract_note_detail(page)
    assert note["note_id"] == "t9"
    assert note["title"] == "帖 题"  # suffix stripped
    # with the old '<div class="p_postlist">(.*?)</div>' capture the first
    # nested </div> (inside d_post_content) cut the floor before the author
    assert note["user_nickname"] == "作者九"
    assert note["user_link"].endswith("/home/main?id=u9")
    assert note["ip_location"] == "北京" and note["publish_time"] == "2024-03-05 12:30"
    assert note["total_replay_num"] == "37" and note["total_replay_page"] == "4"


def test_nested_markup_search_desc():
    page = (
        '<div class="s_post"><span class="p_title">'
        '<a data-tid="77" href="/p/77">题</a></span>'
        '<div class="p_content">甲 <div class="x">乙</div> 丙</div>'
        '<a href="/home/main?un=n"><font>n</font></a>'
        '<a class="p_forum" href="/f?kw=吧"><font>吧</font></a>'
        '<font class="p_green p_date">2024-01-01 00:00</font></div>'
    )
    notes = T.extract_search_note_list(page)
    assert notes[0]["desc"] == '甲 <div class="x">乙</div> 丙'


def test_nested_markup_sub_comment_content():
    """lzl_content_main nesting a span must be captured whole; the kernel
    then strips tags byte-identically."""
    page = (
        '<ul><li class="lzl_single_post j_lzl_s_p first_no_border" '
        'data-field="{&quot;spid&quot;:&quot;s1&quot;,&quot;showname&quot;:&quot;丙&quot;}">'
        '<a class="j_user_card lzl_p_p" href="/home/main?id=u3"><img src="https://img/u3.png"></a>'
        '<span class="lzl_content_main">回复 <span class="at">@楼主</span> 内容</span>'
        '<span class="lzl_time">2024-02-02 02:02</span></li></ul>'
    )
    subs = T.extract_note_sub_comments(page, {"comment_id": "c0", "note_id": "t1",
                                              "note_url": None, "tieba_id": None,
                                              "tieba_name": None, "tieba_link": None})
    assert subs[0]["comment_id"] == "s1"
    assert subs[0]["content"] == "回复 @楼主 内容"
    assert subs[0]["publish_time"] == "2024-02-02 02:02"


def test_thread_page_composite_extractor():
    """extract_thread_page = detail + that page's parent comments in one
    pass (the in-loop S10 UDF shape)."""
    comment = (
        '<div class="l_post l_post_bright j_l_post clearfix  " data-field="'
        "{&quot;content&quot;:{&quot;post_id&quot;:&quot;t9c0&quot;,&quot;comment_num&quot;:12,"
        "&quot;content&quot;:&quot;&lt;b&gt;一楼&lt;/b&gt; 回&quot;,&quot;forum_id&quot;:&quot;f1&quot;}}"
        '"><a class="p_author_face " href="/home/main?id=u5"><img src="https://img/u5.png"></a>'
        '<a class="p_author_name j_user_card" href="#">评论者</a>'
        '<div class="post-tail-wrap"><span class="tail-info">IP属地:上海</span>'
        '<span class="tail-info">2024-03-06 09:00</span></div></div>'
    )
    page = (
        "<html><head><title>题【吧z】_百度贴吧</title>"
        '<meta name="description" content="d"></head><body>'
        '<a class="card_title_fname" href="/f?kw=吧z">吧z</a>'
        '<a id="lzonly_cntn" href="/p/t9?see_lz=1">只看楼主</a>'
        '<div class="p_postlist">'
        '<a class="p_author_face " href="/home/main?id=u9"><img src="https://img/u9.png"></a>'
        '<a class="p_author_name j_user_card" href="#">楼主</a>'
        '<div class="post-tail-wrap"><span class="tail-info">IP属地:北京</span>'
        '<span class="tail-info">2024-03-05 12:30</span></div>'
        + comment +
        '</div><div id="thread_theme_5"><li class="l_reply_num">'
        '<span class="red">12</span><span class="red">2</span></li></div></body></html>'
    )
    out = T.extract_thread_page(page, "t9")
    assert out["note"]["note_id"] == "t9"
    assert out["note"]["user_nickname"] == "楼主"
    # the note's ip/pub-time = FIRST tail wrap on the page (the floor's)
    assert out["note"]["ip_location"] == "北京"
    cms = out["comments"]
    assert len(cms) == 1
    assert cms[0]["comment_id"] == "t9c0"
    assert cms[0]["sub_comment_count"] == 12
    assert cms[0]["content"] == "一楼 回"      # kernel strips the <b> tags
    assert cms[0]["ip_location"] == "上海"     # its own tail wrap, not the floor's
    assert cms[0]["note_id"] == "t9"
