"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

The reference ships golden HTML fixtures for its extractor tests that are
absent from the repo (media_platform/tieba/help.py:359-418 reads
``test_data/*.html`` which is `.MISSING_LARGE_BLOBS`), so we synthesize
equivalents. Pages are derived **entirely from the driver-provided
``documents`` table** with native column expressions — no wall clock, no
randomness, no collect — so generation itself distributes: the same code
produces a 10^10-row corpus on a cluster by pointing it at a bigger
documents table.

Corpus shape (FIXTURES.md §1/§4):

- one *content page* per document, on a per-platform host with Zipf-ish
  host skew (hot hosts get ~50% of URLs) so politeness windows and skew
  salting have real work;
- *comment pages* per content page (``/api/comments/<note_id>?cursor=k``)
  whose body is an xhs-shaped JSON cursor page
  (media_platform/xhs/client.py:325-368 semantics: cursor + has_more);
  a small fraction of notes are "viral" (200 comments → 20 cursor pages)
  to exercise hot-key expansion (SURVEY §7 hot-host skew);
- *sub-comment pages* for comments with sub_comment_count>0 (the J3
  two-level thread, schema/tables.sql parent_comment_id adjacency);
- content html embeds platform-shaped state blobs
  (``window.__INITIAL_STATE__`` with ``:undefined`` tokens for xhs,
  ``var $render_data = [..][0]`` for weibo, ``js-initialData`` script for
  zhihu, escaped ``data-field`` JSON attributes for tieba) plus
  script/style noise so the byte-identical text kernel is exercised on
  every page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediacrawler_spark.functions.text import extract_text_udf

PLATFORMS = ["xhs", "tieba", "weibo", "zhihu", "douyin", "kuaishou", "bilibili"]

# epoch seconds for 2025-01-01T00:00:00Z — fixed origin, no wall clock.
_TS0 = 1735689600


def _base(documents: DataFrame) -> DataFrame:
    """Shared deterministic attributes per document."""
    d = documents.select("doc_id", "text", "lang")
    plat = F.element_at(
        F.array(*[F.lit(p) for p in PLATFORMS]),
        (F.pmod(F.col("doc_id"), F.lit(len(PLATFORMS))) + 1).cast("int"),
    )
    hr = F.pmod(F.xxhash64(F.lit("host"), F.col("doc_id")), F.lit(16))
    host_idx = (
        F.when(hr < 8, 0).when(hr < 12, 1).when(hr < 14, 2).otherwise(3)
    )
    host = F.concat(F.lit("h"), host_idx.cast("string"), F.lit("."), plat, F.lit(".example"))
    note_id = F.concat(F.lit("n"), F.col("doc_id").cast("string"))
    # viral notes (~1%) get 200 comments; normal notes 0..24.
    n_comments = F.when(
        F.pmod(F.col("doc_id"), F.lit(97)) == 0, F.lit(200)
    ).otherwise(F.pmod(F.xxhash64(F.lit("nc"), F.col("doc_id")), F.lit(25)).cast("int"))
    warc_ts = F.timestamp_seconds(
        F.lit(_TS0) + F.pmod(F.col("doc_id"), F.lit(365)) * 86400
    )
    return d.select(
        "doc_id",
        "text",
        "lang",
        plat.alias("platform"),
        host.alias("host"),
        note_id.alias("note_id"),
        n_comments.alias("n_comments"),
        warc_ts.alias("warc_ts"),
        F.concat(F.lit("user"), F.pmod(F.col("doc_id"), F.lit(101)).cast("string")).alias("user_id"),
        F.concat(F.lit("作者"), F.pmod(F.col("doc_id"), F.lit(101)).cast("string")).alias("nickname"),
        # platform count-strings ("1.2万" style) — parsed by E7 at extraction.
        F.element_at(
            F.array(F.lit("328"), F.lit("1.2万"), F.lit("10万+"), F.lit(""), F.lit("5678")),
            (F.pmod(F.xxhash64(F.lit("lk"), F.col("doc_id")), F.lit(5)) + 1).cast("int"),
        ).alias("liked_count"),
        (F.lit(_TS0).cast("long") * 1000 + F.col("doc_id").cast("long") * 1000).alias("create_ms"),
    )


def _json_escape(c):
    # documents.text is word-soup, but stay defensive: escape \ and ".
    return F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r'\"')


def _zhihu_type(doc_id) -> F.Column:
    """Zhihu content comes in three URL types (S12, judge_zhihu_url:
    zhihu/help.py:448-467): answer / article / zvideo."""
    return F.element_at(
        F.array(F.lit("answer"), F.lit("article"), F.lit("zvideo")),
        (F.pmod(doc_id, F.lit(3)) + 1).cast("int"),
    )


def _content_url(b: DataFrame) -> F.Column:
    zt = _zhihu_type(F.col("doc_id"))
    zhihu_path = (
        F.when(zt == "answer", F.concat(F.lit("/question/q1/answer/"), F.col("note_id")))
        .when(zt == "article", F.concat(F.lit("/p/"), F.col("note_id")))
        .otherwise(F.concat(F.lit("/zvideo/"), F.col("note_id")))
    )
    path = F.when(F.col("platform") == "xhs", F.concat(F.lit("/explore/"), F.col("note_id"),
                  F.lit("?xsec_token=tok"), F.col("doc_id").cast("string"), F.lit("&xsec_source=pc_search"))) \
        .when(F.col("platform") == "tieba", F.concat(F.lit("/p/"), F.col("note_id"))) \
        .when(F.col("platform") == "weibo", F.concat(F.lit("/detail/"), F.col("note_id"))) \
        .when(F.col("platform") == "zhihu", zhihu_path) \
        .otherwise(F.concat(F.lit("/video/"), F.col("note_id")))
    return F.concat(F.lit("https://"), F.col("host"), path)


def _state_json(b: DataFrame) -> F.Column:
    """Platform-shaped state blob embedded in the content page html."""
    esc = _json_escape(F.col("text"))
    title = F.concat(F.lit("title-"), F.col("note_id"))
    common = F.concat(
        F.lit('{"note_id":"'), F.col("note_id"),
        F.lit('","title":"'), title,
        F.lit('","desc":"'), esc,
        F.lit('","user":{"userId":"'), F.col("user_id"),
        F.lit('","nickname":"'), F.col("nickname"),
        F.lit('"},"interactInfo":{"likedCount":"'), F.col("liked_count"),
        F.lit('"},"time":'), F.col("create_ms").cast("string"),
        F.lit(',"videoUrl":undefined}'),
    )
    return common


# --- tieba thread-page HTML (S6/S10 surface: the corpus pages the real
# extractors parse in-loop; markers per media_platform/tieba/help.py) ------

def _tb_ip():
    return F.element_at(
        F.array(F.lit("北京"), F.lit("上海"), F.lit("广东"), F.lit("浙江")),
        (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
    )


def _tb_ts():
    return F.concat(F.lit("2024-03-05 12:3"), F.pmod(F.col("doc_id"), F.lit(10)).cast("string"))


def _tb_forum():
    return F.concat(F.lit("吧"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string"))


def _tb_sub_n(i):
    """Sub-comment count per parent: every 5th has 12 (two sub pages), every
    7th-but-not-5th has 10 (exercises the reference's count//10+1 quirk —
    a second, EMPTY sub page), else 0."""
    return (
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit(12))
        .when(F.pmod(i, F.lit(7)) == 3, F.lit(10))
        .otherwise(F.lit(0))
    )


def _tb_comment_block(i):
    """One l_post parent-comment block; the data-field content is HTML
    (escaped twice: attribute-level entities, tags inside the JSON string)
    so the byte-identical kernel has real work."""
    cid = F.concat(F.col("note_id"), F.lit("c"), i.cast("string"))
    datafield = F.concat(
        F.lit("{&quot;content&quot;:{&quot;post_id&quot;:&quot;"), cid,
        F.lit("&quot;,&quot;comment_num&quot;:"), _tb_sub_n(i).cast("string"),
        F.lit(",&quot;content&quot;:&quot;&lt;b&gt;回复 "), i.cast("string"),
        F.lit("&lt;/b&gt; on "), F.col("note_id"),
        F.lit("&quot;,&quot;forum_id&quot;:&quot;f1&quot;}}"),
    )
    return F.concat(
        F.lit('<div class="l_post l_post_bright j_l_post clearfix  " data-field="'), datafield,
        F.lit('"><a class="p_author_face " href="/home/main?id='), F.col("user_id"),
        F.lit('"><img src="https://img.example/'), F.col("user_id"), F.lit('.png"></a>'),
        F.lit('<a class="p_author_name j_user_card" href="#">'), F.col("nickname"), F.lit("</a>"),
        F.lit('<div class="post-tail-wrap"><span class="tail-info">IP属地:'), _tb_ip(),
        F.lit('</span><span class="tail-info">'), _tb_ts(), F.lit("</span></div></div>"),
    )


def _tb_thread_html(start, count_on_page):
    """Thread page (detail or ?pn reply page): full detail markers + that
    page's l_post comment blocks INSIDE p_postlist — the nested-div layout
    real tieba has, which the balanced-tag captures must survive."""
    n_pages = F.greatest(F.ceil(F.col("n_comments") / 10).cast("int"), F.lit(1))
    blocks = F.when(
        count_on_page > 0,
        F.array_join(
            F.transform(F.sequence(start, start + count_on_page - 1), _tb_comment_block), ""
        ),
    ).otherwise(F.lit(""))
    desc = F.substring(F.regexp_replace(F.col("text"), '["<>&]', ""), 1, 40)
    return F.concat(
        F.lit("<html><head><title>title-"), F.col("note_id"),
        F.lit("【"), _tb_forum(), F.lit("】_百度贴吧</title>"),
        F.lit('<meta name="description" content="'), desc, F.lit('"></head><body>'),
        F.lit('<a class="card_title_fname" href="/f?kw='), _tb_forum(), F.lit('">'),
        _tb_forum(), F.lit("</a>"),
        F.lit('<a id="lzonly_cntn" href="/p/'), F.col("note_id"), F.lit('?see_lz=1">只看楼主</a>'),
        F.lit('<div class="p_postlist">'),
        F.lit('<a class="p_author_face " href="/home/main?id='), F.col("user_id"),
        F.lit('"><img src="https://img.example/'), F.col("user_id"), F.lit('.png"></a>'),
        F.lit('<a class="p_author_name j_user_card" href="#">'), F.col("nickname"), F.lit("</a>"),
        F.lit('<div class="post-tail-wrap"><span class="tail-info">IP属地:'), _tb_ip(),
        F.lit('</span><span class="tail-info">'), _tb_ts(), F.lit("</span></div>"),
        # nested div inside the floor body: the old non-greedy captures
        # would truncate p_postlist here
        F.lit('<div class="d_post_content">正文 <div class="inner">'), desc,
        F.lit("</div> 结尾</div>"),
        blocks,
        F.lit("</div>"),
        F.lit('<div id="thread_theme_5"><li class="l_reply_num"><span class="red">'),
        F.col("n_comments").cast("string"),
        F.lit('</span><span class="red">'), n_pages.cast("string"),
        F.lit("</span></li></div></body></html>"),
    )


def build_content_pages(documents: DataFrame) -> DataFrame:
    b = _base(documents)
    state = _state_json(b)
    # xhs S9 composition (xhs/core.py:272-283 get_note_detail_async_task):
    # the API (/api/sns/web/v1/feed → items[0].note_card) is the primary
    # path; for a deterministic subset the API comes back EMPTY (the
    # reference's "爬取频繁" case, client.py:263-265 returns dict()) and the
    # note resolves ONLY via the HTML __INITIAL_STATE__ fallback
    # (client.py:535-592: note.noteDetailMap[note_id].note, camelCase keys,
    # :undefined tokens).
    xhs_api_empty = F.pmod(F.col("doc_id"), F.lit(11)) == 4
    xhs_api = F.concat(
        F.lit('<script id="api-json" type="application/json">'),
        F.when(xhs_api_empty, F.lit("{}")).otherwise(
            F.concat(F.lit('{"items":[{"note_card":'),
                     F.regexp_replace(state, ":undefined", ":null"),
                     F.lit("}]}")),
        ),
        F.lit("</script>"),
    )
    xhs_fb = F.when(
        xhs_api_empty,
        F.concat(
            F.lit('<script>window.__INITIAL_STATE__={"note":{"noteDetailMap":{"'),
            F.col("note_id"), F.lit('":{"note":'), state,
            F.lit("}}}}</script>"),
        ),
    ).otherwise(F.lit(""))
    embed = (
        F.when(F.col("platform") == "xhs", F.concat(xhs_api, xhs_fb))
        .when(F.col("platform") == "weibo",
              F.concat(F.lit("<script>var $render_data = ["), state, F.lit("][0] || {};</script>")))
        .when(F.col("platform") == "zhihu",
              # entity map keyed by the content type the URL dispatches to
              # (answers / articles / zvideos — zhihu/help.py:364-445)
              F.concat(F.lit('<script id="js-initialData" type="text/json">{"initialState":{"entities":{"'),
                       F.element_at(
                           F.array(F.lit("answers"), F.lit("articles"), F.lit("zvideos")),
                           (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
                       ),
                       F.lit('":{"'),
                       F.col("note_id"), F.lit('":'),
                       F.regexp_replace(state, ":undefined", ":null"), F.lit("}}}}</script>")))
        .otherwise(  # douyin / kuaishou / bilibili: API-JSON page body
            F.concat(F.lit('<script id="api-json" type="application/json">'),
                     F.regexp_replace(state, ":undefined", ":null"), F.lit("</script>")))
    )
    generic_html = F.concat(
        F.lit("<html><head><title>"), F.concat(F.lit("title-"), F.col("note_id")),
        F.lit("</title><style type=text/css>\n body { color: #333; }\n</style></head><body>"),
        embed,
        F.lit('<script src="app.js">\nvar x = "<div>not text</div>";\n</script>'),
        F.lit('<h1 class="title">'), F.concat(F.lit("title-"), F.col("note_id")), F.lit("</h1>"),
        F.lit('<span class="author" data-uid="'), F.col("user_id"), F.lit('">'),
        F.col("nickname"), F.lit("</span>"),
        F.lit('<span class="liked">'), F.col("liked_count"), F.lit("</span>"),
        F.lit('<div class="content"> '), F.col("text"), F.lit(" </div>"),
        F.lit('<div class="stats">comments:'), F.col("n_comments").cast("string"), F.lit("</div>"),
        F.lit("</body></html>"),
    )
    # tieba content = a REAL thread-detail page (S10): page 1 carries the
    # first ≤10 parent comments; ?pn=2.. reply pages hold the rest
    tb_count = F.least(F.lit(10), F.col("n_comments"))
    html_str = F.when(
        F.col("platform") == "tieba", _tb_thread_html(F.lit(0), tb_count)
    ).otherwise(generic_html)
    return b.select(
        _content_url(b).alias("url"),
        "warc_ts",
        F.encode(html_str, "UTF-8").alias("html"),
        "lang",
        F.lit("content").alias("kind"),
        "platform", "host", "note_id", "doc_id", "n_comments",
    )


def build_tieba_reply_pages(documents: DataFrame) -> DataFrame:
    """?pn=2..total_replay_page thread reply pages (tieba comment walk)."""
    b = _base(documents).filter(
        (F.col("platform") == "tieba") & (F.col("n_comments") > 10)
    )
    n_pages = F.ceil(F.col("n_comments") / 10).cast("int")
    pages = b.select(
        "*", F.explode(F.sequence(F.lit(2), n_pages)).alias("pn")
    )
    start = (F.col("pn") - 1) * 10
    cnt = F.least(F.lit(10), F.col("n_comments") - start)
    url = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/p/"), F.col("note_id"),
        F.lit("?pn="), F.col("pn").cast("string"),
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(_tb_thread_html(start, cnt), "UTF-8").alias("html"),
        "lang",
        F.lit("comments").alias("kind"),
        "platform", "host", "note_id", "doc_id", "n_comments",
    )


def build_tieba_sub_pages(documents: DataFrame) -> DataFrame:
    """Sub-comment panes /p/comment?tid&pid&pn (reference pages them
    pn=1..comment_num//10+1, tieba/client.py:237-285)."""
    b = _base(documents).filter(
        (F.col("platform") == "tieba") & (F.col("n_comments") > 0)
    )
    parents = b.select(
        "*",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_comments") - 1),
                lambda i: (F.pmod(i, F.lit(5)) == 0) | (F.pmod(i, F.lit(7)) == 3),
            )
        ).alias("parent_idx"),
    ).withColumn(
        "parent_id",
        F.concat(F.col("note_id"), F.lit("c"), F.col("parent_idx").cast("string")),
    ).withColumn("sub_n", _tb_sub_n(F.col("parent_idx")))
    n_sub_pages = (F.floor(F.col("sub_n") / 10) + 1).cast("int")
    pages = parents.select(
        "*", F.explode(F.sequence(F.lit(1), n_sub_pages)).alias("pn")
    )
    start = (F.col("pn") - 1) * 10
    cnt = F.greatest(F.least(F.lit(10), F.col("sub_n") - start), F.lit(0))

    def lzl_block(j):
        sid = F.concat(F.col("parent_id"), F.lit("s"), j.cast("string"))
        cls = F.when(j == start, F.lit("lzl_single_post j_lzl_s_p first_no_border"))\
            .otherwise(F.lit("lzl_single_post j_lzl_s_p "))
        datafield = F.concat(
            F.lit("{&quot;spid&quot;:&quot;"), sid,
            F.lit("&quot;,&quot;showname&quot;:&quot;"), F.col("nickname"), F.lit("&quot;}"),
        )
        return F.concat(
            F.lit('<li class="'), cls, F.lit('" data-field="'), datafield,
            F.lit('"><a class="j_user_card lzl_p_p" href="/home/main?id='), F.col("user_id"),
            F.lit('"><img src="https://img.example/'), F.col("user_id"), F.lit('.png"></a>'),
            # nested span: the balanced lzl_content_main capture must keep it
            F.lit('<span class="lzl_content_main">回复 <span class="at">@楼主</span> 子评论 '),
            j.cast("string"),
            F.lit('</span><span class="lzl_time">'), _tb_ts(), F.lit("</span></li>"),
        )

    items = F.when(
        cnt > 0,
        F.array_join(F.transform(F.sequence(start, start + cnt - 1), lzl_block), ""),
    ).otherwise(F.lit(""))
    html = F.concat(F.lit("<html><body><ul>"), items, F.lit("</ul></body></html>"))
    url = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/p/comment?tid="), F.col("note_id"),
        F.lit("&pid="), F.col("parent_id"), F.lit("&pn="), F.col("pn").cast("string"),
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(html, "UTF-8").alias("html"),
        "lang",
        F.lit("subcomments").alias("kind"),
        "platform", "host", "note_id", "doc_id", "n_comments",
    )


def _sub_obj(parent_id, j, create_base):
    """JSON object for one second-level comment (generic shape)."""
    return F.concat(
        F.lit('{"id":"'), parent_id, F.lit("s"), j.cast("string"),
        F.lit('","content":"sub '), j.cast("string"),
        F.lit(" of "), parent_id,
        F.lit('","create_time":'), (create_base + j * 100).cast("string"),
        F.lit(',"sub_comment_count":0}'),
    )


def _comment_obj(note_id, cid_idx, create_base, plat=None):
    """JSON object for one root comment; sub-threads every 5th comment.

    Each platform's parent object carries ITS reference sub-walk trigger
    field (J3): xhs ``sub_comment_has_more``/``sub_comment_cursor``
    (client.py:385-394), douyin ``reply_comment_total`` (client.py:256),
    kuaishou ``subCommentsPcursor`` (client.py:245-248), bilibili
    ``rcount`` (client.py:294), weibo inline ``comments`` — no sub fetch
    at all (weibo/client.py:205-210). zhihu objects are built separately
    (``_zhihu_comment_obj``, trigger = ``child_comment_count``)."""
    cid = F.concat(note_id, F.lit("c"), cid_idx.cast("string"))
    has_sub = F.pmod(cid_idx, F.lit(5)) == 0
    sub_n = F.when(has_sub, F.lit(12)).otherwise(F.lit(0))
    wb_subs = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(2)),
                    lambda j: _sub_obj(cid, j, create_base)),
        ",",
    )
    trigger = F.lit("") if plat is None else (
        F.when(plat == "douyin",
               F.concat(F.lit(',"reply_comment_total":'), sub_n.cast("string")))
        .when(plat == "bilibili",
              F.concat(F.lit(',"rcount":'), sub_n.cast("string")))
        .when(plat == "kuaishou",
              F.concat(F.lit(',"subCommentsPcursor":"'),
                       F.when(has_sub, F.lit("")).otherwise(F.lit("no_more")),
                       F.lit('"')))
        .when(plat == "weibo",
              F.when(has_sub, F.concat(F.lit(',"comments":['), wb_subs, F.lit("]")))
              .otherwise(F.lit("")))
        .otherwise(  # xhs
            F.concat(F.lit(',"sub_comment_has_more":'),
                     has_sub.cast("string"),
                     F.lit(',"sub_comment_cursor":""')))
    )
    return F.concat(
        F.lit('{"id":"'), cid,
        F.lit('","content":"回复 comment '), cid_idx.cast("string"),
        F.lit(' on '), note_id,
        F.lit('","create_time":'), (create_base + cid_idx * 1000).cast("string"),
        F.lit(',"sub_comment_count":'), sub_n.cast("string"),
        trigger, F.lit("}"),
    )


def _zhihu_comment_obj(note_id, i, create_base, parent_id=None):
    """Full reference-shaped zhihu root comment (help.py:232-260 fields):
    HTML content (kernel has work), ip_info comment_tag, member-nested
    author on odd indices, like/dislike counts. With ``parent_id`` the
    object is a CHILD comment (reply_comment_id set, no grandchildren) —
    the reference extracts child pages with the same extractor
    (zhihu/client.py:334-343 → help.py extract_comments)."""
    if parent_id is not None:
        cid = F.concat(parent_id, F.lit("s"), i.cast("string"))
        sub_n = F.lit(0)
        reply = F.concat(F.lit(',"reply_comment_id":"'), parent_id, F.lit('"'))
    else:
        cid = F.concat(note_id, F.lit("c"), i.cast("string"))
        sub_n = F.when(F.pmod(i, F.lit(5)) == 0, F.lit(12)).otherwise(F.lit(0))
        reply = F.lit("")
    k = F.pmod(i, F.lit(101)).cast("string")
    author_plain = F.concat(
        F.lit('{"id":"zu'), k, F.lit('","name":"知友'), k,
        F.lit('","url_token":"ztok'), k,
        F.lit('","avatar_url":"https://pic.zhimg.com/c'), k, F.lit('.png"}'),
    )
    author = F.when(
        F.pmod(i, F.lit(2)) == 1,
        F.concat(F.lit('{"member":'), author_plain, F.lit("}")),
    ).otherwise(author_plain)
    return F.concat(
        F.lit('{"type":"comment","id":"'), cid, F.lit('"'), reply,
        F.lit(',"content":"<p>知乎回复 '), i.cast("string"),
        F.lit(" on "), note_id, F.lit('</p>"'),
        F.lit(',"created_time":'), (create_base + i * 1000).cast("string"),
        F.lit(',"comment_tag":[{"type":"ip_info","text":"IP属地'),
        F.pmod(i, F.lit(4)).cast("string"),
        F.lit('"}],"child_comment_count":'), sub_n.cast("string"),
        F.lit(',"like_count":'), F.pmod(i * 3, F.lit(50)).cast("string"),
        F.lit(',"dislike_count":'), F.pmod(i, F.lit(7)).cast("string"),
        F.lit(',"author":'), author, F.lit("}"),
    )


def build_comment_pages(documents: DataFrame) -> DataFrame:
    """Cursor-paginated root-comment pages, 10 comments per page, with the
    reference-identical per-platform envelope + cursor protocol (J2):

    - xhs       {"has_more","cursor",comments}; opaque cursor = last id
    - douyin    {"has_more":0/1,"cursor":<offset int>,comments}
    - weibo     {"max_id":<int|0>, "data":[...]}       (end: max_id==0)
    - kuaishou  {"visionCommentList":{"pcursor","rootComments"}}
                                                        (end: "no_more")
    - bilibili  {"cursor":{"next","is_end"},"replies":[...]}
    - zhihu     {"paging":{"is_end","next":<url with offset>},"data":[full
                reference comment objects]} — every 3rd page carries a
                leading non-comment item the P5 type filter must drop

    A page's URL token IS the cursor string that requests it, so the
    frontier `cursor` column holds reference-identical values. Tieba is
    excluded here — its comments ride on thread ?pn pages (HTML)."""
    plat = F.col("platform")
    b = _base(documents).filter((F.col("n_comments") > 0) & (plat != "tieba"))
    n_pages = F.ceil(F.col("n_comments") / 10).cast("int")
    pages = b.select(
        "*", F.explode(F.sequence(F.lit(0), n_pages - 1)).alias("cursor_k"), n_pages.alias("n_pages")
    )
    k, n = F.col("cursor_k"), F.col("n_pages")
    start = k * 10
    count_on_page = F.least(F.lit(10), F.col("n_comments") - start)
    items = F.transform(
        F.sequence(start, start + count_on_page - 1),
        lambda i: _comment_obj(F.col("note_id"), i, F.col("create_ms"), plat),
    )
    zitems = F.transform(
        F.sequence(start, start + count_on_page - 1),
        lambda i: _zhihu_comment_obj(F.col("note_id"), i, F.col("create_ms")),
    )
    zlead = F.when(
        F.pmod(k, F.lit(3)) == 0, F.lit('{"type":"sub_header","id":"hdr"},')
    ).otherwise(F.lit(""))
    has_more = k < n - 1
    ilist = F.array_join(items, ",")
    # weibo max_id chain: m(k) = doc_id*1000+k (never 0 for k>=1), 0 at end
    wb_next = F.when(has_more, (F.col("doc_id") * 1000 + k + 1)).otherwise(F.lit(0))
    body = (
        F.when(plat == "douyin", F.concat(
            F.lit('{"has_more":'), has_more.cast("int").cast("string"),
            F.lit(',"cursor":'), ((k + 1) * 10).cast("string"),
            F.lit(',"comments":['), ilist, F.lit("]}")))
        .when(plat == "weibo", F.concat(
            F.lit('{"max_id":'), wb_next.cast("string"),
            F.lit(',"data":['), ilist, F.lit("]}")))
        .when(plat == "kuaishou", F.concat(
            F.lit('{"visionCommentList":{"pcursor":"'),
            F.when(has_more, (k + 1).cast("string")).otherwise(F.lit("no_more")),
            F.lit('","rootComments":['), ilist, F.lit("]}}")))
        .when(plat == "bilibili", F.concat(
            F.lit('{"cursor":{"next":'), (k + 1).cast("string"),
            F.lit(',"is_end":'), (~has_more).cast("string"),
            F.lit('},"replies":['), ilist, F.lit("]}")))
        .when(plat == "zhihu", F.concat(
            F.lit('{"paging":{"is_end":'), (~has_more).cast("string"),
            F.lit(',"next":"https://www.zhihu.com/api/v4/comment_v5/notes/'),
            F.col("note_id"), F.lit("/root_comment?limit=10&offset="),
            ((k + 1) * 10).cast("string"), F.lit('_0_0&order_by=score"},"data":['),
            zlead, F.array_join(zitems, ","), F.lit("]}")))
        .otherwise(F.concat(  # xhs: opaque cursor = id of the page's last comment
            F.lit('{"has_more":'), has_more.cast("string"),
            F.lit(',"cursor":"'), F.col("note_id"), F.lit("c"),
            ((k + 1) * 10 - 1).cast("string"),
            F.lit('","comments":['), ilist, F.lit("]}")))
    )
    # URL token = the cursor string the reference client would send for
    # page k (initial cursors per initial_comment_cursor_col)
    addr = (
        F.when(plat == "douyin", (k * 10).cast("string"))
        .when(plat == "weibo",
              F.when(k == 0, F.lit("-1")).otherwise((F.col("doc_id") * 1000 + k).cast("string")))
        .when(plat == "kuaishou", F.when(k == 0, F.lit("")).otherwise(k.cast("string")))
        .when(plat == "bilibili", k.cast("string"))
        .when(plat == "zhihu",
              F.when(k == 0, F.lit("")).otherwise(F.concat((k * 10).cast("string"), F.lit("_0_0"))))
        .otherwise(F.when(k == 0, F.lit("")).otherwise(
            F.concat(F.col("note_id"), F.lit("c"), (k * 10 - 1).cast("string"))))
    )
    url = F.concat(
        F.lit("https://"), F.col("host"), F.lit("/api/comments/"),
        F.col("note_id"), F.lit("?cursor="), addr,
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        "lang",
        F.lit("comments").alias("kind"),
        "platform", "host", "note_id", "doc_id", "n_comments",
    )


def build_subcomment_pages(documents: DataFrame) -> DataFrame:
    """Second-level thread pages: 12 subs → 2 pages of ≤10, each with ITS
    platform's reference sub-walk envelope + cursor protocol (J3):

    - xhs       {"has_more","cursor":<opaque last-sub id>,comments};
                page 0 addressed by the PARENT's ``sub_comment_cursor``
                ("" in this corpus — client.py:385-407)
    - douyin    {"has_more":0/1,"cursor":<offset int>,comments};
                page k addressed by cursor k*10 (client.py:262-267)
    - kuaishou  {"visionSubCommentList":{"pcursor","subComments"}};
                walk starts at "" and ends at "no_more" (client.py:249-264)
    - bilibili  {"replies":[...],"page":{"count":N}} addressed by ?pn=k
                (1-based); the CLIENT stops when count <= pn*ps
                (client.py:306-337) — no server-side has_more at all
    - zhihu     top-level envelope verbatim ({"paging","data"} with FULL
                child-comment objects, reply_comment_id set) addressed by
                offset tokens (client.py:304-350)
    - weibo     none — weibo subs ride inline on the parent objects
                (weibo/client.py:205-210)

    A page's URL token IS the cursor string the reference client would
    send, so frontier `cursor` values stay reference-identical. Tieba subs
    are real /p/comment HTML panes (build_tieba_sub_pages)."""
    plat = F.col("platform")
    b = _base(documents).filter(
        (F.col("n_comments") > 0) & ~plat.isin("tieba", "weibo")
    )
    parents = b.select(
        "*",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_comments") - 1),
                lambda i: F.pmod(i, F.lit(5)) == 0,
            )
        ).alias("parent_idx"),
    ).withColumn("parent_id", F.concat(F.col("note_id"), F.lit("c"), F.col("parent_idx").cast("string")))
    pages = parents.select("*", F.explode(F.sequence(F.lit(0), F.lit(1))).alias("cursor_k"))
    k = F.col("cursor_k")
    start = k * 10
    count_on_page = F.least(F.lit(10), F.lit(12) - start)
    seq = F.sequence(start, start + count_on_page - 1)
    items = F.transform(seq, lambda i: _sub_obj(F.col("parent_id"), i, F.col("create_ms")))
    zitems = F.transform(
        seq, lambda i: _zhihu_comment_obj(F.col("note_id"), i, F.col("create_ms"),
                                          parent_id=F.col("parent_id")),
    )
    has_more = k < 1
    ilist = F.array_join(items, ",")
    body = (
        F.when(plat == "douyin", F.concat(
            F.lit('{"has_more":'), has_more.cast("int").cast("string"),
            F.lit(',"cursor":'), ((k + 1) * 10).cast("string"),
            F.lit(',"comments":['), ilist, F.lit("]}")))
        .when(plat == "kuaishou", F.concat(
            F.lit('{"visionSubCommentList":{"pcursor":"'),
            F.when(has_more, F.concat(F.lit("sp"), (k + 1).cast("string")))
            .otherwise(F.lit("no_more")),
            F.lit('","subComments":['), ilist, F.lit("]}}")))
        .when(plat == "bilibili", F.concat(
            F.lit('{"replies":['), ilist,
            F.lit('],"page":{"count":12}}')))
        .when(plat == "zhihu", F.concat(
            F.lit('{"paging":{"is_end":'), (~has_more).cast("string"),
            F.lit(',"next":"https://www.zhihu.com/api/v4/comment_v5/comments/'),
            F.col("parent_id"), F.lit("/child_comment?limit=10&offset="),
            ((k + 1) * 10).cast("string"), F.lit('_0_0&order_by=ts"},"data":['),
            F.array_join(zitems, ","), F.lit("]}")))
        .otherwise(F.concat(  # xhs: opaque cursor = id of the page's last sub
            F.lit('{"has_more":'), has_more.cast("string"),
            F.lit(',"cursor":"'), F.col("parent_id"), F.lit("s"),
            ((k + 1) * 10 - 1).cast("string"),
            F.lit('","comments":['), ilist, F.lit("]}")))
    )
    # URL token = the cursor string the reference sub-walk sends for page k
    addr = (
        F.when(plat == "douyin", (k * 10).cast("string"))
        .when(plat == "kuaishou",
              F.when(k == 0, F.lit("")).otherwise(F.concat(F.lit("sp"), k.cast("string"))))
        .when(plat == "zhihu",
              F.when(k == 0, F.lit("")).otherwise(F.concat((k * 10).cast("string"), F.lit("_0_0"))))
        .otherwise(F.when(k == 0, F.lit("")).otherwise(  # xhs
            F.concat(F.col("parent_id"), F.lit("s"), (k * 10 - 1).cast("string"))))
    )
    url = F.when(plat == "bilibili", F.concat(
        F.lit("https://"), F.col("host"), F.lit("/api/subcomments/"),
        F.col("parent_id"), F.lit("?pn="), (k + 1).cast("string"),
    )).otherwise(F.concat(
        F.lit("https://"), F.col("host"), F.lit("/api/subcomments/"),
        F.col("parent_id"), F.lit("?cursor="), addr,
    ))
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        "lang",
        F.lit("subcomments").alias("kind"),
        "platform", "host", "note_id", "doc_id", "n_comments",
    )


def build_search_pages(documents: DataFrame) -> DataFrame:
    """Keyword-search result pages (reference S1–S7: paginated search APIs).

    One page per (platform, keyword, page#): a JSON body listing 10 note
    URLs in deterministic (doc_id) order plus a ``has_more`` flag — the
    engine's search mode walks these exactly like the reference's
    ``get_note_by_keyword`` page loop (media_platform/xhs/core.py:123-147).
    Search pages live on the platform's h0 host.
    """
    from pyspark.sql import Window

    b = _base(documents)
    kw = F.concat(F.lit("kw"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string"))
    w = Window.partitionBy("platform", "_kw").orderBy("doc_id")
    items = (
        b.withColumn("_kw", kw)
        .withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_pg", (F.col("_rn") / 10).cast("int") + 1)
        .withColumn("_note_url", _content_url(b))
    )
    grouped = items.groupBy("platform", "_kw", "_pg").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_rn").alias("rn"), F.col("_note_url").alias("u")))
            ),
            lambda s: s["u"],
        ).alias("_arr"),
        F.count("*").alias("_n"),
        F.min("warc_ts").alias("warc_ts"),
    )
    wmax = Window.partitionBy("platform", "_kw")
    grouped = grouped.withColumn("_maxpg", F.max("_pg").over(wmax))
    has_more = F.col("_pg") < F.col("_maxpg")
    urls_json = F.array_join(
        F.transform(F.col("_arr"), lambda u: F.concat(F.lit('"'), u, F.lit('"'))), ","
    )
    # session_id: the kuaishou searchSessionId carry (kuaishou/core.py:155)
    # — deterministic per (platform, keyword), echoed on every page.
    generic_body = F.concat(
        F.lit('{"has_more":'), has_more.cast("string"),
        F.lit(',"session_id":"ss-'), F.col("platform"), F.lit("-"), F.col("_kw"),
        F.lit('","note_urls":['), urls_json, F.lit("]}"),
    )
    # weibo: the m.weibo.cn card envelope (P2/U3) — every 3rd result is a
    # type-9 member nested in a card_group (with a type-18 noise sibling
    # the filter must drop), the rest are direct type-9 cards; a trailing
    # no-mblog card exercises the mblog-presence gate (weibo/core.py:156-158)
    wb_card = F.transform(
        F.col("_arr"),
        lambda u, i: F.when(
            F.pmod(i, F.lit(3)) == 2,
            F.concat(F.lit('{"card_type":11,"card_group":[{"card_type":18},'
                           '{"card_type":9,"mblog":{"url":"'), u, F.lit('"}}]}')),
        ).otherwise(F.concat(F.lit('{"card_type":9,"mblog":{"url":"'), u, F.lit('"}}'))),
    )
    weibo_body = F.concat(
        F.lit('{"has_more":'), has_more.cast("string"),
        F.lit(',"session_id":"ss-weibo-'), F.col("_kw"),
        F.lit('","cards":['), F.array_join(wb_card, ","),
        F.lit(',{"card_type":9}]}'),
    )
    # tieba: a REAL s_post HTML result list (S6) parsed in-loop by the E2
    # search extractor; hrefs carry full corpus URLs (the extractor's
    # TIEBA_URL prefix is re-based by the synthetic-resolver bridge)
    def _spost(u):
        nid = F.element_at(F.split(F.element_at(F.split(u, r"\?"), 1), "/"), -1)
        return F.concat(
            F.lit('<div class="s_post"><span class="p_title"><a data-tid="'), nid,
            F.lit('" href="'), u, F.lit('">title-'), nid,
            F.lit('</a></span><div class="p_content">摘要 <div class="x">'), nid,
            F.lit('</div> 内容</div><a href="/home/main?un=x"><font>作者</font></a>'),
            F.lit('<a class="p_forum" href="/f?kw=吧"><font>吧</font></a>'),
            F.lit('<font class="p_green p_date">2024-03-05 12:30</font></div>'),
        )

    tieba_body = F.concat(
        F.lit("<html><body>"),
        F.array_join(F.transform(F.col("_arr"), _spost), ""),
        F.when(has_more, F.lit('<a class="next" href="#">下一页</a>')).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    body = (
        F.when(F.col("platform") == "weibo", weibo_body)
        .when(F.col("platform") == "tieba", tieba_body)
        .otherwise(generic_body)
    )
    url = F.concat(
        F.lit("https://h0."), F.col("platform"), F.lit(".example/search/"),
        F.col("_kw"), F.lit("?page="), F.col("_pg").cast("string"),
    )
    return grouped.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("search").alias("kind"),
        "platform",
        F.concat(F.lit("h0."), F.col("platform"), F.lit(".example")).alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def _tieba_creator_agg(documents: DataFrame) -> DataFrame:
    """Per tieba creator: warc_ts/nickname/_min_doc + the ordered note-id
    list of their h0-hosted threads. Only h0 threads are listed (fixture
    bridge: the reference is single-host — tieba.baidu.com — so every
    listed thread is fetchable at the request host; this corpus spreads
    tieba over h0-h3, and a /p/{tid} seed constructed on the creator
    page's host can only resolve for h0-hosted threads)."""
    b = _base(documents).filter(F.col("platform") == "tieba")
    return b.groupBy("user_id").agg(
        F.min("warc_ts").alias("warc_ts"),
        F.min("nickname").alias("nickname"),
        F.min("doc_id").alias("_min_doc"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("host") == "h0.tieba.example",
                        F.struct(F.col("doc_id").alias("d"), F.col("note_id").alias("n")),
                    )
                )
            ),
            lambda s: s["n"],
        ).alias("_tids"),
    )


def build_tieba_creator_pages(documents: DataFrame) -> DataFrame:
    """Tieba creator home pages — REAL HTML through the E2 extractor
    surface (reference: help.py:207-265 extract_creator_info +
    extract_tieba_thread_id_list_from_creator_page). The first ≤10 threads
    ride on the page in a ``new_list clearfix`` ul (the reference's
    "前10个帖子" homepage special case, tieba/client.py:332-360); markers
    match the extractor anchors: space-link id/un params, userinfo_userdata
    (gender marker, IP, 吧龄), two concern_num spans (follows then fans)."""
    creators = _tieba_creator_agg(documents)
    user_name = F.concat(F.lit("un"), F.col("user_id"))
    gender_cls = F.element_at(
        F.array(F.lit("sex_male"), F.lit("sex_female"), F.lit("nosex")),
        (F.pmod(F.col("_min_doc"), F.lit(3)) + 1).cast("int"),
    )
    ip = F.element_at(
        F.array(F.lit("北京"), F.lit("上海"), F.lit("广东"), F.lit("浙江")),
        (F.pmod(F.col("_min_doc"), F.lit(4)) + 1).cast("int"),
    )
    first10 = F.slice(F.col("_tids"), 1, 10)
    # one nested <ul> inside a thread_name block: the balanced new_list
    # capture must not truncate at the inner </ul>
    thread_divs = F.array_join(
        F.transform(
            first10,
            lambda t, i: F.concat(
                F.lit('<li class="new_item"><div class="thread_name"><a href="/p/'), t,
                F.lit('?fr=home" title="t">贴 '), t,
                F.when(i == 0, F.lit('</a><ul class="inner"><li>nested</li></ul>'))
                .otherwise(F.lit("</a>")),
                F.lit("</div></li>"),
            ),
        ),
        "",
    )
    html = F.concat(
        F.lit('<html><body><div class="userinfo_left_head"><img src="https://img.example/'),
        F.col("user_id"), F.lit('.png"></div>'),
        F.lit('<span class="userinfo_username ">'), F.col("nickname"), F.lit("</span>"),
        F.lit('<p class="space"><a href="/home/main?id='), F.col("user_id"),
        F.lit("&un="), user_name, F.lit('">主页</a></p>'),
        F.lit('<div class="userinfo_userdata"><span class="'), gender_cls,
        F.lit('"></span><span class="tail-info">IP属地:'), ip,
        F.lit("</span><span>吧龄:"),
        (F.pmod(F.col("_min_doc"), F.lit(15)) + 1).cast("string"), F.lit("年</span></div>"),
        F.lit('<span class="concern_num">(<a href="#">'),
        F.pmod(F.col("_min_doc"), F.lit(500)).cast("string"), F.lit("</a>)</span>"),
        F.lit('<span class="concern_num">(<a href="#">'),
        F.pmod(F.col("_min_doc") * 7, F.lit(9999)).cast("string"), F.lit("</a>)</span>"),
        F.lit('<ul class="new_list clearfix">'), thread_divs, F.lit("</ul>"),
        F.lit("</body></html>"),
    )
    url = F.concat(F.lit("https://h0.tieba.example/user/"), F.col("user_id"))
    return creators.select(
        url.alias("url"),
        "warc_ts",
        F.encode(html, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("creator").alias("kind"),
        F.lit("tieba").alias("platform"),
        F.lit("h0.tieba.example").alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def build_tieba_getthread_pages(documents: DataFrame) -> DataFrame:
    """Tieba creator-posts API pages (/home/get/getthread?un&pn — the
    reference's get_notes_by_creator walk, tieba/client.py:312-385):
    threads BEYOND the homepage's first 10 (the reference comment: the
    first 10 "通过API获取不到"), 20 per page (page_per_count), JSON
    ``{"no":0,"data":{"has_more",thread_list:[{thread_id}]}}``. pn is
    1-based; pn=1 always exists (the reference probes it unconditionally).
    The reference request also carries ``id=utf-8`` and a ``_`` timestamp
    cache-buster — neither carries pagination state, so URLs here are
    canonicalized to (un, pn)."""
    creators = _tieba_creator_agg(documents)
    rest = F.slice(F.col("_tids"), 11, F.greatest(F.size(F.col("_tids")) - 10, F.lit(0)))
    n_api_pages = F.greatest(F.ceil(F.size(rest) / 20).cast("int"), F.lit(1))
    pages = creators.select(
        "*", rest.alias("_rest"), n_api_pages.alias("_np"),
        F.explode(F.sequence(F.lit(1), n_api_pages)).alias("_pn"),
    )
    start = (F.col("_pn") - 1) * 20
    cnt = F.greatest(F.least(F.lit(20), F.size(F.col("_rest")) - start), F.lit(0))
    items = F.when(cnt > 0, F.array_join(
        F.transform(
            F.slice(F.col("_rest"), start + 1, F.greatest(cnt, F.lit(1))),
            lambda t: F.concat(F.lit('{"thread_id":"'), t, F.lit('"}')),
        ),
        ",",
    )).otherwise(F.lit(""))
    has_more = (F.col("_pn") * 20 < F.size(F.col("_rest"))).cast("int")
    body = F.concat(
        F.lit('{"no":0,"data":{"has_more":'), has_more.cast("string"),
        F.lit(',"thread_list":['), items, F.lit("]}}"),
    )
    url = F.concat(
        F.lit("https://h0.tieba.example/home/get/getthread?un=un"),
        F.col("user_id"), F.lit("&pn="), F.col("_pn").cast("string"),
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("creator_posts").alias("kind"),
        F.lit("tieba").alias("platform"),
        F.lit("h0.tieba.example").alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def build_creator_pages(documents: DataFrame) -> DataFrame:
    """Creator-info pages (reference S13: profile HTML with embedded JSON).

    One page per (platform, user_id) on the platform's h0 host; JSON body
    carries the creator fields the reference normalizes
    (store/xhs/__init__.py:165-211: nickname, gender int, follows/fans
    count-strings). Tieba creators are REAL HTML home pages instead
    (build_tieba_creator_pages — the reference's tieba creator surface is
    HTML all the way down)."""
    b = _base(documents).filter(F.col("platform") != "tieba")
    creators = b.groupBy("platform", "user_id").agg(
        F.min("warc_ts").alias("warc_ts"),
        F.first("nickname").alias("nickname"),
        F.min("doc_id").alias("_min_doc"),
    )
    gender_i = F.pmod(F.col("_min_doc"), F.lit(3))  # 0/1/2 → 男/女/unknown
    fans = F.element_at(
        F.array(F.lit("12"), F.lit("3456"), F.lit("1.8万"), F.lit("10万+")),
        (F.pmod(F.col("_min_doc"), F.lit(4)) + 1).cast("int"),
    )
    body = F.concat(
        F.lit('{"user_id":"'), F.col("user_id"),
        F.lit('","nickname":"'), F.col("nickname"),
        F.lit('","gender":'), gender_i.cast("string"),
        F.lit(',"follows":"'), F.pmod(F.col("_min_doc"), F.lit(500)).cast("string"),
        F.lit('","fans":"'), fans, F.lit('"}'),
    )
    url = F.concat(
        F.lit("https://h0."), F.col("platform"), F.lit(".example/user/"), F.col("user_id")
    )
    return creators.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("creator").alias("kind"),
        "platform",
        F.concat(F.lit("h0."), F.col("platform"), F.lit(".example")).alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def build_creator_posts_pages(documents: DataFrame) -> DataFrame:
    """Creator-posts cursor pages (S14/J4: the reference's
    ``get_all_notes_by_creator`` walk, media_platform/xhs/client.py:473-519:
    cursor + has_more + a notes list per page; per-page callback → detail
    fan-out). One page per (platform, user_id, cursor_k) listing that
    creator's note URLs, 10 per page, in deterministic doc_id order. The
    cursor_k=0 page always exists (the reference probes the first page
    unconditionally). Tieba is excluded — its creator-posts surface is the
    getthread API (build_tieba_getthread_pages)."""
    from pyspark.sql import Window

    b = _base(documents).filter(F.col("platform") != "tieba")
    w = Window.partitionBy("platform", "user_id").orderBy("doc_id")
    items = (
        b.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_pg", (F.col("_rn") / 10).cast("int"))
        .withColumn("_note_url", _content_url(b))
    )
    grouped = items.groupBy("platform", "user_id", "_pg").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rn").alias("rn"), F.col("_note_url").alias("u")))
                ),
                lambda s: F.concat(F.lit('"'), s["u"], F.lit('"')),
            ),
            ",",
        ).alias("_urls"),
        F.min("warc_ts").alias("warc_ts"),
    )
    wmax = Window.partitionBy("platform", "user_id")
    grouped = grouped.withColumn("_maxpg", F.max("_pg").over(wmax))
    body = F.concat(
        F.lit('{"has_more":'), (F.col("_pg") < F.col("_maxpg")).cast("string"),
        F.lit(',"cursor":"'), (F.col("_pg") + 1).cast("string"),
        F.lit('","note_urls":['), F.col("_urls"), F.lit("]}"),
    )
    url = F.concat(
        F.lit("https://h0."), F.col("platform"), F.lit(".example/user/"),
        F.col("user_id"), F.lit("/posts?cursor="), F.col("_pg").cast("string"),
    )
    return grouped.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("creator_posts").alias("kind"),
        "platform",
        F.concat(F.lit("h0."), F.col("platform"), F.lit(".example")).alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def _bili_creators(documents: DataFrame) -> DataFrame:
    b = _base(documents)
    return (
        b.filter(F.col("platform") == "bilibili")
        .groupBy("user_id")
        .agg(F.min("doc_id").alias("_m"), F.min("warc_ts").alias("warc_ts"))
    )


def _contact_pages(creators: DataFrame, edge_kind: str, n_mod: int) -> DataFrame:
    """Paginated relation pages (S15: bilibili/client.py:394-440 — `pn`
    pages of {mid, uname} items; has_more stands in for the reference's
    stop-on-empty-page probe). pn is 1-based (START_CONTACTS_PAGE)."""
    n = F.pmod(F.xxhash64(F.lit(edge_kind), F.col("user_id")), F.lit(n_mod)).cast("int")
    n_pages = F.greatest(F.ceil(n / 10).cast("int"), F.lit(1))
    pages = creators.select(
        "*", n.alias("_n"), n_pages.alias("_np"),
        F.explode(F.sequence(F.lit(0), n_pages - 1)).alias("_pg"),
    )
    start = F.col("_pg") * 10
    cnt = F.greatest(F.least(F.lit(10), F.col("_n") - start), F.lit(0))
    items = F.when(cnt > 0, F.transform(
        F.sequence(start, start + cnt - 1),
        lambda j: F.concat(
            F.lit('{"id":"user'),
            F.pmod(F.col("_m") * 13 + j * 7, F.lit(97)).cast("string"),
            F.lit('","name":"'), F.lit(edge_kind), F.lit("-"), j.cast("string"), F.lit('"}'),
        ),
    )).otherwise(F.array().cast("array<string>"))
    body = F.concat(
        F.lit('{"has_more":'), (F.col("_pg") < F.col("_np") - 1).cast("string"),
        F.lit(',"users":['), F.array_join(items, ","), F.lit("]}"),
    )
    url = F.concat(
        F.lit("https://h0.bilibili.example/user/"), F.col("user_id"),
        F.lit("/"), F.lit(edge_kind), F.lit("?pn="), (F.col("_pg") + 1).cast("string"),
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit(edge_kind).alias("kind"),
        F.lit("bilibili").alias("platform"),
        F.lit("h0.bilibili.example").alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def build_contact_pages(documents: DataFrame) -> DataFrame:
    """Fans + followings relation pages for bilibili creators (S15/J5)."""
    creators = _bili_creators(documents)
    return _contact_pages(creators, "fans", 28).unionByName(
        _contact_pages(creators, "followings", 15)
    )


def build_dynamics_pages(documents: DataFrame) -> DataFrame:
    """Dynamics offset pages for bilibili creators (S16:
    bilibili/client.py:487-546 — offset + has_more + items whose fields
    mirror store/bilibili/__init__.py:165-183)."""
    creators = _bili_creators(documents)
    n = F.pmod(F.xxhash64(F.lit("dyn"), F.col("user_id")), F.lit(22)).cast("int")
    n_pages = F.greatest(F.ceil(n / 10).cast("int"), F.lit(1))
    pages = creators.select(
        "*", n.alias("_n"), n_pages.alias("_np"),
        F.explode(F.sequence(F.lit(0), n_pages - 1)).alias("_pg"),
    )
    start = F.col("_pg") * 10
    cnt = F.greatest(F.least(F.lit(10), F.col("_n") - start), F.lit(0))
    dtype = F.element_at(
        F.array(F.lit("DYNAMIC_TYPE_AV"), F.lit("DYNAMIC_TYPE_DRAW"), F.lit("DYNAMIC_TYPE_WORD")),
        (F.pmod(F.col("_m"), F.lit(3)) + 1).cast("int"),
    )
    items = F.when(cnt > 0, F.transform(
        F.sequence(start, start + cnt - 1),
        lambda i: F.concat(
            F.lit('{"id":"dyn-'), F.col("user_id"), F.lit("-"), i.cast("string"),
            F.lit('","text":"动态 '), i.cast("string"), F.lit(" by "), F.col("user_id"),
            F.lit('","type":"'), dtype,
            F.lit('","pub_ts":'), (F.lit(_TS0) + F.col("_m") * 60 + i).cast("string"),
            F.lit(',"comment_count":'), F.pmod(F.col("_m") + i, F.lit(50)).cast("string"),
            F.lit(',"like_count":'), F.pmod(F.col("_m") * 3 + i, F.lit(900)).cast("string"),
            F.lit("}"),
        ),
    )).otherwise(F.array().cast("array<string>"))
    body = F.concat(
        F.lit('{"has_more":'), (F.col("_pg") < F.col("_np") - 1).cast("string"),
        F.lit(',"offset":"'), (F.col("_pg") + 1).cast("string"),
        F.lit('","items":['), F.array_join(items, ","), F.lit("]}"),
    )
    url = F.concat(
        F.lit("https://h0.bilibili.example/user/"), F.col("user_id"),
        F.lit("/dynamics?offset="), F.col("_pg").cast("string"),
    )
    return pages.select(
        url.alias("url"),
        "warc_ts",
        F.encode(body, "UTF-8").alias("html"),
        F.lit("zh").alias("lang"),
        F.lit("dynamics").alias("kind"),
        F.lit("bilibili").alias("platform"),
        F.lit("h0.bilibili.example").alias("host"),
        F.lit(None).cast("string").alias("note_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(0).alias("n_comments"),
    )


def build_pages(
    spark: SparkSession,
    sf_dir: str,
    with_text: bool = True,
    documents: DataFrame | None = None,
) -> DataFrame:
    """Full pages corpus (input_hint shape + lineage cols), ready to persist.

    ``text`` is produced by the engine's vectorized kernel; tests assert it
    byte-matches the row-wise CPython oracle.
    """
    if documents is None:
        documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # The driver tables are single parquet files (1 input partition): spread
    # generation across the cluster or every downstream scan of the corpus
    # runs 1-3 tasks wide. Hash on doc_id keeps it deterministic.
    n_part = max(spark.sparkContext.defaultParallelism * 2, 8)
    documents = documents.repartition(n_part, "doc_id")
    pages = (
        build_content_pages(documents)
        .unionByName(build_comment_pages(documents))
        .unionByName(build_subcomment_pages(documents))
        .unionByName(build_tieba_reply_pages(documents))
        .unionByName(build_tieba_sub_pages(documents))
        .unionByName(build_search_pages(documents))
        .unionByName(build_creator_pages(documents))
        .unionByName(build_tieba_creator_pages(documents))
        .unionByName(build_tieba_getthread_pages(documents))
        .unionByName(build_creator_posts_pages(documents))
        .unionByName(build_contact_pages(documents))
        .unionByName(build_dynamics_pages(documents))
    )
    if with_text:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    else:
        pages = pages.withColumn("text", F.lit(None).cast("string"))
    return pages.select(
        "url", "warc_ts", "html", "text", "lang",
        "kind", "platform", "host", "note_id", "doc_id", "n_comments",
    )


def build_seeds(
    spark: SparkSession, sf_dir: str, documents: DataFrame | None = None,
    include_malformed: bool = True,
) -> DataFrame:
    """Seed list: every 3rd content URL + a few unknown URLs (miss path).

    ``include_malformed`` adds one scheme-less seed whose retry/backoff
    chain (fails at rounds 0, 2, 6 under MAX_ATTEMPTS=3) pins small crawls
    to ~7 rounds minimum — wanted in tests (null-host scheduling coverage),
    excluded from throughput benchmarks (bench.py passes False)."""
    if documents is None:
        documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = _base(documents).filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    seeds = b.select(
        _content_url(b).alias("url"),
        F.pmod(F.xxhash64(F.lit("prio"), F.col("doc_id")), F.lit(5)).cast("int").alias("priority"),
        F.concat(F.lit("kw"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")).alias("keyword"),
    )
    unknown = spark.range(7).select(
        F.concat(F.lit("https://unknown.example/x"), F.col("id").cast("string")).alias("url"),
        F.lit(0).alias("priority"),
        F.lit(None).cast("string").alias("keyword"),
    )
    seeds = seeds.unionByName(unknown)
    if include_malformed:
        # one malformed seed (no scheme → parse_url host is NULL): exercises
        # the scheduler's null-safe budget key — such rows must still
        # schedule, miss the fetch-join and land in `failed`, never stall
        # 'open' forever
        malformed = spark.range(1).select(
            F.lit("not-a-url").alias("url"),
            F.lit(0).alias("priority"),
            F.lit(None).cast("string").alias("keyword"),
        )
        seeds = seeds.unionByName(malformed)
    return seeds


def build_search_seeds(spark: SparkSession, keywords: list[str] | None = None) -> DataFrame:
    """Search-mode seeds (§3.1 flagship): page 1 of each keyword on every
    platform — the reference's ``KEYWORDS.split(",")`` × platform loop."""
    keywords = keywords or [f"kw{i}" for i in range(5)]
    rows = [
        (f"https://h0.{p}.example/search/{kw}?page=1", 0, kw)
        for p in PLATFORMS
        for kw in keywords
    ]
    return spark.createDataFrame(rows, "url string, priority int, keyword string")


def build_robots(spark: SparkSession) -> DataFrame:
    """Per-host rules: one denied host per platform, tight budget on hot hosts."""
    rows = []
    for p in PLATFORMS:
        for i in range(4):
            rows.append(
                (
                    f"h{i}.{p}.example",
                    i != 3,                      # h3.* robots-denied
                    250 if i == 0 else 50,
                    40 if i == 0 else 200,       # hot host tighter per-round cap
                )
            )
    rows.append(("unknown.example", True, 50, 200))
    return spark.createDataFrame(rows, "host string, allow boolean, crawl_delay_ms long, max_per_round int")
