"""Tieba-shaped HTML fixtures for the E2 extractor surface.

The reference's extractor tests read golden files that are absent from the
repo (`test_data/*.html` → `.MISSING_LARGE_BLOBS`, tieba/help.py:359-418),
so equivalents are synthesized here — six page shapes carrying the exact
structural markers the reference xpaths anchor on (`s_post`, `thread_list`
+ `data-field`, `p_postlist`/`l_reply_num`/`post-tail-wrap`,
`l_post l_post_bright j_l_post clearfix  `, `lzl_single_post j_lzl_s_p`,
`userinfo_userdata`/`concern_num`), generated entirely with native column
expressions from the driver `documents` table (deterministic, distributed,
no wall clock).

Branch coverage on purpose: html-escaped ``data-field`` JSON whose content
embeds tags + entities (unescape→json.loads→text-kernel path), the
``【{tieba_name}】_百度贴吧`` title suffix (strip branch), ``<!--`` comment
noise in the forum list (strip branch), IP/pub-time ``tail-info`` spans
(E17 regex branch), ``sex_male``/``sex_female`` gender markers, and
``concern_num`` follows/fans spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS = "2024-03-05 12:3"  # + (doc_id%10) → a valid tail-info timestamp


def _b(documents: DataFrame) -> DataFrame:
    d = documents.select("doc_id", "text")
    return d.select(
        "doc_id",
        "text",
        F.concat(F.lit("t"), F.col("doc_id").cast("string")).alias("tid"),
        F.concat(F.lit("题目"), F.col("doc_id").cast("string")).alias("title"),
        F.concat(F.lit("作者"), F.pmod(F.col("doc_id"), F.lit(101)).cast("string")).alias("nick"),
        F.concat(F.lit("u"), F.pmod(F.col("doc_id"), F.lit(101)).cast("string")).alias("uid"),
        F.concat(F.lit("吧"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")).alias("forum"),
        F.concat(F.lit(_TS), F.pmod(F.col("doc_id"), F.lit(10)).cast("string")).alias("ts"),
        F.element_at(
            F.array(F.lit("北京"), F.lit("上海"), F.lit("广东"), F.lit("浙江")),
            (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("int"),
        ).alias("ip"),
        # abstract lands inside attribute values and element text — keep it
        # free of HTML-significant characters (documents.text is word-soup,
        # but stay defensive)
        F.substring(F.regexp_replace(F.col("text"), '["<>&]', ""), 1, 40).alias("abstract"),
    )


def _spost_block(tid, title, abstract, nick, forum, ts):
    return F.concat(
        F.lit('<div class="s_post"><span class="p_title"><a data-tid="'), tid,
        F.lit('" href="/p/'), tid, F.lit('">'), title,
        F.lit('</a></span><div class="p_content">'), abstract,
        F.lit('</div><a href="/home/main?un='), nick, F.lit("&id="), tid,
        F.lit('"><font>'), nick,
        F.lit('</font></a><a class="p_forum" href="/f?kw='), forum,
        F.lit('"><font>'), forum,
        F.lit('</font></a><font class="p_green p_date">'), ts,
        F.lit("</font></div>"),
    )


def build_search_fixture_pages(documents: DataFrame) -> DataFrame:
    """One keyword-search result page per doc with two s_post blocks."""
    b = _b(documents)
    blk1 = _spost_block(F.col("tid"), F.col("title"), F.col("abstract"),
                        F.col("nick"), F.col("forum"), F.col("ts"))
    blk2 = _spost_block(
        F.concat(F.col("tid"), F.lit("b")), F.concat(F.col("title"), F.lit("-b")),
        F.concat(F.lit("第二帖 "), F.col("abstract")), F.concat(F.col("nick"), F.lit("乙")),
        F.col("forum"), F.col("ts"),
    )
    html = F.concat(F.lit("<html><body>"), blk1, blk2, F.lit("</body></html>"))
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/f/search/res?qw=q"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "title", "abstract", "nick", "forum", "ts",
    )


def _datafield_note(tid, nick, reply_num):
    # html-escaped data-field JSON: {"id":<tid>,"author_name":"<nick>","reply_num":N}
    return F.concat(
        F.lit("{&quot;id&quot;:&quot;"), tid,
        F.lit("&quot;,&quot;author_name&quot;:&quot;"), nick,
        F.lit("&quot;,&quot;reply_num&quot;:"), reply_num.cast("string"), F.lit("}"),
    )


def build_forum_list_fixture_pages(documents: DataFrame) -> DataFrame:
    """Forum thread-list page: ul#thread_list with data-field li rows +
    `<!--` comment noise (the reference strips it, help.py:73)."""
    b = _b(documents)
    li1 = F.concat(
        F.lit('<li data-field="'), _datafield_note(F.col("tid"), F.col("nick"), F.pmod(F.col("doc_id"), F.lit(50))),
        F.lit('"><a class="j_th_tit " href="/p/'), F.col("tid"), F.lit('">'), F.col("title"),
        F.lit('</a><div class="threadlist_abs threadlist_abs_onlyline "> '), F.col("abstract"),
        F.lit(' </div><a class="frs-author-name j_user_card " href="/home/main?id='), F.col("uid"),
        F.lit('">'), F.col("nick"), F.lit("</a></li>"),
    )
    li2 = F.concat(
        F.lit('<li data-field="'),
        _datafield_note(F.concat(F.col("tid"), F.lit("b")), F.concat(F.col("nick"), F.lit("乙")), F.lit(7)),
        F.lit('"><a class="j_th_tit " href="/p/'), F.col("tid"), F.lit('b">'), F.col("title"),
        F.lit('-b</a><div class="threadlist_abs threadlist_abs_onlyline ">次帖</div>'),
        F.lit('<a class="frs-author-name j_user_card " href="/home/main?id='), F.col("uid"),
        F.lit('b">'), F.col("nick"), F.lit("乙</a></li>"),
    )
    html = F.concat(
        F.lit('<html><body><!--<li data-field="{}">ghost</li>-->'),
        F.lit('<a class="card_title_fname" href="/f?kw='), F.col("forum"), F.lit('">'),
        F.col("forum"), F.lit("</a>"),
        F.lit('<ul id="thread_list">'), li1, F.lit("<!--noise-->"), li2, F.lit("</ul></body></html>"),
    )
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/f?kw=forum"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "title", "abstract", "nick", "uid", "forum",
    )


def _tail_wrap(ip, ts):
    return F.concat(
        F.lit('<div class="post-tail-wrap"><span class="tail-info">IP属地:'), ip,
        F.lit('</span><span class="tail-info">'), ts, F.lit("</span></div>"),
    )


def build_detail_fixture_pages(documents: DataFrame) -> DataFrame:
    """Thread-detail page incl. the 【{tieba_name}】_百度贴吧 title suffix."""
    b = _b(documents)
    html = F.concat(
        F.lit("<html><head><title>"), F.col("title"),
        F.lit("【"), F.col("forum"), F.lit("】_百度贴吧</title>"),
        F.lit('<meta name="description" content="'), F.col("abstract"), F.lit('"></head><body>'),
        F.lit('<a class="card_title_fname" href="/f?kw='), F.col("forum"), F.lit('">'),
        F.col("forum"), F.lit("</a>"),
        F.lit('<a id="lzonly_cntn" href="/p/'), F.col("tid"), F.lit('?see_lz=1">只看楼主</a>'),
        F.lit('<div class="p_postlist"><a class="p_author_face " href="/home/main?id='), F.col("uid"),
        F.lit('"><img src="https://img.example/'), F.col("uid"), F.lit('.png"></a>'),
        F.lit('<a class="p_author_name j_user_card" href="#">'), F.col("nick"), F.lit("</a></div>"),
        F.lit('<div id="thread_theme_5"><li class="l_reply_num"><span class="red">'),
        F.pmod(F.col("doc_id"), F.lit(300)).cast("string"),
        F.lit('</span><span class="red">'),
        (F.pmod(F.col("doc_id"), F.lit(30)) + 1).cast("string"),
        F.lit("</span></li></div>"),
        _tail_wrap(F.col("ip"), F.col("ts")),
        F.lit("</body></html>"),
    )
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/p/"), F.col("tid")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "title", "abstract", "nick", "uid", "forum", "ip", "ts",
    )


def _datafield_comment(cid, n_sub, forum_idx, content_html_escaped):
    # {"content":{"post_id":"...","comment_num":N,"content":"<escaped html>","forum_id":"f<k>"}}
    return F.concat(
        F.lit("{&quot;content&quot;:{&quot;post_id&quot;:&quot;"), cid,
        F.lit("&quot;,&quot;comment_num&quot;:"), n_sub.cast("string"),
        F.lit(",&quot;content&quot;:&quot;"), content_html_escaped,
        F.lit("&quot;,&quot;forum_id&quot;:&quot;f"), forum_idx.cast("string"),
        F.lit("&quot;}}"),
    )


def build_comments_fixture_pages(documents: DataFrame) -> DataFrame:
    """Thread page with two first-level comment blocks; comment bodies are
    HTML (tags + entity) that must pass through the byte-identical kernel."""
    b = _b(documents)

    def blk(i):
        cid = F.concat(F.col("tid"), F.lit(f"p{i}"))
        # inner html, escaped for the attribute: &lt;div&gt;回复&amp;amp;内容 i&lt;/div&gt;
        # json-level: "<div>回复&amp;内容 i</div>" → kernel strips tags → 回复&amp;内容 i
        content = F.concat(
            F.lit("&lt;div&gt;回复 "), F.col("nick"),
            F.lit(f" &amp;amp; 内容{i} &lt;a href=&#39;#x&#39;&gt;链接&lt;/a&gt;&lt;/div&gt;"),
        )
        return F.concat(
            F.lit('<div class="l_post l_post_bright j_l_post clearfix  " data-field="'),
            _datafield_comment(cid, F.pmod(F.col("doc_id") + F.lit(i), F.lit(4)), F.pmod(F.col("doc_id"), F.lit(5)), content),
            F.lit('"><a class="p_author_face " href="/home/main?id='), F.col("uid"),
            F.lit('"><img src="https://img.example/'), F.col("uid"), F.lit('.png"></a>'),
            F.lit('<a class="p_author_name j_user_card" href="#">'), F.col("nick"), F.lit("</a>"),
            _tail_wrap(F.col("ip"), F.col("ts")),
            F.lit("</div>"),
        )

    html = F.concat(
        F.lit('<html><body><a class="card_title_fname" href="/f?kw='), F.col("forum"),
        F.lit('">'), F.col("forum"), F.lit("</a>"),
        blk(0), blk(1),
        F.lit("</body></html>"),
    )
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/p/"), F.col("tid")).alias("url"),
        F.col("tid").alias("note_id"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "nick", "uid", "forum", "ip", "ts",
    )


def build_subcomments_fixture_pages(documents: DataFrame) -> DataFrame:
    """Sub-comment pane: one first_no_border li + one plain li."""
    b = _b(documents)

    def blk(i, cls):
        sid = F.concat(F.col("tid"), F.lit(f"s{i}"))
        df_json = F.concat(
            F.lit("{&quot;spid&quot;:&quot;"), sid,
            F.lit("&quot;,&quot;showname&quot;:&quot;"), F.col("nick"), F.lit("&quot;}"),
        )
        return F.concat(
            F.lit(f'<li class="{cls}" data-field="'), df_json,
            F.lit('"><a class="j_user_card lzl_p_p" href="/home/main?id='), F.col("uid"),
            F.lit('"><img src="https://img.example/'), F.col("uid"), F.lit('.png"></a>'),
            F.lit('<span class="lzl_content_main">回复 <b>楼主</b>: 子评论'), F.lit(str(i)),
            F.lit('</span><span class="lzl_time">'), F.col("ts"), F.lit("</span></li>"),
        )

    html = F.concat(
        F.lit("<html><body><ul>"),
        blk(0, "lzl_single_post j_lzl_s_p first_no_border"),
        blk(1, "lzl_single_post j_lzl_s_p "),
        F.lit("</ul></body></html>"),
    )
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/p/comment?tid="), F.col("tid")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "nick", "uid", "ts",
    )


def build_creator_fixture_pages(documents: DataFrame) -> DataFrame:
    """Creator home page: space link, userdata (gender marker + ip + 吧龄),
    concern_num spans, new_list thread names."""
    b = _b(documents)
    gender_marker = F.element_at(
        F.array(F.lit("sex_male"), F.lit("sex_female"), F.lit("sex_none")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    html = F.concat(
        F.lit('<html><body><div class="userinfo_left_head"><img src="https://img.example/'),
        F.col("uid"), F.lit('.png"></div>'),
        F.lit('<p class="space"><a href="/home/main?un='), F.col("nick"),
        F.lit("&id="), F.col("uid"), F.lit('&fr=home">主页</a></p>'),
        F.lit('<span class="userinfo_username ">'), F.col("nick"), F.lit("</span>"),
        # newlines between spans: the reference's greedy `吧龄:(\S+)</span>`
        # pattern relies on whitespace separating spans, as real pages have
        F.lit('<div class="userinfo_userdata"><span class="'), gender_marker,
        F.lit('"></span>\n<span>吧龄:'),
        (F.pmod(F.col("doc_id"), F.lit(15)) + 1).cast("string"), F.lit(".5年</span>\n"),
        F.lit("<span>IP属地:"), F.col("ip"), F.lit("</span></div>"),
        F.lit('<span class="concern_num">(<a href="#">'),
        F.pmod(F.col("doc_id"), F.lit(500)).cast("string"), F.lit("</a>)</span>"),
        F.lit('<span class="concern_num">(<a href="#">'),
        F.pmod(F.col("doc_id") * 3, F.lit(9000)).cast("string"), F.lit("</a>)</span>"),
        F.lit('<ul class="new_list clearfix"><div class="thread_name"><a href="/p/'),
        F.col("tid"), F.lit('?pn=1">帖1</a></div><div class="thread_name"><a href="/p/'),
        F.col("tid"), F.lit('b">帖2</a></div></ul>'),
        F.lit("</body></html>"),
    )
    return b.select(
        F.concat(F.lit("https://tieba.baidu.com/home/main?id="), F.col("uid")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        "doc_id", "tid", "nick", "uid", "ip",
    )
