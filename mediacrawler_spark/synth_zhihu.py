"""Zhihu three-type content fixtures (answer / article / zvideo) shaped
like the reference extractor's input JSON (zhihu/help.py:91-184), generated
with native column expressions from the driver ``documents`` table.

Branch coverage on purpose: answer ``description`` empty → ``excerpt``
fallback; article ``created``/``updated`` (no ``created_time``) fallback;
author ``member`` nesting on odd doc_ids (help.py:199-200); html tags in
content/title so the byte-identical kernel has real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS0 = 1735689600


def _clean(c):
    return F.regexp_replace(c, '["<>&\\\\]', "")


def build_zhihu_fixture_pages(documents: DataFrame) -> DataFrame:
    d = documents.select("doc_id", "text")
    k = F.pmod(F.col("doc_id"), F.lit(101)).cast("string")
    did = F.col("doc_id").cast("string")
    snippet = F.substring(_clean(F.col("text")), 1, 60)
    author_plain = F.concat(
        F.lit('{"id":"u'), k, F.lit('","name":"作者'), k,
        F.lit('","url_token":"tok'), k,
        F.lit('","avatar_url":"https://pic.zhimg.com/av'), k, F.lit('.png"}'),
    )
    # member nesting for odd docs (author blob without a top-level id)
    author = F.when(
        F.pmod(F.col("doc_id"), F.lit(2)) == 1,
        F.concat(F.lit('{"member":'), author_plain, F.lit("}")),
    ).otherwise(author_plain)
    created = (F.lit(_TS0) + F.col("doc_id") * 60).cast("string")
    updated = (F.lit(_TS0) + F.col("doc_id") * 60 + 30).cast("string")
    votes = F.pmod(F.col("doc_id") * 7, F.lit(4000)).cast("string")
    ncom = F.pmod(F.col("doc_id"), F.lit(300)).cast("string")

    t = F.pmod(F.col("doc_id"), F.lit(3))
    answer = F.concat(
        F.lit('{"id":"a'), did, F.lit('","type":"answer","content":"<p>回答正文 '),
        snippet, F.lit('</p><script>var x=1;</script>","question":{"id":"q'),
        F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
        F.lit('"},"title":"<b>问</b> 标题'), did,
        F.lit('","description":"","excerpt":"摘要'), did,
        F.lit('","created_time":'), created, F.lit(',"updated_time":'), updated,
        F.lit(',"voteup_count":'), votes, F.lit(',"comment_count":'), ncom,
        F.lit(',"author":'), author, F.lit("}"),
    )
    article = F.concat(
        F.lit('{"id":"p'), did, F.lit('","type":"article","content":"<p>文章正文 '),
        snippet, F.lit('</p>","title":"文章题'), did,
        F.lit('","excerpt":"文摘'), did,
        F.lit('","created":'), created, F.lit(',"updated":'), updated,
        F.lit(',"voteup_count":'), votes, F.lit(',"comment_count":'), ncom,
        F.lit(',"author":'), author, F.lit("}"),
    )
    zvideo = F.concat(
        F.lit('{"id":"z'), did, F.lit('","type":"zvideo","title":"视频'), did,
        F.lit('","description":"视频描述 '), snippet,
        F.lit('","video_url":"https://www.zhihu.com/zvideo/z'), did,
        F.lit('","created_at":'), created, F.lit(',"updated_at":'), updated,
        F.lit(',"voteup_count":'), votes, F.lit(',"comment_count":'), ncom,
        F.lit(',"author":'), author, F.lit("}"),
    )
    body = F.when(t == 0, answer).when(t == 1, article).otherwise(zvideo)
    url = (
        F.when(t == 0, F.concat(
            F.lit("https://www.zhihu.com/question/q"),
            F.pmod(F.col("doc_id"), F.lit(50)).cast("string"),
            F.lit("/answer/a"), did))
        .when(t == 1, F.concat(F.lit("https://zhuanlan.zhihu.com/p/p"), did))
        .otherwise(F.concat(F.lit("https://www.zhihu.com/zvideo/z"), did))
    )
    return d.select(
        url.alias("url"), body.alias("body"), "doc_id",
        F.pmod(F.col("doc_id"), F.lit(3)).alias("ztype"),
    )


def build_zhihu_comment_fixture_pages(documents: DataFrame) -> DataFrame:
    """Reference-shaped root-comment pages (zhihu/help.py:213-298 input).

    Branch coverage per page: a non-comment item the P5 type filter drops,
    a comment with html content + an ip_info tag buried behind another tag
    (the _extract_comment_ip_location scan), and a reply with a member-
    nested author, absent like/dislike counts (→0) and empty comment_tag."""
    d = documents.select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    snippet = F.substring(_clean(F.col("text")), 1, 40)
    t = (F.lit(_TS0) + F.col("doc_id") * 7).cast("string")
    body = F.concat(
        F.lit('{"paging":{"is_end":true,"next":null},"data":['),
        F.lit('{"type":"sub_header","id":"hdr"},'),
        F.lit('{"type":"comment","id":"zc'), did,
        F.lit('a","reply_comment_id":null,"content":"<p>评 '), snippet,
        F.lit('</p><script>var x=1;</script>","created_time":'), t,
        F.lit(',"comment_tag":[{"type":"flag","text":"热"},{"type":"ip_info","text":"IP属地'),
        F.pmod(F.col("doc_id"), F.lit(4)).cast("string"),
        F.lit('"}],"child_comment_count":2,"like_count":'),
        F.pmod(F.col("doc_id"), F.lit(90)).cast("string"),
        F.lit(',"dislike_count":1,"author":{"id":"u'), did,
        F.lit('","name":"甲'), did, F.lit('","url_token":"t'), did,
        F.lit('","avatar_url":"https://pic.zhimg.com/a'), did, F.lit('.png"}},'),
        F.lit('{"type":"comment","id":"zc'), did,
        F.lit('b","reply_comment_id":"zc'), did,
        F.lit('a","content":"回 <b>甲</b>","created_time":'), t,
        F.lit(',"comment_tag":[],"child_comment_count":0,'),
        F.lit('"author":{"member":{"id":"m'), did,
        F.lit('","name":"乙'), did, F.lit('","url_token":"mt'), did,
        F.lit('","avatar_url":"https://pic.zhimg.com/m'), did, F.lit('.png"}}}'),
        F.lit("]}"),
    )
    return d.select(
        F.concat(
            F.lit("https://www.zhihu.com/api/v4/comment_v5/answers/a"), did,
            F.lit("/root_comment?limit=10&offset="),
        ).alias("url"),
        body.alias("body"),
        F.concat(F.lit("a"), did).alias("content_id"),
        F.lit("answer").alias("content_type"),
        "doc_id",
    )
