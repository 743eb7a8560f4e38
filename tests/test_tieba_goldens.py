"""Hand-pinned goldens for the six tieba extractors (E2).

Every test here pins BOTH the input page and the COMPLETE expected rows as
literals — nothing is computed by the code under test or by the shared
simulator — so an extractor bug cannot cancel out in the engine≡simulator
equivalence suite (which imports the same extractor module). Expected
values are derived by hand from the reference's xpath semantics
(/root/reference/media_platform/tieba/help.py:33-356):

- missing nodes yield '' (xpath .get(default='')), missing data-field keys
  yield the pydantic defaults the reference model would see (None / 0);
- URL fields are TIEBA_URL-prefixed exactly where the reference prefixes
  (sub-comment user_link is NOT prefixed, help.py:196);
- comment bodies run through the byte-identical text kernel
  (tools/crawler_util.py:194-203);
- data-field attributes are html.unescape'd then json.loads'd
  (help.py:346-356), so int ids stringify via str();
- nested markup must survive whole (xpath node semantics), including
  nested <ul>/<div>/<span> inside list bodies and abstracts.
"""

from mediacrawler_spark.operators import tieba as T

TIEBA = "https://tieba.baidu.com"


# ---------------------------------------------------------------------------
# 1. extract_search_note_list (help.py:33-61)

def test_golden_search_note_list():
    page = (
        # block A — complete, desc nests a div
        '<div class="s_post"><span class="p_title">'
        '<a data-tid="100200300" href="/p/100200300?t=1"> 标题甲 </a></span>'
        '<div class="p_content"> 摘要 <div>内</div> 尾 </div>'
        '<a href="/home/main?un=用户甲"><font>用户甲</font></a>'
        '<a class="p_forum" href="/f?kw=测试吧"><font>测试吧</font></a>'
        '<font class="p_green p_date">2023-12-31 23:59</font></div>'
        # block B — only the title anchor; every other node missing
        '<div class="s_post"><span class="p_title">'
        '<a href="/p/42">光题</a></span></div>'
    )
    assert T.extract_search_note_list(page) == [
        {
            "note_id": "100200300",
            "title": "标题甲",
            "desc": "摘要 <div>内</div> 尾",
            "note_url": TIEBA + "/p/100200300?t=1",
            "user_nickname": "用户甲",
            "user_link": TIEBA + "/home/main?un=用户甲",
            "tieba_name": "测试吧",
            "tieba_link": TIEBA + "/f?kw=测试吧",
            "publish_time": "2023-12-31 23:59",
        },
        {
            "note_id": "",
            "title": "光题",
            "desc": "",
            "note_url": TIEBA + "/p/42",
            "user_nickname": "",
            "user_link": TIEBA,
            "tieba_name": "",
            "tieba_link": TIEBA,
            "publish_time": "",
        },
    ]


# ---------------------------------------------------------------------------
# 2. extract_tieba_note_list (help.py:63-97)

def test_golden_forum_thread_list():
    page = (
        '<a class="card_title_fname" href="/f?kw=金庸">金庸</a>'
        '<ul id="thread_list">'
        # li 1 — int id, authoer_nickname wins over author_name, nested
        # span in the abstract, nested ul in the body
        '<li data-field="{&quot;id&quot;:900100,'
        '&quot;authoer_nickname&quot;:&quot;昵称甲&quot;,'
        '&quot;author_name&quot;:&quot;账号甲&quot;,&quot;reply_num&quot;:57}">'
        '<a class="j_th_tit " href="/p/900100">题 甲</a>'
        '<div class="threadlist_abs threadlist_abs_onlyline "> 摘 <span>中</span> 尾 </div>'
        '<a class="frs-author-name j_user_card " href="/home/main?id=ua1">甲</a>'
        '<ul class="inner"><li>深</li></ul>'
        "</li>"
        # li 2 — commented out in the raw HTML (tieba ships the list inside
        # <!-- -->; the reference strips only the opener, help.py:73);
        # string id, author_name fallback, reply_num/title/desc absent
        '<!--<li data-field="{&quot;id&quot;:&quot;t-str-2&quot;,'
        '&quot;author_name&quot;:&quot;账号乙&quot;}">'
        "</li>-->"
        # li 3 — no data-field at all → skipped (help.py:79-80)
        '<li class="noise">x</li>'
        "</ul>"
        '<div class="footer">页脚</div>'
    )
    assert T.extract_tieba_note_list(page) == [
        {
            "note_id": "900100",
            "title": "题 甲",
            "desc": "摘 <span>中</span> 尾",
            "note_url": TIEBA + "/p/900100",
            "user_link": TIEBA + "/home/main?id=ua1",
            "user_nickname": "昵称甲",
            "tieba_name": "金庸",
            "tieba_link": TIEBA + "/f?kw=金庸",
            "total_replay_num": 57,
        },
        {
            "note_id": "t-str-2",
            "title": "",
            "desc": "",
            "note_url": TIEBA + "/p/t-str-2",
            "user_link": TIEBA,
            "user_nickname": "账号乙",
            "tieba_name": "金庸",
            "tieba_link": TIEBA + "/f?kw=金庸",
            "total_replay_num": 0,
        },
    ]


# ---------------------------------------------------------------------------
# 3. extract_note_detail (help.py:99-133)

def test_golden_note_detail():
    page = (
        "<html><head><title> 深度讨论:金庸小说【金庸】_百度贴吧 </title>"
        '<meta name="description" content="这是一段描述, 第二句。"></head><body>'
        '<a class="card_title_fname" href="/f?kw=金庸">金庸</a>'
        '<a id="lzonly_cntn" href="/p/8123456789?see_lz=1">只看楼主</a>'
        '<div class="p_postlist">'
        '<div class="d_post_content j_d_post_content"> 首楼正文 <br/> 尾 </div>'
        '<a class="p_author_face " href="/home/main?id=author9">'
        '<img src="https://gss0.example/avatar9.jpg"></a>'
        '<a class="p_author_name j_user_card" href="/home/main?id=author9">楼主九</a>'
        '<div class="post-tail-wrap"><span class="tail-info">IP属地:广东</span>'
        '<span class="tail-info">2022-08-15 10:05</span></div>'
        "</div>"
        '<div id="thread_theme_5"><li class="l_reply_num">'
        '<span class="red">1024</span><span class="red">11</span></li></div>'
        "</body></html>"
    )
    assert T.extract_note_detail(page) == {
        "note_id": "8123456789",
        "title": "深度讨论:金庸小说",  # suffix strip, help.py:132
        "desc": "这是一段描述, 第二句。",
        "note_url": TIEBA + "/p/8123456789",
        "user_link": TIEBA + "/home/main?id=author9",
        "user_nickname": "楼主九",
        "user_avatar": "https://gss0.example/avatar9.jpg",
        "tieba_name": "金庸",
        "tieba_link": TIEBA + "/f?kw=金庸",
        "ip_location": "广东",
        "publish_time": "2022-08-15 10:05",
        "total_replay_num": "1024",
        "total_replay_page": "11",
    }


def test_golden_note_detail_minimal():
    """Every optional node absent → the reference's xpath defaults."""
    page = "<html><head><title>无名【】_百度贴吧</title></head><body></body></html>"
    assert T.extract_note_detail(page) == {
        "note_id": "",
        "title": "无名",
        "desc": "",
        "note_url": TIEBA + "/p/",
        "user_link": TIEBA,
        "user_nickname": "",
        "user_avatar": "",
        "tieba_name": "",
        "tieba_link": TIEBA,
        "ip_location": "",
        "publish_time": "",
        "total_replay_num": "",
        "total_replay_page": "",
    }


# ---------------------------------------------------------------------------
# 4. extract_note_parent_comments (help.py:135-170)

def test_golden_parent_comments():
    page = (
        '<a class="card_title_fname" href="/f?kw=金庸">金庸</a>'
        # c1 — full: escaped-HTML content through the text kernel, int ids
        '<div class="l_post l_post_bright j_l_post clearfix  " '
        'data-field="{&quot;content&quot;:{&quot;post_id&quot;:777001,'
        '&quot;comment_num&quot;:3,'
        '&quot;content&quot;:&quot;&lt;b&gt;加粗&lt;/b&gt; 文字&quot;,'
        '&quot;forum_id&quot;:55}}">'
        '<a class="p_author_face " href="/home/main?id=cu1">'
        '<img src="https://img.example/cu1.png"></a>'
        '<a class="p_author_name j_user_card" href="#">评甲</a>'
        '<div class="post-tail-wrap"><span class="tail-info">IP属地:浙江</span>'
        '<span class="tail-info">2022-08-15 11:00</span></div>'
        "</div>"
        # c2 — only post_id present; author/tail-wrap nodes absent
        '<div class="l_post l_post_bright j_l_post clearfix  " '
        'data-field="{&quot;content&quot;:{&quot;post_id&quot;:&quot;c2str&quot;}}">'
        "</div>"
    )
    assert T.extract_note_parent_comments(page, "8123456789") == [
        {
            "comment_id": "777001",
            "sub_comment_count": 3,
            "content": "加粗 文字",  # kernel strips tags byte-identically
            "note_url": TIEBA + "/p/8123456789",
            "user_link": TIEBA + "/home/main?id=cu1",
            "user_nickname": "评甲",
            "user_avatar": "https://img.example/cu1.png",
            "tieba_id": "55",
            "tieba_name": "金庸",
            "tieba_link": "https://tieba.baidu.com/f?kw=金庸",
            "ip_location": "浙江",
            "publish_time": "2022-08-15 11:00",
            "note_id": "8123456789",
        },
        {
            "comment_id": "c2str",
            "sub_comment_count": None,
            "content": "",
            "note_url": TIEBA + "/p/8123456789",
            "user_link": TIEBA,
            "user_nickname": "",
            "user_avatar": "",
            "tieba_id": "",
            "tieba_name": "金庸",
            "tieba_link": "https://tieba.baidu.com/f?kw=金庸",
            "ip_location": "",
            "publish_time": "",
            "note_id": "8123456789",
        },
    ]


# ---------------------------------------------------------------------------
# 5. extract_note_sub_comments (help.py:172-205)

def test_golden_sub_comments():
    parent = {
        "comment_id": "777001",
        "note_id": "8123456789",
        "note_url": TIEBA + "/p/8123456789",
        "tieba_id": "55",
        "tieba_name": "金庸",
        "tieba_link": "https://tieba.baidu.com/f?kw=金庸",
    }
    page = (
        "<ul>"
        # regular variant FIRST in the page — but the reference collects all
        # first_no_border blocks before regular ones (help.py:183-185), so
        # the expected order is [s-first, 66002]
        '<li class="lzl_single_post j_lzl_s_p " '
        'data-field="{&quot;spid&quot;:66002,&quot;showname&quot;:&quot;次子&quot;}">'
        '<a class="j_user_card lzl_p_p" href="/home/main?id=su2">'
        '<img src="https://img.example/su2.png"></a>'
        '<span class="lzl_content_main">二层 <a href="#">引用</a> 正文</span>'
        '<span class="lzl_time">2022-08-16 08:00</span></li>'
        # first_no_border variant — avatar/time/showname absent
        '<li class="lzl_single_post j_lzl_s_p first_no_border" '
        'data-field="{&quot;spid&quot;:&quot;s-first&quot;}">'
        '<a class="j_user_card lzl_p_p" href="/home/main?id=su1"></a>'
        '<span class="lzl_content_main">首层</span></li>'
        "</ul>"
    )
    assert T.extract_note_sub_comments(page, parent) == [
        {
            "comment_id": "s-first",
            "content": "首层",
            # sub-comment user_link is NOT TIEBA_URL-prefixed (help.py:196)
            "user_link": "/home/main?id=su1",
            "user_nickname": None,
            "user_avatar": "",
            "publish_time": "",
            "parent_comment_id": "777001",
            "note_id": "8123456789",
            "note_url": TIEBA + "/p/8123456789",
            "tieba_id": "55",
            "tieba_name": "金庸",
            "tieba_link": "https://tieba.baidu.com/f?kw=金庸",
        },
        {
            "comment_id": "66002",
            "content": "二层 引用 正文",
            "user_link": "/home/main?id=su2",
            "user_nickname": "次子",
            "user_avatar": "https://img.example/su2.png",
            "publish_time": "2022-08-16 08:00",
            "parent_comment_id": "777001",
            "note_id": "8123456789",
            "note_url": TIEBA + "/p/8123456789",
            "tieba_id": "55",
            "tieba_name": "金庸",
            "tieba_link": "https://tieba.baidu.com/f?kw=金庸",
        },
    ]


# ---------------------------------------------------------------------------
# 6. extract_creator_info + extract_thread_ids_from_creator_page
#    (help.py:207-265)

_CREATOR_PAGE = (
    "<html><body>"
    '<div class="userinfo_left_head"><img src="https://img.example/av77.png"></div>'
    '<span class="userinfo_username ">昵称柒</span>'
    # un is percent-encoded: the reference unquotes before parse_qs
    '<p class="space"><a href="/home/main?id=uid77&un=user%20name77">主页</a></p>'
    # whitespace between the spans matters: the reference's IP regex
    # (help.py:287 r'IP属地:(\S+)</span>') is GREEDY across adjacent
    # non-space spans — real pages separate them with newlines
    '<div class="userinfo_userdata"><span class="sex_female"></span>\n'
    '<span class="tail-info">IP属地:上海</span>\n<span>吧龄:2.5年</span></div>'
    '<span class="concern_num">(<a href="#">12</a>)</span>'
    '<span class="concern_num">(<a href="#">3456</a>)</span>'
    '<ul class="new_list clearfix">'
    '<li><div class="thread_name"><a href="/p/9001?fr=home" title="a">甲帖'
    '</a><ul class="x"><li>内</li></ul></div></li>'
    '<li><div class="thread_name"><a href="/p/9002">乙帖</a></div></li>'
    "</ul>"
    "</body></html>"
)


def test_golden_creator_info():
    assert T.extract_creator_info(_CREATOR_PAGE) == {
        "user_id": "uid77",
        "user_name": "user name77",
        "nickname": "昵称柒",
        "avatar": "https://img.example/av77.png",
        "gender": "女",
        "ip_location": "上海",
        "follows": "12",
        "fans": "3456",
        "registration_duration": "2.5年",
    }


def test_golden_creator_thread_ids():
    # the nested </ul> inside thread 9001's name div must not truncate the
    # list (the round-3 non-greedy bug class)
    assert T.extract_thread_ids_from_creator_page(_CREATOR_PAGE) == ["9001", "9002"]


def test_golden_creator_info_minimal():
    """No space link, no userdata, no concern spans → reference defaults."""
    page = "<html><body><p>empty profile</p></body></html>"
    assert T.extract_creator_info(page) == {
        "user_id": "",
        "user_name": "",
        "nickname": "",
        "avatar": "",
        "gender": "未知",
        "ip_location": "",
        "follows": "0",
        "fans": "0",
        "registration_duration": "",
    }


# ---------------------------------------------------------------------------
# 7. sloppy markup — unclosed tags (lxml-recovery fallback in _balanced_inner)

def test_golden_note_detail_unclosed_li():
    """An unclosed <li class="l_reply_num"> followed by a sibling <li>.

    lxml (the reference's parser, help.py:99-133) auto-closes an <li> at
    the next sibling <li> open (HTML5 optional end tags), so the reply-num
    capture must stop BEFORE the pager li — the pager's own
    <span class="red">99</span> must not leak into the red-number list.
    Before the fallback this capture ran to end-of-string.
    """
    page = (
        "<html><head><title>烂标签【烂吧】_百度贴吧</title></head><body>"
        '<a class="card_title_fname" href="/f?kw=烂吧">烂吧</a>'
        '<a id="lzonly_cntn" href="/p/777?see_lz=1">只看楼主</a>'
        '<div id="thread_theme_5"><ul><li class="l_reply_num">'
        '<span class="red">7</span>回复贴，共<span class="red">2</span>页'
        '<li class="pager_theme"><span class="red">99</span></ul></div>'
        "</body></html>"
    )
    got = T.extract_note_detail(page)
    assert got["total_replay_num"] == "7"
    assert got["total_replay_page"] == "2"


def test_balanced_inner_unclosed_fallbacks():
    # nested <div> never closed, but the SAME open pattern recurs →
    # bound at the next open-pattern match (sibling recovery)
    s = '<div class="x">a <div>b <div class="x">c</div>'
    assert T._balanced_inner(s, r'<div class="x">', "div") == "a <div>b "
    # omittable-end tag (<li>): bound at the first sibling-depth <li> open
    s2 = "<li>alpha <span>s</span> <li>beta</li>"
    assert T._balanced_inner(s2, r"<li>", "li") == "alpha <span>s</span> "
    # non-omittable tag with no recurring pattern: end-of-string unchanged
    s3 = '<div class="y">tail <div>never closed'
    assert T._balanced_inner(s3, r'<div class="y">', "div") == "tail <div>never closed"
    # balanced input: fallback must not fire (nesting still exact)
    s4 = '<li class="a">x <li>inner</li> y</li><li class="a">z</li>'
    assert T._balanced_inner(s4, r'<li class="a">', "li") == "x <li>inner</li> y"
