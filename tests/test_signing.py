"""Signing-function parity (E9–E11).

Goldens were produced by executing the reference implementations
(media_platform/xhs/help.py, media_platform/bilibili/help.py) once,
offline; the reference is NOT imported here. Our implementations are
re-derived (generated CRC table, alphabet-translation base64) but must be
value-identical, including the reference's quirks (57-char window,
unbounded signed mrc result, IndexError on short/non-Latin1 input,
"!'()*" stripping in WBI).
"""

import pytest

from mediacrawler_spark.functions import signing as S


def test_mrc_goldens():
    assert S.mrc("a" * 57) == -1110711967
    assert S.mrc("XYZ1705310000000abcdefb1value_padding_to_57_chars_xxxxxx!!") == -3010532919
    assert S.mrc("0123456789" * 6) == -614507527
    # only the first 57 chars count
    assert S.mrc("a" * 57 + "IGNORED") == S.mrc("a" * 57)


def test_mrc_error_quirks_match_reference():
    with pytest.raises(IndexError):
        S.mrc("short")
    with pytest.raises(IndexError):
        S.mrc("测试" + "x" * 55)  # non-Latin1 → table index overflow


def test_xhs_b64_goldens():
    assert S.xhs_b64encode("hello world") == "yBpVJBuW49RUJBc="
    assert S.xhs_b64encode("测试中文") == "E3nNCtXpENjTEkyo"
    assert S.xhs_b64encode("") == ""
    assert S.xhs_b64encode("a") == "Gc=="
    assert S.xhs_b64encode("ab") == "GnH="


def test_x_s_common_golden():
    out = S.x_s_common(
        a1="a1cookie",
        b1="b1value_padding_to_57_chars_xxxxxxabcdefpadpadpad",
        x_s="XS",
        x_t="1705310000000",
    )
    assert out.startswith("2UQAPsHCPUIjqArjwjHjNsQhPsHCH0rjNsQhPaHCH0P1+UhhN")
    assert out.endswith("H0il+/zR")
    assert len(out) == 288


def test_base36_roundtrip_and_golden():
    assert S.base36_encode(123456789012345678901234567890) == "BYW97UM9S91DLZ68TSI"
    for n in (0, 1, 35, 36, 2**70 + 12345):
        assert S.base36_decode(S.base36_encode(n)) == n
    assert S.base36_encode(-36) == "-10"


def test_search_id_deterministic():
    a = S.search_id(1705310000000, rand31=42)
    assert a == S.search_id(1705310000000, rand31=42)
    assert S.base36_decode(a) == (1705310000000 << 64) + 42
    assert S.search_id(1705310000000, seed=7) == S.search_id(1705310000000, seed=7)


def test_wbi_goldens():
    img, sub = "7cd084941338484aae1ad9425b84077c", "4932caff0ff746eab6f01bf08b70ac45"
    assert S.wbi_salt(img, sub) == "ea1db124af3c7062474693fa704f4ff8"
    out = S.wbi_sign({"foo": "bar", "baz": "1*9('!"}, img, sub, wts=1705310000)
    assert out["w_rid"] == "287f742155c799cdb3a3236d6dd93a1e"
    assert out["baz"] == "19"  # "!'()*" chars stripped like the reference
    assert out["wts"] == "1705310000"  # values stringified like the reference


def test_b3_trace_id():
    t = S.b3_trace_id(seed=1)
    assert len(t) == 16 and all(c in "abcdef0123456789" for c in t)
    assert t == S.b3_trace_id(seed=1)


def test_vectorized_wrappers_match_scalar(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("XYZ1705310000000abcdefb1value_padding_to_57_chars_xxxxxx!!", "hello world")],
        "m string, b string",
    )
    row = df.select(
        S.mrc_udf(F.col("m")).alias("mrc"), S.xhs_b64_udf(F.col("b")).alias("b64")
    ).collect()[0]
    # the Arrow wrapper truncates to int64 — value fits, must equal scalar
    assert row["mrc"] == S.mrc("XYZ1705310000000abcdefb1value_padding_to_57_chars_xxxxxx!!")
    assert row["b64"] == S.xhs_b64encode("hello world")
