"""Deterministic signing/ID functions (SURVEY §2.9 E9–E11, E19).

The reference computes request signatures in pure Python (xhs
``x-s-common``: media_platform/xhs/help.py:21-239; bilibili WBI:
media_platform/bilibili/help.py:24-65) plus JS-engine signers that are
out-of-scope (E12 — browser runtime, non-deterministic inputs). The pure
functions are re-derived here from their mathematical structure rather
than transliterated:

- ``mrc``            — the xhs checksum is CRC-32 (standard reflected
                       polynomial 0xEDB88320 — the reference's inline
                       table is the standard one) over the FIRST 57
                       characters, tracked as a signed int32 and finished
                       with ``^ -1 ^ 0xEDB88320``. Table generated, not
                       copied; quirks (fixed 57-char window, signed wrap)
                       preserved.
- ``xhs_b64encode``  — base64 with xhs's permuted alphabet: standard
                       base64 then an alphabet translation (the
                       reference's chunked tripletToBase64 is
                       byte-equivalent to this).
- ``x_s_common``     — the full signed header payload.
- ``wbi_sign``       — bilibili WBI: mixed-key salt from the table-driven
                       shuffle + md5 over the sorted urlencoded params.
- ``search_id``      — (ts_ms << 64 | rand31) in base36
                       (xhs/help.py:242-271); seedable for determinism.

Vectorized wrappers are Arrow pandas UDFs for use in DataFrame plans.
"""

from __future__ import annotations

import base64
import hashlib
import random
import urllib.parse

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

# --------------------------------------------------------------------------
# E10 — xhs checksum + custom base64


def _crc32_table() -> np.ndarray:
    """Standard reflected CRC-32 table (poly 0xEDB88320), generated."""
    poly = np.uint32(0xEDB88320)
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if c & np.uint32(1) else np.uint32(0))
        table[i] = c
    return table


_CRC_TABLE = _crc32_table()
_MRC_WINDOW = 57  # the reference hashes exactly 57 chars of x_t+x_s+b1


def mrc(e: str) -> int:
    """xhs 'mrc' checksum, value-compatible with the reference.

    Quirks preserved exactly: only the first 57 chars are hashed (the
    reference indexes e[0..56] unconditionally); the table index is
    ``(state & 0xFF) ^ ord(ch)`` which overflows (and errors) for
    non-Latin1 chars; the result is Python's *unbounded* signed value
    ``~(state ^ 0xEDB88320)`` — NOT truncated to int32 (the reference
    XORs a Python int with -1, i.e. infinite-precision two's complement).
    """
    if len(e) < _MRC_WINDOW:
        # the reference indexes e[0..56] unconditionally and raises on
        # shorter input — mirrored so parity is total, not just on success
        raise IndexError("mrc requires at least 57 characters")
    state = 0xFFFFFFFF
    for ch in e[:_MRC_WINDOW]:
        idx = (state & 0xFF) ^ ord(ch)
        if idx > 0xFF:
            raise IndexError("mrc table index out of range (non-Latin1 input)")
        state = int(_CRC_TABLE[idx]) ^ (state >> 8)
    return ~(state ^ 0xEDB88320)


_XHS_ALPHABET = "ZmserbBoHQtNP+wOcza/LpngG8yJq42KWYj0DSfdikx3VT16IlUAFM97hECvuRX5"
_STD_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_TRANS = str.maketrans(_STD_ALPHABET, _XHS_ALPHABET)


def xhs_b64encode(data: bytes | str) -> str:
    """Custom-alphabet base64: standard encode + alphabet translation."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return base64.b64encode(data).decode("ascii").translate(_B64_TRANS)


def x_s_common(a1: str = "", b1: str = "", x_s: str = "", x_t: str = "") -> str:
    """The x-s-common payload (xhs/help.py:21-47 semantics): a fixed-shape
    JSON env dict with the mrc checksum, custom-base64 encoded."""
    import json

    common = {
        "s0": 3,
        "s1": "",
        "x0": "1",
        "x1": "3.7.8-2",
        "x2": "Mac OS",
        "x3": "xhs-pc-web",
        "x4": "4.27.2",
        "x5": a1,
        "x6": x_t,
        "x7": x_s,
        "x8": b1,
        "x9": mrc(x_t + x_s + b1),
        "x10": 154,
    }
    payload = json.dumps(common, separators=(",", ":"))
    return xhs_b64encode(payload)


# --------------------------------------------------------------------------
# E11 — bilibili WBI sign (help.py:24-65 semantics; table is protocol data)
_WBI_MIX_TABLE = [
    46, 47, 18, 2, 53, 8, 23, 32, 15, 50, 10, 31, 58, 3, 45, 35, 27, 43, 5, 49,
    33, 9, 42, 19, 29, 28, 14, 39, 12, 38, 41, 13, 37, 48, 7, 16, 24, 55, 40,
    61, 26, 17, 0, 1, 60, 51, 30, 4, 22, 25, 54, 21, 56, 59, 6, 63, 57, 62, 11,
    36, 20, 34, 44, 52,
]
_WBI_STRIP = set("!'()*")


def wbi_salt(img_key: str, sub_key: str) -> str:
    mixin = img_key + sub_key
    return "".join(mixin[i] for i in _WBI_MIX_TABLE)[:32]


def wbi_sign(params: dict, img_key: str, sub_key: str, wts: int) -> dict:
    """Returns params + w_rid. ``wts`` passed in — no wall clock."""
    req = dict(params)
    req["wts"] = wts
    req = dict(sorted(req.items()))
    req = {k: "".join(ch for ch in str(v) if ch not in _WBI_STRIP) for k, v in req.items()}
    query = urllib.parse.urlencode(req)
    req["w_rid"] = hashlib.md5((query + wbi_salt(img_key, sub_key)).encode()).hexdigest()
    return req


# --------------------------------------------------------------------------
# E9 — base36 + search_id; E19 — trace ids
_B36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def base36_encode(n: int) -> str:
    if n == 0:
        return "0"
    sign = "-" if n < 0 else ""
    n = abs(n)
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(_B36[r])
    return sign + "".join(reversed(out))


def base36_decode(s: str) -> int:
    return int(s, 36)


def search_id(ts_ms: int, rand31: int | None = None, seed: int | None = None) -> str:
    """(ts_ms << 64) + rand31 in base36 (xhs/help.py:268-271). Pass
    ``rand31`` or ``seed`` for determinism; wall clock never read here."""
    if rand31 is None:
        rng = random.Random(seed)
        rand31 = rng.randint(0, 2147483646)
    return base36_encode((ts_ms << 64) + rand31)


def b3_trace_id(seed: int) -> str:
    """16 hex chars (xhs/help.py:50-57), seeded."""
    rng = random.Random(seed)
    return "".join(rng.choice("abcdef0123456789") for _ in range(16))


# --------------------------------------------------------------------------
# Vectorized wrappers (Arrow): usable inside DataFrame plans.
@pandas_udf(LongType())
def mrc_udf(s: pd.Series) -> pd.Series:
    def _safe(v):
        try:
            return mrc(v)
        except (IndexError, TypeError):
            return None

    return s.map(_safe).astype("Int64")


@pandas_udf(StringType())
def xhs_b64_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").map(xhs_b64encode)


@pandas_udf(StringType())
def search_id_udf(ts_ms: pd.Series, rand31: pd.Series) -> pd.Series:
    return pd.Series(
        [search_id(int(t), int(r)) for t, r in zip(ts_ms, rand31)], dtype="object"
    )
