"""Multimodal column plumbing: opaque binary + typed metadata.

The reference fetches media bytes and writes them to files
(media_platform/xhs/client.py:153-165 ``get_note_media``;
store/xhs/xhs_store_media.py) — no decoding. The engine treats media as
``binary`` columns with typed metadata and runs decode/feature-extract as
Arrow-batched ``mapInPandas`` stages.

Image/audio libraries are not in this container, so the *decode* step is
stubbed (clearly marked ``NotImplementedError`` or the deterministic fake
used in tests); the Spark-side plumbing — schema, batch iteration, column
pruning, partition sizing — is real and tested. Swapping in PIL/ffmpeg on
a cluster changes only the body of ``_decode_stub``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "url string, n_bytes long, sha1 string, byte_entropy double, fake_width int, fake_height int"
)


def _decode_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic fake decode: 'dimensions' derived from content bytes.

    Real deployment: replace with PIL.Image.open(io.BytesIO(blob)).size —
    the surrounding batch plumbing is unchanged.
    """
    if blob is None:
        raise NotImplementedError("real media decode requires PIL/ffmpeg (not in container)")
    h = hashlib.sha1(blob).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def binary_features(pages: DataFrame, blob_col: str = "html") -> DataFrame:
    """Per-blob features via mapInPandas (Arrow batches, bounded memory).

    Column pruning matters: only (url, blob) reach Python; at 100 TB the
    blob column dominates scan bytes, so callers should pre-filter rows
    (e.g., by kind/host) *before* this stage — the filter pushes to the
    parquet scan, this stage never sees pruned rows.
    """
    src = pages.select("url", blob_col)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            n_bytes = blobs.map(lambda b: len(b) if b is not None else 0)
            sha1 = blobs.map(lambda b: hashlib.sha1(b).hexdigest() if b is not None else None)

            def entropy(b: bytes | None) -> float:
                if not b:
                    return 0.0
                counts = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
                p = counts[counts > 0] / len(b)
                return float(-(p * np.log2(p)).sum())

            dims = blobs.map(lambda b: _decode_stub(b) if b is not None else (0, 0))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha1": sha1,
                    "byte_entropy": blobs.map(entropy).astype("float64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return src.mapInPandas(_extract, FEATURE_SCHEMA)


MD5_FEATURE_SCHEMA = "doc_id long, n_bytes long, md5 string, fake_width int, fake_height int"


def binary_features_md5(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Oracle-portable twin of :func:`binary_features`.

    Same Arrow ``mapInPandas`` batch plumbing and decode-stub pattern
    (dimensions derived from digest bytes), but over UTF-8 encoded text
    blobs with md5 — every output column is re-derivable in ANSI SQL
    (DuckDB ``strlen``/``md5``/hex-cast), so the pair hash-checks the
    Python batch path end-to-end. The sha1+entropy variant above stays
    the deployment surface; this twin exists to pin the plumbing.
    """
    src = docs.select(id_col, text_col).filter(f"{text_col} IS NOT NULL")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[text_col].map(lambda t: t.encode("utf-8"))
            digests = blobs.map(lambda b: hashlib.md5(b).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "md5": digests.map(bytes.hex),
                    "fake_width": digests.map(lambda d: 64 + d[0] % 192).astype("int32"),
                    "fake_height": digests.map(lambda d: 64 + d[1] % 192).astype("int32"),
                }
            )

    return src.mapInPandas(_extract, MD5_FEATURE_SCHEMA)
