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
