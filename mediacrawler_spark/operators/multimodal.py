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


RESIZE_SCHEMA = "url string, width int, height int, resized binary"


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  blob_col: str = "html") -> DataFrame:
    """Image-resize stage: (url, blob) → (url, width, height, resized blob).

    The pixel transform is the documented container stub (PIL absent):
    a deterministic digest-expanded payload of exactly ``width*height*3``
    bytes, so output size, schema, batch shape and memory envelope match
    a real RGB resize — swapping in PIL changes only ``_fake_resize``.
    Arrow-batched, column-pruned; at 100 TB the input projection keeps
    every non-blob column out of the Python worker.
    """
    target = width * height * 3

    def _fake_resize(blob: bytes) -> bytes:
        if blob is None:
            raise NotImplementedError("real image decode requires PIL (not in container)")
        seed = hashlib.sha1(blob).digest()
        reps = target // len(seed) + 1
        return (seed * reps)[:target]

    src = media.select("url", blob_col)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "resized": blobs.map(lambda b: _fake_resize(b) if b is not None else None),
                }
            )

    return src.mapInPandas(_run, RESIZE_SCHEMA)


FRAME_SCHEMA = "url string, frame_idx int, ts_ms long, frame binary"


def sample_frames(media: DataFrame, fps_ms: int = 1000, blob_col: str = "html") -> DataFrame:
    """Video frame-sampling stage: one input row → N frame rows.

    Demonstrates the 1→N ``mapInPandas`` shape a real ffmpeg frame
    sampler needs (each yielded batch may hold multiple rows per input
    video). Frame count and bytes are the deterministic container stub:
    ``1 + n_bytes % 7`` frames, each a digest-derived 16-byte payload at
    ``fps_ms`` intervals; a real deployment replaces ``_fake_frames``
    with an ffmpeg pipe and nothing else changes.
    """
    src = media.select("url", blob_col)

    def _fake_frames(blob: bytes) -> list[bytes]:
        n = 1 + len(blob) % 7
        return [hashlib.sha1(blob + bytes([i])).digest()[:16] for i in range(n)]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            ts: list[int] = []
            frames: list[bytes] = []
            for url, blob in zip(pdf["url"], pdf[blob_col]):
                if blob is None:
                    continue
                for i, fr in enumerate(_fake_frames(blob)):
                    urls.append(url)
                    idxs.append(i)
                    ts.append(i * fps_ms)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(ts, dtype="int64"),
                    "frame": frames,
                }
            )

    return src.mapInPandas(_run, FRAME_SCHEMA)


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
