"""Multimodal-column operators over ``binary`` payload columns.

Model: media travels as an opaque ``binary`` column plus typed metadata
columns; heavy per-item work runs in Arrow-batched Python (``mapInPandas``)
with parsers initialized once per partition. Dimension/container metadata is
extracted for real from file headers (functions.media); pixel-level decode
is a clearly-marked stub (no codec libs in-sandbox) with the batching,
schema, and partitioning contracts real and tested — production swaps the
kernel, not the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.media import image_metadata, mp4_metadata, wav_metadata

IMAGE_META_SCHEMA = (
    "url string, format string, width int, height int, bytes bigint"
)

MEDIA_META_SCHEMA = (
    "url string, media_type string, format string, width int, height int, "
    "channels int, sample_rate int, duration_secs double, bytes bigint"
)

FEATURE_DIM = 8

IMAGE_FEATURES_SCHEMA = (
    f"url string, feature array<float>, feature_dim int"
)


def image_metadata_stage(pages: DataFrame) -> DataFrame:
    """Real header-level metadata: container format + dimensions + size.

    ``mapInPandas`` over just (url, html): the Arrow exchange carries only
    what the kernel needs; the parquet scan is pruned accordingly.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [image_metadata(p) for p in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "format": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "bytes": [len(p) if p is not None else 0 for p in pdf["html"]],
                }
            )

    return pages.select("url", "html").mapInPandas(kernel, IMAGE_META_SCHEMA)


def synthesize_media_stage(docs: DataFrame) -> DataFrame:
    """documents(doc_id) → deterministic audio/video fixture payloads
    ``(url, html)`` — the media twin of ``corpus``' pages synthesis.

    Arithmetic contract (mirrored by the ``media_metadata`` oracle SQL):
    even doc_id → WAV with channels ``1 + (doc_id % 4) // 2``, rate
    ``[8000, 16000, 44100][doc_id % 3]``, ``1 + doc_id % 5`` seconds;
    odd doc_id → MP4 (brand isom, timescale 600) with duration
    ``300 * (1 + doc_id % 10)`` ticks = ``(1 + doc_id % 10) / 2`` secs.
    """
    from ..functions.media import build_mp4, build_wav

    rates = (8000, 16000, 44100)

    def _payload(doc_id: int) -> bytes:
        if doc_id % 2 == 0:
            return build_wav(channels=1 + (doc_id % 4) // 2,
                             rate=rates[doc_id % 3],
                             seconds=1 + doc_id % 5)
        return build_mp4(timescale=600, duration=300 * (1 + doc_id % 10))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({
                "url": ["media://%d.bin" % d for d in ids],
                "html": [_payload(int(d)) for d in ids],
            })

    return docs.select("doc_id").mapInPandas(kernel, "url string, html binary")


def media_metadata_stage(pages: DataFrame) -> DataFrame:
    """Unified multimodal metadata: image (jpeg/png dims), audio (WAV
    channels/rate/duration), video (MP4 brand/duration) — all header-level
    parses of the opaque ``binary`` column, dispatched on magic bytes.
    Non-media payloads yield ``media_type=NULL`` rows (filter downstream).
    """

    def _one(payload: bytes | None) -> dict:
        row = dict(media_type=None, format=None, width=None, height=None,
                   channels=None, sample_rate=None, duration_secs=None,
                   bytes=len(payload) if payload else 0)
        if not payload:
            return row
        fmt, w, h = image_metadata(payload)
        if fmt:
            row.update(media_type="image", format=fmt, width=w, height=h)
            return row
        wav = wav_metadata(payload)
        if wav:
            row.update(media_type="audio", format="wav", channels=wav[0],
                       sample_rate=wav[1], duration_secs=wav[2])
            return row
        mp4 = mp4_metadata(payload)
        if mp4:
            row.update(media_type="video", format=mp4[0],
                       duration_secs=mp4[1])
        return row

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_one(p) for p in pdf["html"]]
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf["url"].values)
            for c, dt in (("width", "Int32"), ("height", "Int32"),
                          ("channels", "Int32"), ("sample_rate", "Int32")):
                out[c] = pd.array(out[c], dtype=dt)
            yield out

    return pages.select("url", "html").mapInPandas(kernel, MEDIA_META_SCHEMA)


def image_features(payload: bytes | None) -> list[float]:
    """REAL deterministic 8-dim feature vector from the image bytes —
    classical header/byte-level features, no learned encoder:

    ``[width/1024, height/1024, aspect (w/h), bytes/4096,
       comment_bytes/bytes, alpha_ratio, digit_ratio, is_jpeg]``

    Dimensions come from the actual JPEG SOF / PNG IHDR parse, the textual
    payload from the COM/tEXt segment walk, size from the raw bytes. All
    components are ratios of integers (IEEE-exact doubles), so a DuckDB
    oracle reproduces every bit from the corpus mapping. Non-image or
    empty payloads yield the zero vector. A production vision encoder
    swaps this kernel; the Arrow batching / schema / partition
    amortization in :func:`image_features_stage` carry over unchanged.
    Reference analog: the feature-extraction step of `ocr_router.py:38-46`.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    fmt, w, h = image_metadata(payload)
    if fmt is None or not w or not h:
        return [0.0] * FEATURE_DIM
    from ..functions.media import image_comment_text

    text = image_comment_text(payload)
    nbytes = len(payload)
    tbytes = len(text.encode("utf-8"))
    nchars = len(text)
    nalpha = sum(1 for c in text if "a" <= c <= "z" or "A" <= c <= "Z")
    ndigit = sum(1 for c in text if "0" <= c <= "9")
    return [
        w / 1024.0,
        h / 1024.0,
        w / h,
        nbytes / 4096.0,
        tbytes / nbytes,
        nalpha / max(1, nchars),
        ndigit / max(1, nchars),
        1.0 if fmt == "jpeg" else 0.0,
    ]


def image_features_stage(pages: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque ``binary`` column:
    one ``mapInPandas`` wave, column-pruned to (url, html), parser state
    amortized per batch. The kernel (:func:`image_features`) is a real
    byte-level extractor with a bit-exact DuckDB oracle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [image_features(p) for p in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "feature": feats,
                    "feature_dim": [FEATURE_DIM] * len(feats),
                }
            )

    return pages.select("url", "html").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )
