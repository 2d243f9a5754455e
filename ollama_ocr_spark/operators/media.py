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
from pyspark.sql import functions as F

from ..functions.media import (image_metadata, mp4_metadata, mp4_timing,
                               wav_metadata)

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


RESIZE_SCHEMA = (
    "url string, src_w int, src_h int, out_w int, out_h int, "
    "plan_bytes bigint, resized binary"
)

FRAME_TIMING_SCHEMA = "url string, timescale int, duration_ticks bigint"

FRAME_SCHEMA = (
    "url string, frame_idx bigint, ts_ticks bigint, ts_ms bigint, "
    "frame binary"
)


def _stub_resize_pixels(payload: bytes, src_w: int, src_h: int,
                        out_w: int, out_h: int) -> bytes:
    """STUB pixel resample (no codec library in-sandbox): a deterministic
    plan-string payload instead of pixels. The real dimensions/plan around
    it are exact; a production kernel returns the actual resampled buffer
    (``out_w * out_h * 3`` bytes — the ``plan_bytes`` column) and nothing
    else in the stage changes."""
    return f"resized://{src_w}x{src_h}->{out_w}x{out_h}".encode("ascii")


def _stub_frame_pixels(url: str, ts_ticks: int) -> bytes:
    """STUB frame grab (no ffmpeg in-sandbox): deterministic bytes naming
    the (video, tick) a real decoder would seek to."""
    return f"frame://{url}@{ts_ticks}".encode("ascii")


# Swap seam for the pixel-level media kernels (same contract as
# functions.router.OCR_KERNELS): production registers PIL/cv2/ffmpeg-backed
# functions here — batching, schema, frame planning, and partitioning are
# unchanged. The stage builders capture the registered kernel into the
# mapInPandas closure at PLAN-BUILD time, so a driver-side
# register_media_kernel() call propagates to workers with the closure.
MEDIA_KERNELS: dict[str, object] = {
    "resize_pixels": _stub_resize_pixels,
    "frame_pixels": _stub_frame_pixels,
}


def register_media_kernel(name: str, fn) -> None:
    """Register a pixel-level media kernel: ``resize_pixels(payload, src_w,
    src_h, out_w, out_h) -> bytes`` or ``frame_pixels(url, ts_ticks) ->
    bytes``."""
    MEDIA_KERNELS[name] = fn


def fit_box(src_w: int, src_h: int, box_w: int, box_h: int) -> tuple[int, int]:
    """Aspect-preserving fit of (src_w, src_h) into (box_w, box_h) — pure
    integer arithmetic (floor division, no float scale factor) so the plan
    is bit-identical on any engine; the DuckDB oracle mirrors these exact
    expressions. The limiting side lands exactly on the box; the other is
    floored, never zero."""
    if src_w * box_h <= box_w * src_h:  # height-limited (or exact fit)
        return max(1, (src_w * box_h) // src_h), box_h
    return box_w, max(1, (src_h * box_w) // src_w)


def resize_images_stage(pages: DataFrame, box_w: int = 128,
                        box_h: int = 128, kernel=None) -> DataFrame:
    """Distributed image resize: one Arrow-batched ``mapInPandas`` wave,
    column-pruned to (url, html). REAL per row: the header dimension parse
    (JPEG SOF / PNG IHDR) and the integer fit-within-box plan
    (:func:`fit_box`, oracle-mirrored). STUB: the pixel resample
    (``MEDIA_KERNELS['resize_pixels']``) — swap in PIL/cv2 via
    :func:`register_media_kernel` and only the ``resized`` bytes change.
    Non-image payloads are dropped (no dimensions, nothing to plan).

    Scale shape: embarrassingly parallel map stage, no shuffle; the Arrow
    exchange carries only the pruned columns in; ``plan_bytes``
    (``out_w*out_h*3``) is what a real RGB kernel would emit per row —
    size output partitions by it, not by the input bytes.

    Reference analog: the model-input resize inside TrOCR preprocessing
    (`ocr_router.py:42-43` — `Image.open(...).convert('RGB')` then
    `processor(images=...)`, which rescales to the encoder's input size);
    here the geometry plan is explicit and engine-exact, the resample is
    the swappable kernel.
    """
    resample = kernel or MEDIA_KERNELS["resize_pixels"]

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sws, shs, ows, ohs, pbs, bufs = [], [], [], [], [], [], []
            for url, payload in zip(pdf["url"], pdf["html"]):
                fmt, w, h = image_metadata(payload)
                if fmt is None or not w or not h:
                    continue
                ow, oh = fit_box(w, h, box_w, box_h)
                urls.append(url)
                sws.append(w)
                shs.append(h)
                ows.append(ow)
                ohs.append(oh)
                pbs.append(ow * oh * 3)
                bufs.append(resample(payload, w, h, ow, oh))
            yield pd.DataFrame(
                {
                    "url": pd.array(urls, dtype="string"),
                    "src_w": pd.array(sws, dtype="Int32"),
                    "src_h": pd.array(shs, dtype="Int32"),
                    "out_w": pd.array(ows, dtype="Int32"),
                    "out_h": pd.array(ohs, dtype="Int32"),
                    "plan_bytes": pd.array(pbs, dtype="Int64"),
                    "resized": pd.Series(bufs, dtype="object"),
                }
            )

    return pages.select("url", "html").mapInPandas(_kernel, RESIZE_SCHEMA)


def video_frame_timing_stage(videos: DataFrame) -> DataFrame:
    """REAL header-level video timing: (timescale, duration_ticks) from the
    ISO-BMFF ``mvhd`` box (:func:`~ollama_ocr_spark.functions.media
    .mp4_timing`), integer-exact for frame planning. Non-video payloads
    yield NULL timing (filter downstream). Column-pruned map stage."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            timings = [mp4_timing(p) for p in pdf["html"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "timescale": pd.array(
                        [t[0] if t else None for t in timings], dtype="Int32"
                    ),
                    "duration_ticks": pd.array(
                        [t[1] if t else None for t in timings], dtype="Int64"
                    ),
                }
            )

    return videos.select("url", "html").mapInPandas(
        _kernel, FRAME_TIMING_SCHEMA
    )


def sample_frames_stage(videos: DataFrame, step_ticks: int = 300,
                        kernel=None) -> DataFrame:
    """Distributed frame sampling: REAL timing parse (Arrow kernel) → REAL
    frame plan built ENGINE-SIDE (``sequence``/``explode`` over tick
    arithmetic — the row expansion scales in whole-stage codegen, no
    Python in the explode) → STUB frame-grab kernel over the post-explode
    rows (``MEDIA_KERNELS['frame_pixels']``; swap in ffmpeg via
    :func:`register_media_kernel`).

    One frame every ``step_ticks`` movie ticks starting at 0, strictly
    before the duration; ``ts_ms = ts_ticks * 1000 div timescale``
    (integer floor, oracle-mirrored). Rows without readable timing (or
    zero duration) produce no frames — the when-guard keeps ``sequence``
    ascending (``sequence(1, 0)`` yields a DESCENDING array, not empty).

    Scale shape: map → explode → map; no shuffle. Output rows multiply by
    duration/step — repartition AFTER this stage if a real decode kernel
    follows (frame work, not video count, is the unit of cost).

    Reference analog: `ocr_router.py:105-119` ``convert_pdf_to_images``
    (one raster per page of a paged container, then per-page OCR) — the
    same expand-then-process shape applied to timed media, with the
    expansion planned engine-side instead of inside the decoder call.
    """
    if step_ticks <= 0:  # interpolated into SQL below: 0 divides, <0
        raise ValueError(  # builds a descending (wrong-frame) sequence
            f"step_ticks must be positive, got {step_ticks}")
    grab = kernel or MEDIA_KERNELS["frame_pixels"]
    timing = video_frame_timing_stage(videos).filter(
        F.col("timescale").isNotNull() & (F.col("timescale") > 0)
        & F.col("duration_ticks").isNotNull()
        & (F.col("duration_ticks") > 0)
    )
    last_idx = F.expr(f"(duration_ticks - 1) div {int(step_ticks)}")
    plan = (
        timing.withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0).cast("bigint"), last_idx)),
        )
        .withColumn("ts_ticks", F.col("frame_idx") * F.lit(int(step_ticks)))
        .withColumn("ts_ms", F.expr("ts_ticks * 1000 div timescale"))
        .select("url", "frame_idx", "ts_ticks", "ts_ms")
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["url", "frame_idx", "ts_ticks", "ts_ms"]].copy()
            out["frame"] = pd.Series(
                [grab(u, int(t))
                 for u, t in zip(pdf["url"], pdf["ts_ticks"])],
                dtype="object", index=out.index,
            )
            yield out

    return plan.mapInPandas(_kernel, FRAME_SCHEMA)


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
