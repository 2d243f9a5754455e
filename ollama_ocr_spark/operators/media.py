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

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.media import image_metadata

IMAGE_META_SCHEMA = (
    "url string, format string, width int, height int, bytes bigint"
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


def image_features_stage(pages: DataFrame) -> DataFrame:
    """Feature extraction plumbing with a DETERMINISTIC FAKE kernel.

    The fake maps payload bytes → an 8-dim unit-norm vector derived from
    sha256 (stable across runs/machines). In production, replace the inner
    ``_fake_embed`` with a real vision encoder over ``decode_image`` — the
    batch shape, schema (array<float>), and partition amortization carry
    over unchanged.
    """

    def _fake_embed(payload: bytes | None) -> list[float]:
        if not payload:
            return [0.0] * FEATURE_DIM
        digest = hashlib.sha256(payload).digest()
        raw = [
            int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
            for i in range(FEATURE_DIM)
        ]
        norm = sum(x * x for x in raw) ** 0.5 or 1.0
        return [x / norm for x in raw]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_embed(p) for p in pdf["html"]]
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
