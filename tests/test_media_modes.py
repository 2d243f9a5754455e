"""Multimodal media ops + analysis modes (T8-T10) tests."""

from __future__ import annotations

import pytest

from ollama_ocr_spark.corpus import build_image, image_dims, receipt_fields
from ollama_ocr_spark.functions.media import (
    MediaDecodeUnavailable,
    decode_image,
    image_metadata,
    jpeg_dimensions,
    png_dimensions,
    sample_frames,
)
from ollama_ocr_spark.operators.extract import synthesize_stage
from ollama_ocr_spark.operators.maintenance import latest_capture
from ollama_ocr_spark.operators.media import (
    image_features_stage,
    image_metadata_stage,
)
from ollama_ocr_spark.operators.modes import (
    analyze_stage,
    multi_step_stage,
    structured_stage,
)


# ---------------------------------------------------------- pure media ----

def test_header_dimension_parsers():
    jpg = build_image(8)     # doc_id%20==8 → jpeg
    png = build_image(18)    # → png
    assert jpeg_dimensions(jpg) == image_dims(8)
    assert png_dimensions(png) == image_dims(18)
    assert image_metadata(jpg)[0] == "jpeg"
    assert image_metadata(png)[0] == "png"
    assert image_metadata(b"<html>") == (None, None, None)
    assert image_metadata(None) == (None, None, None)


def test_decode_stubs_raise_clearly():
    with pytest.raises(MediaDecodeUnavailable):
        decode_image(build_image(8))
    with pytest.raises(MediaDecodeUnavailable):
        sample_frames(b"\x00\x00\x00\x18ftypmp42")


# ------------------------------------------------------------- spark ------

def _pages(documents_smoke):
    return latest_capture(synthesize_stage(documents_smoke))


def test_image_metadata_stage(spark, documents_smoke):
    out = image_metadata_stage(_pages(documents_smoke)).filter(
        "format IS NOT NULL"
    )
    rows = out.collect()
    assert len(rows) == 50  # k=8 archetype
    for r in rows:
        assert r["format"] in ("jpeg", "png")
        assert r["width"] >= 100 and r["height"] >= 80


def test_image_features_deterministic(spark, documents_smoke):
    imgs = _pages(documents_smoke).filter("url LIKE '%.jpg'")
    a = {r["url"]: r["feature"] for r in image_features_stage(imgs).collect()}
    b = {r["url"]: r["feature"] for r in image_features_stage(imgs).collect()}
    assert a == b
    vec = next(iter(a.values()))
    assert len(vec) == 8
    assert abs(sum(x * x for x in vec) - 1.0) < 1e-5


def test_structured_stage_fields(spark, documents_smoke):
    out = structured_stage(_pages(documents_smoke)).filter("error IS NULL")
    rows = out.collect()
    assert len(rows) == 50  # k=5 archetype
    for r in rows:
        doc_id = int(r["url"].rsplit("-", 1)[1].split(".")[0])
        expected = receipt_fields(doc_id)
        assert r["store_name"] == expected["store_name"]
        assert r["total_cents"] == expected["total_cents"]
        assert r["n_items"] == expected["n_items"]


def test_analyze_and_multistep_share_semantics(spark, documents_smoke):
    pages = _pages(documents_smoke)
    meta = {r["url"]: r for r in analyze_stage(pages).collect()}
    multi = {r["url"]: r for r in multi_step_stage(pages).collect()}
    html_urls = [u for u in meta if u.endswith(".html") and "page-" not in u]
    assert html_urls
    for u in html_urls:
        assert meta[u]["title"] == multi[u]["title"]
        assert multi[u]["has_receipt"] == ("receipt-" in u)
    # memo archetype is the unstructured class
    memos = [u for u in html_urls if "memo-" in u]
    assert memos and all(meta[u]["doc_class"] == "plain" for u in memos)
