"""Per-host template mining (applyInPandas cross-document operator)."""

from __future__ import annotations

from ollama_ocr_spark.operators.extract import synthesize_stage
from ollama_ocr_spark.operators.maintenance import latest_capture
from ollama_ocr_spark.operators.templates import mine_templates, sample_per_host


def test_sample_per_host_caps_groups(spark, documents_smoke):
    pages = synthesize_stage(documents_smoke)
    capped = sample_per_host(pages, max_docs=20)
    counts = capped.groupBy("__host").count().collect()
    assert max(r["count"] for r in counts) <= 20


def test_mine_templates_finds_chrome_not_content(spark, documents_smoke):
    pages = latest_capture(synthesize_stage(documents_smoke))
    out = mine_templates(pages, min_support=0.5).collect()
    assert out, "expected template blocks"
    h0 = [r for r in out if r["host"] == "h0.example.com"]
    blocks = {r["block"] for r in h0}
    # nav chrome repeats on every page of the host
    assert any("Section 0" in b for b in blocks)
    # footer chrome too
    assert any("Terms" in b for b in blocks)
    # real content never crosses the support threshold (unique per doc):
    # every mined block must be short chrome, not the 100+ char articles
    docs_text = {r["text"] for r in documents_smoke.limit(50).collect()}
    assert not (blocks & docs_text)
    # support values are sane
    assert all(0.5 <= r["support"] <= 1.0 for r in out)
