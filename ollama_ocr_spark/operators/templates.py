"""Per-host template mining — the cross-document boilerplate detector.

The per-document extractor (functions.htmltext) classifies blocks by local
signals (link density, drop tags). The *site-level* signal the big
extraction systems add on top is: a text block that repeats across many
pages of the same host is chrome/template, not content. That is inherently
cross-document-within-group logic — the legitimate ``applyInPandas`` case
(SURVEY §2.9): Spark shuffles pages by host, and the kernel sees one host's
pages together.

Scale shape: groupBy(host) is skew-prone (zipf hosts) — the stage is meant
to run on a per-host SAMPLE (template blocks repeat on every page, so ~100
pages/host suffice); ``sample_per_host`` applies that cap before the
shuffle so the mega-host never concentrates on one task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.htmltext import parse_html_blocks
from .maintenance import host_expr

TEMPLATE_SCHEMA = "host string, block string, support double, n_docs int"

# keep chrome containers VISIBLE for mining; drop only non-text subtrees
_MINING_DROP = frozenset({"script", "style", "noscript", "template",
                          "head", "title", "svg"})


def sample_per_host(pages: DataFrame, max_docs: int = 100) -> DataFrame:
    """Deterministic per-host cap: first max_docs urls per host (by url
    order). Bounds the biggest group before the groupBy-host shuffle."""
    w = Window.partitionBy("__host").orderBy("url")
    return (
        pages.withColumn("__host", host_expr())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_docs)
        .drop("__rn")
    )


def mine_templates(pages: DataFrame, min_support: float = 0.5,
                   max_docs_per_host: int = 100) -> DataFrame:
    """(host, block, support, n_docs): text blocks (pre-classification, ALL
    blocks incl. dropped chrome) appearing in >= min_support of the host's
    sampled pages."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        host = pdf["__host"].iloc[0]
        n_docs = len(pdf)
        counts: dict[str, int] = {}
        for payload in pdf["html"]:
            if payload is None:
                continue
            ext = parse_html_blocks(
                payload, drop_tags=_MINING_DROP, collect_blocks=True
            )
            for block in set(ext.all_blocks):
                counts[block] = counts.get(block, 0) + 1
        # support is the RAW quotient — presentation rounding happens in
        # engine expressions (Spark round == DuckDB round for positive
        # values; Python's banker's rounding does not match either).
        rows = [
            (host, block, c / n_docs, n_docs)
            for block, c in counts.items()
            if c / n_docs >= min_support
        ]
        return pd.DataFrame(rows, columns=["host", "block", "support", "n_docs"])

    sampled = sample_per_host(pages, max_docs_per_host)
    return (
        sampled.select("__host", "url", "html")
        .groupBy("__host")
        .applyInPandas(kernel, TEMPLATE_SCHEMA)
    )
