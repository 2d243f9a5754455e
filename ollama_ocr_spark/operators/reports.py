"""Reporting operators (SURVEY §2.6 N4/N8/N9 and §2.5 A2/A4): top-k,
cardinality checks, cube/rollup summaries — all built-in aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k_largest(df: DataFrame, order_col: str, k: int = 20,
                  tiebreak: str | None = None) -> DataFrame:
    """Largest-docs report (N4). Deterministic tie-break column required for
    oracle-stable output."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return df.orderBy(*order).limit(k)


def cardinality_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact + approximate distinct counts (N8). The approx column is the
    one that scales (HLL sketch, no shuffle of raw values); exact is the
    oracle-checkable twin."""
    aggs = []
    for c in cols:
        aggs.append(F.countDistinct(c).alias(f"n_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"approx_{c}"))
    return df.agg(*aggs)


def cube_report(df: DataFrame, dims: list[str], value_col: str) -> DataFrame:
    """Metrics by every dim combination + grand total (N9)."""
    return (
        df.cube(*dims)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(value_col).alias("sum_value"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        )
    )


def summary_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group batch summary (A4): count/total/avg — the Spark analog of
    the reference's batch summary (`ollama_local_ocr.py:397-427`)."""
    return df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(value_col).alias("total_value"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
    )
