"""Physical-plan audits.

"Would this plan survive a 100× scale-up?" is a property of the plan, not
the data — so we assert plan shape in tests the same way we assert results:
exchange counts, pushed filters, pruned scan schemas, broadcast joins,
whole-stage codegen coverage. Regressions that silently add a shuffle or
widen a scan fail CI here, long before they'd burn a cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    n_exchanges: int
    n_broadcasts: int
    pushed_filters: list[str]
    partition_filters: list[str]
    read_schemas: list[str]
    has_wholestage_codegen: bool
    raw: str


def plan_report(df: DataFrame) -> PlanReport:
    plan = df._jdf.queryExecution().executedPlan().toString()
    formatted = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    partition = re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted)
    schemas = re.findall(r"ReadSchema: (\S+)", formatted)
    return PlanReport(
        n_exchanges=plan.count("Exchange"),
        n_broadcasts=plan.count("BroadcastExchange")
        + plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        pushed_filters=[p for p in pushed if p.strip()],
        partition_filters=[p for p in partition if p.strip()],
        read_schemas=schemas,
        # the one-line plan renders codegen stages as "*(n) Op"; the tree
        # mode spells out "WholeStageCodegen" — accept either
        has_wholestage_codegen="WholeStageCodegen" in plan or "*(" in plan,
        raw=plan,
    )


def audit_plan(df: DataFrame, max_exchanges: int | None = None,
               require_pushed_filter: str | None = None,
               require_broadcast: bool = False,
               max_scan_columns: int | None = None,
               forbid_ops: list[str] | None = None) -> PlanReport:
    """Assert plan invariants; raises AssertionError with the plan attached.

    ``forbid_ops`` rejects physical operators by substring — e.g.
    ``["BroadcastNestedLoopJoin", "CartesianProduct"]`` to assert a join
    stayed an equi-join (the O(n²) plans that kill a 100× scale-up).
    """
    report = plan_report(df)
    problems = []
    for op in forbid_ops or []:
        if op in report.raw:
            problems.append(f"forbidden operator {op} present in plan")
    if max_exchanges is not None and report.n_exchanges > max_exchanges:
        problems.append(
            f"{report.n_exchanges} exchanges > allowed {max_exchanges}"
        )
    if require_pushed_filter is not None and not any(
        require_pushed_filter in p for p in report.pushed_filters
    ):
        problems.append(
            f"no pushed filter matching {require_pushed_filter!r} "
            f"(pushed: {report.pushed_filters})"
        )
    if require_broadcast and report.n_broadcasts == 0:
        problems.append("expected a broadcast join, found none")
    if max_scan_columns is not None:
        for schema in report.read_schemas:
            ncols = schema.count(":")
            if ncols > max_scan_columns:
                problems.append(
                    f"scan reads {ncols} columns > allowed {max_scan_columns}: "
                    f"{schema[:120]}"
                )
    if problems:
        raise AssertionError(
            "plan audit failed: " + "; ".join(problems) + "\n" + report.raw
        )
    return report
