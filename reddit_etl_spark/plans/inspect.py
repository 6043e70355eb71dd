"""Physical-plan inspection helpers.

The scale contract (SURVEY §4.2, BASELINE.md) is enforced as tests:
filters must reach the parquet scan, projections must prune the read
schema, small-side joins must broadcast, top-k must plan as
TakeOrderedAndProject, and narrow stages must not introduce
exchanges. These helpers parse ``explain`` output so those properties
are assertable in CI rather than eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def _executed(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the final plan (AQE-resolved).
    Broadcast exchanges are not counted — they ship a small table, not
    a repartitioning of the big one."""
    plan = _executed(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in _executed(df) or "BroadcastNestedLoopJoin" in _executed(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in _executed(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per parquet scan — the pruning check:
    a scan reading all columns for a 2-column projection is wrong."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [
            c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c
        ]
        out.append(cols)
    return out


def whole_stage_codegen_ops(df: DataFrame) -> int:
    """Count of operators inside WholeStageCodegen spans (wider is
    better — each span is one fused JVM loop)."""
    plan = _executed(df)
    return plan.count("*(")
