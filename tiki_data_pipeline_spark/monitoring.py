"""Plan introspection / profiling (SURVEY.md §4 — the reference's
timers and infrastructure monitors map to Spark's queryExecution).

``plan_summary`` condenses an executed plan into the facts that
matter for scale review: scan count and pushed filters, join
strategies, shuffle (Exchange) count, whether Python evaluation
leaked into the plan, and codegen coverage. Used by the plan
regression tests and handy at a REPL:

    from tiki_data_pipeline_spark.monitoring import plan_summary
    plan_summary(df)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_KINDS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def plan_summary(df: DataFrame) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    joins = {k: plan.count(k) for k in _JOIN_KINDS if k in plan}
    return {
        "n_scans": len(scans),
        "scan_columns": [s.count(",") + 1 if s else 0 for s in scans],
        "pushed_filters": [p for p in pushed if p],
        "joins": joins,
        "n_exchanges": plan.count("Exchange"),
        "python_eval": "EvalPython" in plan,
        "codegen_stages": plan.count("WholeStageCodegen"),
    }


def assert_scalable(df: DataFrame, max_exchanges: int | None = None) -> dict:
    """Raise if the plan shows the classic scale smells: a cartesian
    fallback or row-at-a-time Python in what should be a relational
    plan. Returns the summary for further checks."""
    s = plan_summary(df)
    if s["joins"].get("CartesianProduct"):
        raise AssertionError("plan contains a CartesianProduct")
    if max_exchanges is not None and s["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {s['n_exchanges']} exchanges (max {max_exchanges})"
        )
    return s
