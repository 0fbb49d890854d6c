"""Dump .explain("formatted") for every registry query to plans/<tag>/.

Usage:
    python tools/dump_plans.py before            # all queries -> plans/r14/<q>_before.txt
    python tools/dump_plans.py after q1 q2 ...   # subset -> plans/r14/<q>_after.txt

Env: SPARK_GRAFT_SF_DIR (default sf0.1), PLANS_DIR (default plans/r14).
Session builds run first (like bench.py) so index-backed serve plans
reflect the warm path, not the build.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tiki_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from tiki_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(os.environ.get("PLANS_DIR", "/root/repo/plans/r14"))
OUT.mkdir(parents=True, exist_ok=True)

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2:]


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def main() -> None:
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    from tiki_data_pipeline_spark.plans.llm_queries import SESSION_BUILDS

    for name, build in SESSION_BUILDS.items():
        try:
            build(spark, SF_DIR)
        except Exception as exc:
            print(f"# build {name}: FAILED ({exc})", file=sys.stderr)

    names = [n for n in sorted(QUERIES) if not only or n in only]
    fails = []
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            text = explain_formatted(df)
        except Exception as exc:
            fails.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}")
            continue
        (OUT / f"{name}_{suffix}.txt").write_text(text)
        n_ex = text.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in text
        ]
        py = [p for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas") if p in text]
        print(f"{name}: Exchange={n_ex} joins={joins} python={py}")
    if fails:
        print(f"FAILED: {fails}")


if __name__ == "__main__":
    main()
