#!/usr/bin/env python
"""10× plan gate for the doc/embedding/LLM query family (judge-r13
ask #4: the 68 relational/warehouse queries get a per-round sf1 sweep
with a zero-plan-violation gate — ``tools/sf1_relational.py`` — while
the doc/embedding registry had stress evidence at 10×–1000× but no
RECURRING per-round gate).

Corpus: ``stress_incremental.build_corpus`` replicas of sf0.1's
documents/embeddings (10× → 50k docs / 20k vectors, replica-mutated
text + planted near-dup clusters — the established stress shape), with
the relational tables passed through verbatim so the handful of
fixture-dim queries in this module set (category_*, transform, html/
json extraction) still run; their timing rows are not 10× claims.

For every registry query OUTSIDE the sf1_relational module set this
tool:
  1. pre-builds the session store artifacts (timed into ``builds`` —
     same build/serve split as bench.py);
  2. runs the query through full evaluation (noop sink), min of RUNS;
  3. audits the EXECUTED plan for scale-killers:
     - CartesianProduct / BroadcastNestedLoopJoin outside the
       documented bounded-side allowlist,
     - window functions with an empty PARTITION BY (global sort),
     - BatchEvalPython (a row-at-a-time Python UDF — everything
       Python-side must be Arrow-batched: ArrowEvalPython /
       MapInPandas / FlatMapGroupsInPandas).
Prints one JSON line (paste into SCALE.md); exits non-zero on any
plan violation.

Usage: python tools/sf_llm.py [--regen] [N]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

SRC = "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# the sf1_relational.py module set — everything else is this gate's
REL_MODULES = {
    "relational",
    "warehouse_queries",
    "views",
    "analytics_queries",
    "cdc_queries",
    "extras_queries",
    "streaming_queries",
}

# nested-loop/cartesian plans whose nested side is BOUNDED by
# construction (mirrors tests/test_plan_quality.py's allowlist)
BOUNDED_SIDE_NESTED_LOOP = {
    "dim_price_segment_build",
    "embedding_topk_cosine",
    "embedding_near_dup_pairs",
    "embedding_ann_ivf_topk",
    "embedding_knn_classify",
}

PASSTHROUGH = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
]


def generate(spark, dst: str, n: int) -> None:
    from tools.stress_incremental import build_corpus

    build_corpus(spark, dst, n)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        os.makedirs(f"{dst}/{t}.parquet", exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{dst}/{t}.parquet/part0.parquet' (FORMAT PARQUET)"
        )
    Path(f"{dst}/_GENERATED").write_text("ok\n")


def audit_plan(df, name: str) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = []
    if name not in BOUNDED_SIDE_NESTED_LOOP:
        hits += [
            m
            for m in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if m in plan
        ]
    if "BatchEvalPython" in plan:
        hits.append("row-at-a-time-python-udf")
    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        if not m.group(2).strip():
            hits.append("global-window")
    return hits


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--regen"]
    n = int(args[0]) if args else 10
    dst = f"/tmp/sf_llm_{n}x"

    from tiki_data_pipeline_spark.plans.queries import QUERIES
    from tiki_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="sf_llm_gate")
    if "--regen" in sys.argv or not os.path.exists(f"{dst}/_GENERATED"):
        t0 = time.perf_counter()
        generate(spark, dst, n)
        print(
            f"# generated {dst} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    targets = sorted(
        name
        for name, fn in QUERIES.items()
        if fn.__module__.rsplit(".", 1)[-1] not in REL_MODULES
    )

    from tiki_data_pipeline_spark.plans.llm_queries import SESSION_BUILDS

    builds: dict[str, float] = {}
    for bname, build in SESSION_BUILDS.items():
        t0 = time.perf_counter()
        try:
            build(spark, dst)
        except Exception as exc:
            print(f"# build {bname}: FAILED ({exc})", file=sys.stderr)
            continue
        builds[bname] = round(time.perf_counter() - t0, 3)
        print(f"# build {bname}: {builds[bname]:.2f}s", file=sys.stderr)

    out: dict = {
        "sf_mult": n,
        "n_queries": len(targets),
        "queries": {},
        "builds": builds,
    }
    bad: dict = {}
    failed: list[str] = []
    for name in targets:
        fn = QUERIES[name]
        best = None
        try:
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = fn(spark, dst)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            hits = audit_plan(fn(spark, dst), name)
        except Exception as exc:
            failed.append(name)
            print(f"# {name}: FAILED ({exc})", file=sys.stderr)
            continue
        if hits:
            bad[name] = hits
        out["queries"][name] = round(best, 3)
        print(f"# {name}: {best:.2f}s {hits or ''}", file=sys.stderr)
    out["total_s"] = round(sum(out["queries"].values()), 2)
    out["build_s"] = round(sum(builds.values()), 2)
    out["plan_violations"] = bad
    out["failed"] = failed
    print(json.dumps(out))
    assert not bad and not failed, f"plan violations {bad}, failed {failed}"


if __name__ == "__main__":
    main()
