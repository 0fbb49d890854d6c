#!/usr/bin/env python
"""sf1-equivalent scale evidence for the relational core (r8 verdict
ask #5: the LLM-operator family has measured 1x-1000x curves, but the
TPC-H-ish relational/warehouse queries had no data point beyond
sf0.1).

No network -> no DuckDB TPCH extension, so the corpus is a key-
shifted 10x replication of the driver's sf0.1 fixtures with TPC-H
sf1 PROPORTIONS (6M lineitem / 1.5M orders / 150k customer / 200k
part / 10k supplier; region+nation stay fixed like TPC-H). Replica
``rep`` offsets every key family by rep x stride, so referential
integrity holds within each replica and join fan-outs match the
original corpus — the plan SHAPES under test are the real ones.

For every query in the relational / warehouse / views modules this
tool:
  1. runs it at /tmp/sf1_synth through full evaluation (noop sink),
     min of RUNS runs;
  2. audits the executed plan for scale-killers: CartesianProduct,
     BroadcastNestedLoopJoin, and window functions with an empty
     PARTITION BY over a fact table (global-window sort).
Prints one JSON line; paste the table into SCALE.md.

Usage: python tools/sf1_relational.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = int(os.environ.get("SF1_REPS", "10"))  # 10 reps of sf0.1 = sf1
DST = "/tmp/sf1_synth" if REPS == 10 else f"/tmp/sfrel_{REPS}x"
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# key strides chosen far above the sf0.1 key ranges
OFFSETS = {
    "customer": [("c_custkey", 1_000_000)],
    "supplier": [("s_suppkey", 100_000)],
    "part": [("p_partkey", 1_000_000)],
    "orders": [("o_orderkey", 10_000_000), ("o_custkey", 1_000_000)],
    "lineitem": [
        ("l_orderkey", 10_000_000),
        ("l_partkey", 1_000_000),
        ("l_suppkey", 100_000),
    ],
    # events scale 10x too (r9 verdict ask #7): event ids and USER
    # ids offset per replica, so sessionization / as-of / dedup
    # per-user groups stay replica-local — per-user fan-outs match
    # the original corpus while the row count scales
    "events": [("event_id", 1_000_000), ("user_id", 100_000)],
}
COPY_AS_IS = ["region", "nation"]
# non-relational tables some fixture loaders expect to exist
PASSTHROUGH = ["documents", "embeddings"]


def generate() -> None:
    con = duckdb.connect()
    for t in COPY_AS_IS + PASSTHROUGH:
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{DST}/{t}.parquet/part0.parquet' (FORMAT PARQUET)"
        )
    for t, offs in OFFSETS.items():
        os.makedirs(f"{DST}/{t}.parquet", exist_ok=True)
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        off_map = dict(offs)
        for rep in range(REPS):
            sel = ", ".join(
                f"{c} + {rep * off_map[c]} AS {c}" if c in off_map else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{DST}/{t}.parquet/rep{rep}.parquet' (FORMAT PARQUET)"
            )
    Path(f"{DST}/_GENERATED").write_text("ok\n")


BAD_PLAN_MARKERS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def audit_plan(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m for m in BAD_PLAN_MARKERS if m in plan]
    # global window: a Window node whose partition spec is empty sorts
    # the whole input on one task — plan strings render as
    # "Window [exprs], [partition], [order]"
    import re

    for m in re.finditer(r"Window \[(.*?)\], \[(.*?)\]", plan):
        part_spec = m.group(2)
        if not part_spec.strip():
            hits.append("global-window")
    return hits


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(f"{DST}/_GENERATED"):
        t0 = time.perf_counter()
        generate()
        print(
            f"# generated {DST} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    from tiki_data_pipeline_spark.plans.queries import QUERIES
    from tiki_data_pipeline_spark.session import get_spark

    targets = sorted(
        n
        for n, fn in QUERIES.items()
        if fn.__module__.rsplit(".", 1)[-1]
        in (
            "relational",
            "warehouse_queries",
            "views",
            # fact-backed too (orders/lineitem scale 10x; the few
            # events/documents-backed entries run on the passthrough
            # copies — their plan audit still applies, their timing
            # rows are not sf1 claims)
            "analytics_queries",
            "cdc_queries",
            "extras_queries",
            # events family (sessionization, windows, as-of, top-k):
            # the events table scales 10x with replica-local users
            "streaming_queries",
        )
    )
    spark = get_spark()
    out: dict = {"sf": round(REPS / 10.0, 2), "n_queries": len(targets), "queries": {}}
    bad: dict = {}
    for name in targets:
        fn = QUERIES[name]
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, DST)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        hits = audit_plan(fn(spark, DST))
        if hits:
            bad[name] = hits
        out["queries"][name] = round(best, 3)
        print(f"# {name}: {best:.2f}s {hits or ''}", file=sys.stderr)
    out["total_s"] = round(sum(out["queries"].values()), 2)
    out["plan_violations"] = bad
    print(json.dumps(out))
    assert not bad, f"scale-killer plans at sf1: {bad}"


if __name__ == "__main__":
    main()
