#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is timed to full materialization (count + a write-free
collect of the aggregate output is avoided; count() forces the whole
plan). Total = sum of per-query wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tiki_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from tiki_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every registered query (the full §2 sweep is the bench).
BENCH_QUERIES = sorted(QUERIES)


def _sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    # Warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch classloading.
    QUERIES["q1_pricing_summary"](spark, SF_DIR).count()
    # Also warm the Arrow/Python worker pool: otherwise the first
    # pandas-UDF query in alphabetical order is charged ~1-2 s of
    # one-time worker spawn that is not part of its plan.
    import pandas as pd  # noqa: F401

    (
        spark.range(0, 64, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(lambda it: it, schema="id long")
        .count()
    )

    timings: dict[str, float] = {}
    failures: list[str] = []
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        try:
            n = QUERIES[name](spark, SF_DIR).count()
        except Exception as exc:  # one broken query must not kill the run
            failures.append(name)
            print(f"# {name}: FAILED ({exc})", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    if failures:
        print(f"# failed queries: {failures}", file=sys.stderr)
    payload = {
        "metric": "sum_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }
    # The driver records stdout with a bounded tail, which can truncate
    # the front of the per-query map; ALSO persist the full JSON to a
    # repo file so round-over-round diffs cover every query.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", str(Path(_REPO) / "bench_full_latest.json")
    )
    try:
        Path(out_path).write_text(json.dumps(payload, indent=1) + "\n")
    except OSError as exc:
        print(f"# could not write {out_path}: {exc}", file=sys.stderr)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
