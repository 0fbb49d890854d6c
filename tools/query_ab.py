"""Focused same-session query timer: run named registry queries at
$SPARK_GRAFT_SF_DIR with the bench's exact methodology (session
builds first, then min-of-N noop-sink evaluation per query) so an
optimization can be adjudicated inside ONE SparkSession instead of
across host-noise-separated bench files.

Usage: python tools/query_ab.py [-n RUNS] query1 query2 ...
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tiki_data_pipeline_spark.plans.queries import QUERIES  # noqa: E402
from tiki_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args or sorted(QUERIES)
    spark = get_spark(app_name="query_ab")
    QUERIES["q1_pricing_summary"](spark, SF_DIR).count()
    import pandas as pd  # noqa: F401

    (
        spark.range(0, 64, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(lambda it: it, schema="id long")
        .count()
    )
    from tiki_data_pipeline_spark.plans.llm_queries import SESSION_BUILDS

    needed = os.environ.get("SPARK_GRAFT_AB_BUILDS", "auto")
    if needed != "none":
        for bname, build in SESSION_BUILDS.items():
            t0 = time.perf_counter()
            build(spark, SF_DIR)
            print(
                f"# build {bname}: {time.perf_counter() - t0:.3f}s",
                file=sys.stderr,
            )
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()
