"""CLI entry points (SURVEY.md §3.2 — the reference's module mains).

Usage:
    python -m tiki_data_pipeline_spark list
    python -m tiki_data_pipeline_spark run <query> [--sf-dir DIR] [--limit N]
    python -m tiki_data_pipeline_spark explain <query> [--sf-dir DIR]
    python -m tiki_data_pipeline_spark bench [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tiki_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list available queries")

    p_run = sub.add_parser("run", help="run a query and show results")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_run.add_argument("--limit", type=int, default=20)

    p_exp = sub.add_parser("explain", help="show the physical plan")
    p_exp.add_argument("query")
    p_exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    p_bench = sub.add_parser("bench", help="run the bench harness")
    p_bench.add_argument("--sf-dir", default=None)

    args = parser.parse_args(argv)

    from tiki_data_pipeline_spark.plans.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    if args.cmd in ("run", "explain"):
        if args.query not in QUERIES:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        from tiki_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name=f"cli:{args.query}")
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "bench":
        import os
        import runpy

        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        runpy.run_path(os.path.join(repo, "bench.py"), run_name="__main__")
        return 0

    return 2


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `... list | head`
        sys.exit(0)
