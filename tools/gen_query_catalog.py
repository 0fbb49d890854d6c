#!/usr/bin/env python
"""Regenerate QUERIES.md from the query registry (run after adding
queries so the catalog stays in sync with the code)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tiki_data_pipeline_spark.plans.queries import ORACLES, QUERIES


def main() -> None:
    lines = [
        "# QUERIES — the engine's named query catalog",
        "",
        "Auto-generated from the registry (`tools/gen_query_catalog.py`).",
        "Every entry is callable as `queries()[name](spark, sf_dir)`; oracle =",
        "exact DuckDB value-hash compare, rows-only = no SQL-expressible oracle",
        "(pinned by tests instead).",
        "",
        "| # | query | check | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        doc = (fn.__doc__ or "").strip().split("\n")[0].strip()
        kind = "oracle" if name in ORACLES else "rows-only"
        lines.append(f"| {i} | `{name}` | {kind} | {doc} |")
    out = Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"{len(QUERIES)} queries -> {out}")


if __name__ == "__main__":
    main()
