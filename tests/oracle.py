"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL over the same parquet tables,
normalizes both results (columns sorted by name, rows sorted by all
values), and asserts exact equality — the driver compares via an
order-insensitive value hash, so anything weaker than exact equality
here would let hash mismatches through.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from tiki_data_pipeline_spark.io import TABLES


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Collapse -0.0 vs 0.0 and represent exactly.
        return repr(v + 0.0)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted(
        (tuple(_normalize_cell(row[i]) for i in order) for row in rows),
        key=_sort_key,
    )
    return sorted_cols, norm_rows


def compare_query(spark, sf_dir: str, fn, sql, name: str = "?"):
    if callable(sql):  # data-derived oracle: render against this sf_dir
        sql = sql(sf_dir)
    scols, srows = spark_result(fn(spark, sf_dir))
    with duckdb_connection(sf_dir) as con:
        ocols, orows = run_oracle(con, sql)

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    nscols, nsrows = normalize(scols, srows)
    nocols, norows = normalize(ocols, orows)
    assert len(nsrows) == len(norows), (
        f"{name}: row count spark={len(nsrows)} oracle={len(norows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(nsrows, norows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
