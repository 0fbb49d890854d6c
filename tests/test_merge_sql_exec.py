"""Execute the rendered MERGE INTO, don't just string-compare it.

This environment has no Delta/Iceberg jars (and DuckDB 1.0 has no
MERGE statement), so the rendered statement is mechanically lowered
to DuckDB ``INSERT ... ON CONFLICT`` — the reference's own upsert
dialect (reference loader.py:232-293, postgres_storage.py:980-1012)
— executed against real tables, and the resulting table is compared
row-for-row with the Spark join-rewrite path. If the renderer emits a
wrong SET/INSERT clause, these tests fail on values, not substrings.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tiki_data_pipeline_spark.operators.merge import (
    insert_if_absent,
    merge_into_sql,
    upsert_overwrite,
    upsert_preserve_nonnull,
)

_MERGE_RE = re.compile(
    r'MERGE INTO (?P<target>\S+) t USING (?P<source>\S+) s'
    r' ON t\.(?P<key>"[^"]+") = s\.(?P=key)\n'
    r'(?:WHEN MATCHED THEN UPDATE SET (?P<sets>.*)\n)?'
    r'WHEN NOT MATCHED THEN INSERT \((?P<cols>.*)\) VALUES \((?P<vals>.*)\)$',
    re.S,
)


def merge_sql_to_duckdb(sql: str) -> str:
    """Lower the Spark-dialect MERGE to DuckDB INSERT..ON CONFLICT.

    Purely mechanical: backticks → double quotes, s.<col> → EXCLUDED
    (proposed row), t.<col> → bare column (stored row) — the standard
    MERGE ⇄ ON CONFLICT correspondence."""
    m = _MERGE_RE.match(sql.replace("`", '"'))
    assert m, f"renderer output did not parse:\n{sql}"
    g = m.groupdict()
    if g["sets"]:
        sets = re.sub(r's\.("[^"]+")', r'EXCLUDED.\1', g["sets"])
        sets = re.sub(r't\.("[^"]+")', r'\1', sets)
        action = f"DO UPDATE SET {sets}"
    else:
        action = "DO NOTHING"
    vals = re.sub(r's\.("[^"]+")', r'\1', g["vals"])
    return (
        f'INSERT INTO {g["target"]} ({g["cols"]}) '
        f'SELECT {vals} FROM {g["source"]} '
        f'ON CONFLICT ({g["key"]}) {action}'
    )


CURRENT = [
    (1, "widget", 10.0),
    (2, "", 20.0),
    (3, "gadget", None),
]
INCOMING = [
    (2, "gizmo", None),   # matched: name updates; price NULL
    (3, "", 35.0),        # matched: empty name; price updates
    (4, "doohickey", 4.5),  # not matched: fresh insert
]
COLUMNS = ["product_id", "name", "price"]


def _duck(mode, string_cols=None):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE products (product_id INT PRIMARY KEY, name TEXT, price DOUBLE)"
    )
    con.execute("CREATE TABLE staged (product_id INT, name TEXT, price DOUBLE)")
    con.executemany("INSERT INTO products VALUES (?, ?, ?)", CURRENT)
    con.executemany("INSERT INTO staged VALUES (?, ?, ?)", INCOMING)
    rendered = merge_into_sql(
        "products", "staged", "product_id", COLUMNS,
        mode=mode, string_cols=string_cols,
    )
    con.execute(merge_sql_to_duckdb(rendered))
    rows = con.execute(
        "SELECT product_id, name, price FROM products ORDER BY product_id"
    ).fetchall()
    con.close()
    return rows


def _spark_frames(spark):
    cur = spark.createDataFrame(CURRENT, schema="product_id int, name string, price double")
    inc = spark.createDataFrame(INCOMING, schema="product_id int, name string, price double")
    return cur, inc


def _rows(df):
    return sorted(
        tuple(r[c] for c in COLUMNS) for r in df.select(*COLUMNS).collect()
    )


def test_merge_overwrite_executes_like_join_rewrite(spark):
    cur, inc = _spark_frames(spark)
    assert _rows(upsert_overwrite(cur, inc, "product_id")) == _duck("overwrite")


def test_merge_preserve_nonnull_executes_like_join_rewrite(spark):
    cur, inc = _spark_frames(spark)
    got = _rows(upsert_preserve_nonnull(cur, inc, "product_id", ["name"]))
    assert got == _duck("preserve_nonnull", string_cols=["name"])


def test_merge_insert_if_absent_executes_like_join_rewrite(spark):
    cur, inc = _spark_frames(spark)
    assert _rows(insert_if_absent(cur, inc, "product_id")) == _duck(
        "insert_if_absent"
    )


def test_lowering_rejects_unparseable_statement():
    with pytest.raises(AssertionError):
        merge_sql_to_duckdb("UPDATE t SET x = 1")
