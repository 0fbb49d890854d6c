"""Mini driver simulation: vanilla SparkSession + __spark_entry__ contract.

Replicates the round driver: entry(spark) smoke check, then each
queries()[name](spark, sf_dir) vs oracle_sql()[name] in DuckDB —
columns sorted by name, rows order-insensitive, exact values.
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("MINI_SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1:]  # optional query-name filters

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("mini_driver")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

# --- entry smoke check ---
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}", flush=True)

# --- oracle compare ---
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\x1e".join(out).encode()).hexdigest()

queries = entrymod.queries()
if SF_DIR == entrymod.DRIVER_SF_DIR:
    oracles = entrymod.oracle_sql()
else:
    # oracle_sql() renders callable oracles (data-derived literals,
    # e.g. k-means centroids) against the REAL driver's sf0.01; when
    # mini-driving another SF, render them against that SF instead or
    # the literals come from the wrong table.
    from tiki_data_pipeline_spark.plans.queries import ORACLES

    oracles = {}
    for n, o in ORACLES.items():
        if callable(o):
            try:
                o = o(SF_DIR)
            except Exception:
                continue
        oracles[n] = o
names = [n for n in queries if not ONLY or n in ONLY]
fails = []
for name in names:
    try:
        sdf = queries[name](spark, SF_DIR)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = [f.name for f in sdf.schema.fields]
        if name not in oracles:
            print(f"  {name}: rows-only {len(s_rows)} (no oracle)", flush=True)
            continue
        o = con.execute(oracles[name])
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
        ok_rows = len(s_rows) == len(o_rows)
        ok_schema = sorted(s_cols) == sorted(o_cols)
        ok_hash = ok_schema and norm(s_rows, s_cols) == norm(o_rows, o_cols)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(
            f"  {name}: {status} rows={len(s_rows)}/{len(o_rows)} "
            f"schema={ok_schema} hash={ok_hash}",
            flush=True,
        )
    except Exception as e:
        fails.append(name)
        print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)

print(json.dumps({"total": len(names), "fails": fails}))
