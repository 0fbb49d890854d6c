"""Table loaders for the driver-generated parquet star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under ``/root/testdata/sf{0.001,0.01,0.1}/``.

Parquet is the engine's native format: columnar, snappy-compressed,
predicate-pushdown and column-pruning come free from the DataSource
V2 scan. At 100 TB these would be directory-partitioned datasets;
the loaders take any path so partitioned layouts work unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are bounded by geography, not by data volume.
ALWAYS_BROADCAST = {"region", "nation"}


# (applicationId, sf_dir, table) → DataFrame. A DataFrame is an
# immutable lazy plan, so reusing it across queries is safe and skips
# re-reading parquet footers/schema on every one of the ~100 registry
# queries that start from the same ten tables. The fixture dirs are
# read-only; long-lived sessions that rewrite a table in place must
# call clear_table_cache() or the cached plan may pin a stale schema.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def clear_table_cache(sf_dir: str | None = None) -> int:
    """Invalidate cached table plans (all, or one sf_dir's). Returns
    the number of entries dropped. For sessions that rewrite fixture
    tables in place — the benchmark paths never do."""
    keys = [k for k in _TABLE_CACHE if sf_dir is None or k[1] == sf_dir]
    for k in keys:
        del _TABLE_CACHE[k]
    return len(keys)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    for k in list(_TABLE_CACHE):  # drop dead sessions' plans
        if k[0] != key[0]:
            del _TABLE_CACHE[k]
    _TABLE_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet TIMESTAMP(NANOS) columns (the events table) surface as
    # LongType under nanosAsLong; convert to micro-precision timestamps
    # (truncating division — matches DuckDB's ns→datetime truncation).
    from pyspark.sql import functions as F  # local import avoids cycle at module load
    from pyspark.sql import types as T

    ts_nanos_cols = {"ts"} if name == "events" else set()
    for field in df.schema.fields:
        if field.name not in ts_nanos_cols:
            continue
        if isinstance(field.dataType, T.LongType):
            # Integer `div`, not `/`: float division loses precision on
            # epoch-nanos magnitudes (2^53 < 1.7e18).
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            # Newer Spark readers surface parquet TIMESTAMP(NANOS) as
            # TIMESTAMP_NTZ. Event-time operators (withWatermark,
            # unix_micros) require the TZ-aware TIMESTAMP type; the
            # session TZ is pinned to UTC so the cast is value-preserving
            # and keeps DuckDB-oracle parity (duckdb is UTC-naive).
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table in the scale-factor directory, keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views for Spark SQL."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def fan_out_small(df: "DataFrame") -> "DataFrame":
    """Round-robin-repartition a DataFrame whose input has fewer
    splits than the cluster's parallelism. CPU-heavy per-row
    operators (md5-per-gram featurize, span hashing, regex token
    stats) otherwise run on one core when a small corpus is read as
    ONE file split. At scale input splits ≥ parallelism, so this is
    a no-op and the full-corpus shuffle never happens there.
    Round-robin, not hash: no key, no skew, not counted against the
    plan-quality hash-exchange budgets."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par) if df.rdd.getNumPartitions() < par else df
