"""Query registry.

Every engine query registers here with an optional DuckDB oracle.
The contract (driver's CORRECTNESS gate):

- the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle is ANSI SQL over the same parquet tables (pre-registered
  DuckDB views named region/nation/customer/supplier/part/orders/
  lineitem/events/documents/embeddings);
- column names must match EXACTLY (the compare sorts columns by name
  then hashes values), so both sides alias every computed column;
- floating-point aggregates are rounded on BOTH sides so that
  summation order (Spark partial aggs vs DuckDB) can't flip low bits;
- DuckDB's SUM(integer) returns HUGEINT — oracles cast to BIGINT to
  match Spark's LongType.

Queries with no SQL-expressible oracle (iterative algorithms,
streaming state) register with ``oracle=None`` and get the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle is either a SQL string or, for oracles whose SQL embeds
# data-derived literals (e.g. IVF centroids trained from the corpus),
# a callable ``(sf_dir) -> str`` rendered at compare time per sf.
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str | Callable[[str], str]] = {}


def query(
    name: str, oracle: str | Callable[[str], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Pandas UDFs pickle by module reference; make the package
            # importable on workers no matter the driver's cwd.
            from tiki_data_pipeline_spark.shipping import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
