"""SparkSession construction.

One place to build a session so every entry point (tests, bench,
__spark_entry__, CLI) gets the same scale-aware defaults:

- AQE on (runtime coalesce + skew-join handling) — at 100 TB the
  static shuffle-partition guess is always wrong somewhere; AQE
  re-plans per stage.
- shuffle partitions sized to the local core count for local[] runs;
  on a real cluster this is overridden by --conf (AQE coalesces down
  anyway).
- Arrow enabled so pandas_udf / createDataFrame(pandas) take the
  vectorized path.
- UTC session timezone so timestamp semantics match the DuckDB
  oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tiki_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` controls local parallelism (``local[cpus]``);
    ``shuffle_partitions`` defaults to ``cpus`` — on local mode more
    shuffle partitions than threads only adds task-scheduling
    overhead, and AQE coalesces small partitions regardless.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver's events.parquet carries TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in io.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
