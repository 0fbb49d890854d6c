"""Named query plans — the engine's query API.

``queries.QUERIES`` maps query name → callable(spark, sf_dir) →
DataFrame; ``queries.ORACLES`` maps the same name → equivalent ANSI
SQL for the DuckDB correctness oracle. ``__spark_entry__`` re-exports
both for the driver.
"""

from tiki_data_pipeline_spark.plans.queries import ORACLES, QUERIES  # noqa: F401
