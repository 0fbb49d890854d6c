"""SQL-views facade (SURVEY.md §3.3 — the reference exposes its read
path as Postgres views; here every registered query can be mounted as
a temp view so downstream users live entirely in Spark SQL):

    from tiki_data_pipeline_spark.plans.views import register_query_views
    register_query_views(spark, sf_dir)
    spark.sql("SELECT * FROM vw_daily_sales WHERE revenue > 1e6")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tiki_data_pipeline_spark.io import register_views
from tiki_data_pipeline_spark.plans.queries import QUERIES


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Mount queries as temp views (lazy — nothing executes until
    queried). Returns the registered view names. Base tables are
    registered too, so views compose with ad-hoc SQL."""
    register_views(spark, sf_dir)
    registered = []
    for name in names or sorted(QUERIES):
        QUERIES[name](spark, sf_dir).createOrReplaceTempView(name)
        registered.append(name)
    return registered
