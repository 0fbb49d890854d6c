"""Scale-path evidence: bucketed tables co-locate joins with NO
shuffle — the 100 TB strategy for the lineitem⋈orders join that the
README/operator docstrings promise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .mode("overwrite")
        .saveAsTable("bucketed_lineitem")
    )
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .mode("overwrite")
        .saveAsTable("bucketed_orders")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketed_lineitem")
    spark.sql("DROP TABLE IF EXISTS bucketed_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bucketed_lineitem").join(
            spark.table("bucketed_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketed-by-key on both sides → zero Exchange operators
        assert "Exchange" not in plan, plan
        # and the join result is still correct
        expected = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
