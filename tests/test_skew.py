"""Salted join must be result-identical to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators.skew import salted_join, top_keys

SF = "/root/testdata/sf0.001"


def test_salted_join_identical_inner(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed("l_partkey", "partkey")
    part = load_table(spark, SF, "part").withColumnRenamed("p_partkey", "partkey")
    plain = li.join(part.select("partkey", "p_brand"), "partkey").groupBy(
        "p_brand"
    ).count()
    salted = salted_join(li, part.select("partkey", "p_brand"), "partkey").groupBy(
        "p_brand"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = orders.join(customer.select("custkey", "c_name"), "custkey", "left")
    salted = salted_join(
        orders, customer.select("custkey", "c_name"), "custkey", how="left"
    )
    assert plain.count() == salted.count()
    a = plain.groupBy("custkey").count()
    b = salted.groupBy("custkey").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_top_keys(spark):
    li = load_table(spark, SF, "lineitem")
    hot = top_keys(li, "l_partkey", k=5).collect()
    assert len(hot) == 5
    assert hot[0]["n_rows"] >= hot[-1]["n_rows"]
