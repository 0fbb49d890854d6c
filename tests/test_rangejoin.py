"""range_bucket_attach: the compiled (no-nested-loop) range join.

Semantics pinned against a plain non-equi join on the same data, plus
the operator's loud failure modes (oversized dim, overlapping
intervals) and the plan guarantee the operator exists for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.operators.rangejoin import range_bucket_attach


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("high", 20.0, 30.0)],
        schema="band string, lo double, hi double",
    )


def test_matches_nonequi_join(spark, dim):
    fact = spark.range(-5, 35).select(F.col("id").cast("double").alias("v"))
    got = range_bucket_attach(fact, dim, "v").orderBy("v").collect()
    want = (
        fact.join(dim, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .select("v", "band")
        .orderBy("v")
        .collect()
    )
    assert [(r.v, r.band) for r in got] == [(r.v, r.band) for r in want]
    # boundary pins: lo inclusive, hi exclusive, out-of-range dropped
    by_v = {r.v: r.band for r in got}
    assert by_v[0.0] == "low" and by_v[10.0] == "mid" and by_v[29.0] == "high"
    assert -1.0 not in by_v and 30.0 not in by_v


def test_plan_has_no_nested_loop(spark, dim):
    fact = spark.range(100).select(F.col("id").cast("double").alias("v"))
    plan = (
        range_bucket_attach(fact, dim, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan  # compiled to expressions: no join at all


def test_overlap_raises(spark):
    bad = spark.createDataFrame(
        [("a", 0.0, 15.0), ("b", 10.0, 20.0)], schema="band string, lo double, hi double"
    )
    fact = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="overlapping"):
        range_bucket_attach(fact, bad, "v")


def test_oversized_dim_raises(spark):
    big = spark.range(20).select(
        F.col("id").cast("string").alias("band"),
        F.col("id").cast("double").alias("lo"),
        (F.col("id") + 1).cast("double").alias("hi"),
    )
    fact = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="bucket-expansion"):
        range_bucket_attach(fact, big, "v", max_dim_rows=8)
