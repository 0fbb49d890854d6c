"""range_bucket_attach: the compiled (no-nested-loop) range join.

Semantics pinned against a plain non-equi join on the same data, plus
the operator's loud failure modes (oversized dim, overlapping
intervals) and the plan guarantee the operator exists for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.operators.rangejoin import (
    range_bucket_attach,
    range_join_expanded,
)


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


@pytest.fixture(scope="module")
def overlapping_dim(spark):
    # a's hi (16.0) is an exact multiple of the 4.0 bucket width — the
    # upper-bound edge case where ceil(hi/w)-1 must exclude hi's own
    # bucket; b overlaps a; c is a sub-bucket sliver.
    return spark.createDataFrame(
        [("a", 0.0, 16.0), ("b", 10.0, 25.0), ("c", 24.0, 24.5)],
        schema="band string, lo double, hi double",
    )


def test_expanded_matches_nonequi_join(spark, overlapping_dim):
    fact = spark.range(-3, 30).select(F.col("id").cast("double").alias("v"))
    got = range_join_expanded(
        fact, overlapping_dim, "v", bucket_width=4.0
    ).collect()
    want = (
        fact.join(
            overlapping_dim,
            (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
        )
        .select("v", "band")
        .collect()
    )
    assert sorted((r.v, r.band) for r in got) == sorted(
        (r.v, r.band) for r in want
    )
    # overlap really exercised: 10.0-15.0 match both a and b
    assert sum(1 for r in got if r.v == 12.0) == 2
    # exact-multiple upper bound stays exclusive: a = [0, 16) with
    # bucket_width 4.0, so v=16.0 must match b only
    assert {r.band for r in got if r.v == 16.0} == {"b"}


def test_expanded_plan_is_hash_join(spark, overlapping_dim):
    fact = spark.range(100).select(F.col("id").cast("double").alias("v"))
    plan = (
        range_join_expanded(fact, overlapping_dim, "v", bucket_width=4.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_expanded_oversized_span_raises(spark):
    dim = spark.createDataFrame(
        [("wide", 0.0, 1e9)], schema="band string, lo double, hi double"
    )
    fact = spark.range(5).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="bucket_width"):
        range_join_expanded(fact, dim, "v", bucket_width=1.0)


def test_attribute_name_collision_raises(spark, dim):
    # a real join raises AMBIGUOUS_REFERENCE; the compiled rewrite
    # must not silently overwrite the fact's column instead
    fact = spark.range(5).select(
        F.col("id").cast("double").alias("v"), F.lit("mine").alias("band")
    )
    with pytest.raises(ValueError, match="band"):
        range_bucket_attach(fact, dim, "v")


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


def test_expanded_builds_on_dim_side(spark, overlapping_dim):
    """r14: the exploded dim is a stats-less local relation, so
    Catalyst picked the FACT side as the broadcast build side (fatal
    inversion at scale). The operator now measures the expanded dim
    row count and pins it with an explicit broadcast hint — the build
    side must be the dim (BuildRight with fact on the left)."""
    fact = spark.range(100).select(F.col("id").cast("double").alias("v"))
    plan = (
        range_join_expanded(fact, overlapping_dim, "v", bucket_width=4.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BuildRight" in plan
    assert "BuildLeft" not in plan
