"""Physical-plan regression tests: the optimizations the engine
depends on must stay visible in the executed plan — a refactor that
silently drops a pushdown or broadcast would still pass value checks
but rot at scale.
"""

from __future__ import annotations

from tiki_data_pipeline_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # the scan must NOT read join keys it doesn't need
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "orders_top_by_price")
    # global top-N must be TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "customers_with_orders")
    assert "LeftSemi" in plan


def test_anti_join_stays_anti(spark):
    plan = _plan(spark, "customers_without_orders")
    assert "LeftAnti" in plan


def test_transform_has_no_python_udf(spark):
    # the whole transform stage must stay JVM-side (no BatchEvalPython
    # / ArrowEvalPython operators)
    plan = _plan(spark, "transform_products")
    assert "EvalPython" not in plan


def test_or_join_is_not_nested_loop(spark):
    plan = _plan(spark, "or_join_part_lineitem")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_plan_summary_utility(spark):
    from tiki_data_pipeline_spark.monitoring import assert_scalable, plan_summary

    df = QUERIES["q5_region_revenue"](spark, SF)
    s = plan_summary(df)
    assert s["n_scans"] == 6
    assert s["joins"].get("BroadcastHashJoin", 0) >= 4
    assert not s["python_eval"]
    # codegen spans only materialize in the string after AQE executes
    # the final plan, so no assertion on codegen_stages here
    assert any("ASIA" in p for p in s["pushed_filters"])
    assert_scalable(df)

    q1 = QUERIES["q1_pricing_summary"](spark, SF)
    # one scan, one partial/final agg boundary → exactly 1 exchange
    assert_scalable(q1, max_exchanges=1)


def test_ann_lsh_topk_is_bucket_equi_join(spark):
    # multi-probe LSH must stay a bucket equi-join: the probe set is
    # exploded on the broadcast query side, never a nested loop
    plan = _plan(spark, "embedding_ann_lsh_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_blocked_near_dup_has_no_nested_loop(spark):
    plan = _plan(spark, "embedding_near_dup_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dim_seller_broadcasts_nation(spark):
    plan = _plan(spark, "dim_seller_build")
    assert "BroadcastHashJoin" in plan
