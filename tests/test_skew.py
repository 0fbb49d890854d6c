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


def test_band_join_aqe_splits_skewed_band_sig(spark, tmp_path):
    """Adversarial skew for the MinHash band join: one band_sig held
    by >10% of the stored docs but BELOW the hot-band cap (so the
    boilerplate anti-join does NOT remove it) must be split by AQE's
    skew-join rather than serialized into one straggler task. The
    above-cap case is handled by rebuild_hot_bands; this pins the
    below-cap case, which at 100 TB is the difference between one
    1-hour task and 32 two-minute ones."""
    from tiki_data_pipeline_spark.operators import dedup as DD

    # 1500 identical-text docs (same MinHash signature → one band_sig
    # per band holding 15% of the store, below HOT_BAND_CAP=10k) +
    # 500 unique docs
    boiler = "identical boilerplate header text repeated across the corpus " * 4
    rows = [(i, boiler) for i in range(1500)] + [
        (10_000 + i, f"unique document number {i} with words w{i} x{i} y{i} z{i}")
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / "skew_store")
    DD.write_minhash_index(docs, store)

    # a delta that also carries the boilerplate signature
    batch = spark.createDataFrame(
        [(50_000 + i, boiler) for i in range(200)], "doc_id long, text string"
    )

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # force a shuffle join and scale the skew thresholds down to
        # test-fixture bytes (at prod scale the defaults trigger the
        # same split; spark.session sets skewJoin.enabled=true)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")

        pairs = DD.minhash_index_near_dups(spark, store, batch, threshold=0.5)
        # collect() executes THIS DataFrame's queryExecution, so the
        # adaptive plan below is the final one (count() would spawn a
        # separate execution and leave this plan isFinalPlan=false)
        rows = pairs.collect()
        # every batch doc matches every boilerplate store doc
        assert len(rows) == 200 * 1500
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed band join:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
