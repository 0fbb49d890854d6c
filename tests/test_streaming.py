"""Structured Streaming parity: the same transformations run as a
real streaming query (memory sink) must agree with their batch twins.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    return load_table(spark, SF, "events")


def test_tumbling_counts_stream_matches_batch(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.tumbling_counts(stream), "tumbling_out", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in jobs.tumbling_counts(_batch_events(spark)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_counts_stream_matches_batch(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.session_counts(stream), "session_out", "complete")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM session_out").collect()
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in jobs.session_counts(_batch_events(spark)).collect()
    )
    assert got == want
    assert len(got) > 0


def test_dedup_stream_first_per_key(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(jobs.dedup_stream(stream), "dedup_out", "append")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0]["n"]
    distinct_keys = (
        _batch_events(spark).select("user_id", "event_type").distinct().count()
    )
    assert n == distinct_keys


def test_cdc_foreach_batch_counts(spark):
    stream = jobs.events_stream(spark, SF)
    updates: list = []
    with tempfile.TemporaryDirectory() as ckpt:
        q = jobs.cdc_foreach_batch(stream, updates, ckpt)
        q.processAllAvailable()
        q.stop()
    assert updates, "no micro-batches processed"
    total_changes = sum(n for _, n in updates)
    # single-batch file source: every event is first_seen or a change
    batch = _batch_events(spark)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (
        batch.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNull() | (F.col("value") != F.col("prev")))
        .count()
    )
    assert total_changes == expected
