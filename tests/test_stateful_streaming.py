"""applyInPandasWithState change detector: streaming output must
match the batch lag-window computation."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.streaming import jobs
from tiki_data_pipeline_spark.streaming.stateful import stateful_change_detector

SF = "/root/testdata/sf0.001"


def test_stateful_change_detector_matches_batch(spark):
    stream = jobs.events_stream(spark, SF)
    jobs.run_to_memory(stateful_change_detector(stream), "stateful_out", "append")
    got = {
        (r["user_id"], r["event_id"]): (r["prev_value"], r["change_type"])
        for r in spark.sql("SELECT * FROM stateful_out").collect()
    }

    batch = load_table(spark, SF, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    expected_df = (
        batch.withColumn("prev_value", F.lag("value").over(w))
        .withColumn(
            "change_type",
            F.when(F.col("prev_value").isNull(), "first_seen")
            .when(F.col("value") > F.col("prev_value"), "increase")
            .when(F.col("value") < F.col("prev_value"), "decrease")
            .otherwise("no_change"),
        )
        .filter(F.col("change_type") != "no_change")
    )
    want = {
        (r["user_id"], r["event_id"]): (r["prev_value"], r["change_type"])
        for r in expected_df.collect()
    }
    assert got == want
    assert len(got) > 0
