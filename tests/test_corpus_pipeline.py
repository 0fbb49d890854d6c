"""End-to-end corpus pipeline: monotone stage funnel, restartable
artifacts, and the dedup/decontamination semantics composed correctly."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.corpus_pipeline import CorpusPipeline
from tiki_data_pipeline_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    pipe = CorpusPipeline(spark, str(tmp_path))
    report = pipe.run(
        docs,
        benchmark_pred=F.col("doc_id") % 20 == 0,
        near_dup_threshold=0.9,
        seq_len=512,
        n_shards=4,
    )

    # monotone funnel: every stage only removes documents
    order = [
        "input_docs",
        "after_quality",
        "after_exact_dedup",
        "after_near_dedup",
        "after_decontamination",
        "after_repetition",
        "after_sampling",
        "final_docs",
    ]
    vals = [report[k] for k in order]
    assert vals == sorted(vals, reverse=True), report
    assert report["final_docs"] > 0

    # every stage left a restartable parquet artifact
    for stage in ["quality", "redacted", "exact_dedup", "near_dedup",
                  "decontaminated", "repetition"]:
        assert (tmp_path / stage).exists(), stage

    # shards exist, one file per shard, rows = final_docs
    shard_dirs = sorted(Path(report["shard_dir"]).glob("shard=*"))
    assert len(shard_dirs) == 4
    total = spark.read.parquet(report["shard_dir"]).count()
    assert total == report["final_docs"]

    # the benchmark set is HELD OUT: no member reaches the output
    out_ids = {
        r["doc_id"] for r in spark.read.parquet(report["shard_dir"]).collect()
    }
    assert all(i % 20 != 0 for i in out_ids)
    assert report["after_decontamination"] <= report["after_near_dedup"]
