#!/usr/bin/env python
"""Decompose the streaming dedup sink's per-epoch fixed cost
(judge-r12 ask #4): r12 measured ~9 s/epoch regardless of batch size
(620 docs/s at 10× vs 1753 at 100×) but never attributed it. This
tool replays the EXACT stage sequence of
``jobs.incremental_dedup_sink.process`` over k sequential static
batches of the 10× stress corpus — same store, same plans, no
streaming machinery — timing each stage per epoch:

  pin        batch localCheckpoint (pins the micro-batch once)
  shingles   shingle explode + localCheckpoint (shared by decide+append)
  probe      committed-decisions reuse probe (one isin aggregation)
  decide     incremental_dedup_status + localCheckpoint
  dec_write  (run, epoch)-partitioned decisions commit
  append     uniq/survivors/stored-ids anti-join + store append
  heartbeat  status.count()

It then runs the REAL streaming sink over the same batches into a
fresh twin store; (streaming wall − Σ stage walls) is the streaming
machinery's own share (offset tracking, trigger scheduling, epoch
commit). Usage: python tools/epoch_cost_decompose.py [N] [k]
(default N=10 replication — needs /tmp/sf_inc_10x — and k=8 epochs).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.session import get_spark

OUT = "/tmp/epoch_decompose"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="epoch_cost_decompose")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    from tools.streaming_throughput import mutated_corpus

    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.sources.files import store_sub
    from tiki_data_pipeline_spark.streaming import jobs

    docs = mutated_corpus(spark, n)
    seed = docs.filter(F.col("doc_id") < 10_000)
    stream_src = f"{OUT}/incoming"
    (
        docs.filter(F.col("doc_id") >= 10_000)
        .withColumn("_b", F.pmod(F.col("doc_id"), F.lit(k)))
        .repartition(k, "_b")
        .write.partitionBy("_b")
        .parquet(stream_src)
    )
    store = f"{OUT}/mh_store"
    DD.write_minhash_index(seed, store)

    ckpt = f"{OUT}/ckpt"
    run = jobs._run_lineage(ckpt)
    fallbacks = jobs._lineage_fallbacks(ckpt)
    stages = ["pin", "shingles", "probe", "decide", "dec_write", "append", "heartbeat"]
    per_stage = {s: 0.0 for s in stages}
    rows_total = 0
    t_manual0 = time.perf_counter()
    for epoch in range(k):
        batch = spark.read.parquet(f"{stream_src}/_b={epoch}")

        t = time.perf_counter()
        batch = batch.localCheckpoint()
        per_stage["pin"] += time.perf_counter() - t

        t = time.perf_counter()
        sh = DD.shingles(batch).localCheckpoint()
        per_stage["shingles"] += time.perf_counter() - t

        # the reuse probe exactly as _epoch_decisions runs it (one
        # isin aggregation; nothing to reuse here, the common case)
        t = time.perf_counter()
        committed = (
            spark.read.parquet(store + "/_decisions")
            if os.path.isdir(store + "/_decisions")
            else None
        )
        if committed is not None:
            keys = [run, *fallbacks, jobs.LEGACY_RUN]
            (
                committed.filter(
                    (F.col("epoch") == epoch) & F.col("run").isin(keys)
                )
                .groupBy("run")
                .agg(F.count(F.lit(1)))
                .collect()
            )
        per_stage["probe"] += time.perf_counter() - t

        t = time.perf_counter()
        status = DD.incremental_dedup_status(
            spark, store, batch, threshold=0.5, sh=sh
        ).localCheckpoint()
        per_stage["decide"] += time.perf_counter() - t

        t = time.perf_counter()
        (
            status.withColumn("run", F.lit(run))
            .withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run", "epoch")
            .parquet(store + "/_decisions")
        )
        per_stage["dec_write"] += time.perf_counter() - t

        t = time.perf_counter()
        uniq = batch.join(
            status.filter(F.col("status") == "unique").select("doc_id"),
            "doc_id",
            "semi",
        )
        survivors = DD.exact_dedup(uniq).select(
            F.col("survivor_id").alias("doc_id")
        )
        stored_ids = store_sub(spark, store, "_fingerprints").select(
            F.col("id").alias("doc_id")
        )
        to_add = (
            uniq.join(survivors, "doc_id", "semi")
            .join(stored_ids, "doc_id", "anti")
            .dropDuplicates(["doc_id"])
        )
        DD.append_minhash_index(to_add, store, sh=sh)
        per_stage["append"] += time.perf_counter() - t

        t = time.perf_counter()
        rows_total += status.count()
        per_stage["heartbeat"] += time.perf_counter() - t
    manual_wall = time.perf_counter() - t_manual0

    # the real streaming sink over the same batches, fresh twin store
    store2 = f"{OUT}/mh_store_stream"
    DD.write_minhash_index(seed, store2)
    statuses: list = []
    reader = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src + "/_b=*")
    )
    t0 = time.perf_counter()
    q = jobs.incremental_dedup_sink(reader, store2, statuses, ckpt)
    q.awaitTermination()
    stream_wall = time.perf_counter() - t0

    report = {
        "replication": n,
        "epochs": k,
        "rows_statused": rows_total,
        "per_stage_total_s": {s: round(v, 2) for s, v in per_stage.items()},
        "per_stage_per_epoch_s": {
            s: round(v / k, 2) for s, v in per_stage.items()
        },
        "manual_wall_s": round(manual_wall, 2),
        "stream_wall_s": round(stream_wall, 2),
        "stream_epochs": len(statuses),
        "machinery_share_s": round(stream_wall - manual_wall, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
