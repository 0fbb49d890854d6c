#!/usr/bin/env python
"""Streaming-sink throughput harness (judge-r11 ask #8): the sinks
are correctness-tested (crash replay, takedown idempotence) but were
never MEASURED. This times the two production sinks end to end on a
file-backed stream — the same foreachBatch code paths the tests pin —
and reports rows/sec plus the on-disk state the run leaves behind.

- ``dedup_sink``: N× replicated corpus split into K micro-batch files
  streamed through ``incremental_dedup_sink`` — every epoch statuses
  its batch against the persisted MinHash store (exact-first staged),
  writes an exactly-once decisions partition, and appends the unique
  survivors so later epochs dedup against earlier ones.
- ``takedown_sink``: a retirement stream over the same store —
  tombstone appends per epoch (idempotent by semantics), then ONE
  scheduled fold at the end (the physical rewrite never runs on the
  stream), timed separately.

Replicas are content-mutated (every other word rewritten with a
hash token keyed by (word, rep, doc)) so cross-replica similarity is
~0 — the mostly-unique regime a real ingest sees; rep%7==1 replicas
mutate only the first word and form genuine near-dup mass.

Usage: python tools/streaming_throughput.py [N] [K]
       (default N=10 replication, K=8 micro-batches)
One JSON line per sink; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/streaming_tp"


def mutated_corpus(spark, n: int):
    """N× content-mutated replicas of sf0.1's documents (the
    stress_incremental recipe, condensed)."""
    from tiki_data_pipeline_spark.io import load_table

    base = load_table(spark, SRC, "documents").select("doc_id", "text")
    reps = spark.range(n).select(F.col("id").alias("rep"))
    joined = base.crossJoin(reps)
    planted = F.col("rep") % 7 == 1
    words = F.split(F.col("text"), " ")
    mutated = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                planted & (i == 0) | (~planted & (i % 2 == 0)),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", w, F.col("rep").cast("string"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
            ).otherwise(w),
        ),
        " ",
    )
    return joined.select(
        (F.col("doc_id") + F.col("rep") * 10_000).alias("doc_id"),
        mutated.alias("text"),
    )


def du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _d, fns in os.walk(path)
        for f in fns
    )


def main() -> None:
    args = sys.argv[1:]
    backend = "posix"
    if "--backend" in args:
        i = args.index("--backend")
        backend = args[i + 1]
        os.environ["SPARK_GRAFT_STORE_BACKEND"] = backend
        args = args[:i] + args[i + 2:]
    n = int(args[0]) if len(args) > 0 else 10
    k = int(args[1]) if len(args) > 1 else 8
    spark = get_spark(app_name="streaming_throughput")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.sources.files import fold_tombstones
    from tiki_data_pipeline_spark.streaming.jobs import (
        incremental_dedup_sink,
        takedown_sink,
    )

    docs = mutated_corpus(spark, n)
    # store seed: rep 0; stream: everything else, one file per epoch
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
    n_stream = docs.count() - seed.count()

    schema = "doc_id long, text string"
    statuses: list = []
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src + "/_b=*")
    )
    t0 = time.perf_counter()
    q = incremental_dedup_sink(
        reader, store, statuses, f"{OUT}/ckpt_dedup"
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sink": "incremental_dedup_sink",
                "backend": backend,
                "replication": n,
                "epochs": len(statuses),
                "docs_streamed": n_stream,
                "wall_s": round(wall, 2),
                "docs_per_s": round(n_stream / wall, 1),
                "store_bytes": du(store),
                "decisions_bytes": du(store + "/_decisions")
                if os.path.isdir(store + "/_decisions")
                else 0,
            }
        )
    )

    # takedown stream: retire ~2% of the stored corpus in k batches
    from tiki_data_pipeline_spark.sources.files import store_sub

    stored = store_sub(spark, store, "_fingerprints").select(
        F.col("id").alias("doc_id")
    )
    victims = stored.filter(F.col("doc_id") % 50 == 3)
    td_src = f"{OUT}/takedowns"
    (
        victims.withColumn("_b", F.pmod(F.col("doc_id"), F.lit(k)))
        .repartition(k, "_b")
        .write.partitionBy("_b")
        .parquet(td_src)
    )
    n_td = victims.count()
    acks: list = []
    reader = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(td_src + "/_b=*")
    )
    t0 = time.perf_counter()
    q = takedown_sink(reader, store, acks, f"{OUT}/ckpt_td")
    q.awaitTermination()
    td_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    folded = fold_tombstones(spark, store)
    fold_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sink": "takedown_sink",
                "replication": n,
                "epochs": len(acks),
                "ids_retired": n_td,
                "wall_s": round(td_wall, 2),
                "ids_per_s": round(n_td / td_wall, 1),
                "scheduled_fold_s": round(fold_s, 2),
                "folded_ids": folded,
                "store_bytes_post_fold": du(store),
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
