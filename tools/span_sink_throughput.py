#!/usr/bin/env python
"""Span-sink throughput (judge-r13 ask #7): ``incremental_span_sink``
is crash-replay tested but — unlike the doc/embedding sinks — never
had a measured throughput row. Same harness shape as
``streaming_throughput.py``: an N×-replicated content-mutated corpus
streams in K micro-batches against a seeded span-df store; every
epoch cleans its batch against the store df (+ within-batch df),
commits the cleaned docs as the epoch decision, and appends the
batch's window counts so later epochs cut spans that became
boilerplate earlier in the stream. rep%7==1 replicas mutate only
their first word, so most of their windows match rep 0 — genuine
heavy span-dup mass; other replicas mostly carry batch-internal
repetition only.

Usage: python tools/span_sink_throughput.py [N] [K] [--backend B]
One JSON line; paste into SCALE.md.
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
from tools.streaming_throughput import du, mutated_corpus

OUT = "/tmp/span_sink_tp"


def main() -> None:
    args = sys.argv[1:]
    backend = "posix"
    if "--backend" in args:
        i = args.index("--backend")
        backend = args[i + 1]
        os.environ["SPARK_GRAFT_STORE_BACKEND"] = backend
        args = args[:i] + args[i + 2 :]
    n = int(args[0]) if len(args) > 0 else 10
    k = int(args[1]) if len(args) > 1 else 8
    spark = get_spark(app_name="span_sink_tp")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.streaming.jobs import incremental_span_sink

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
    store = f"{OUT}/span_store"
    t0 = time.perf_counter()
    DD.write_span_df_store(seed, store, span=8, hash_mode="xxhash64")
    build_s = time.perf_counter() - t0
    n_stream = docs.count() - seed.count()

    statuses: list = []
    reader = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src + "/_b=*")
    )
    t0 = time.perf_counter()
    q = incremental_span_sink(
        reader, store, f"{OUT}/cleaned", f"{OUT}/ckpt", statuses, min_df=2
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    from tiki_data_pipeline_spark.sources.files import store_data

    cleaned = spark.read.parquet(f"{OUT}/cleaned")
    agg = cleaned.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens_removed").alias("tokens_removed"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "sink": "incremental_span_sink",
                "backend": backend,
                "replication": n,
                "epochs": len(statuses),
                "docs_streamed": n_stream,
                "wall_s": round(wall, 2),
                "docs_per_s": round(n_stream / wall, 1),
                "seed_build_s": round(build_s, 2),
                "cleaned_docs": agg["docs"],
                "tokens_removed": int(agg["tokens_removed"]),
                "store_rows": store_data(spark, store).count(),
                "store_bytes": du(store),
            }
        )
    )


if __name__ == "__main__":
    main()
