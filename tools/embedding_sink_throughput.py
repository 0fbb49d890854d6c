#!/usr/bin/env python
"""Embedding-ingest sink throughput (the vector twin of the r12/r13
document-sink measurement): N× replicas of sf0.1's embeddings stream
through ``incremental_embedding_sink`` against a persisted LSH index
in k epochs — every epoch statuses its vectors (exact xxhash64 stage
+ LSH near stage), commits decisions, and appends the unique
vectors. Replicas rep%5==1 are exact copies of rep 0 (planted
cross-epoch dups); others get one perturbed component so they stay
distinct. Run per backend with ``--backend manifest``.

``--sink semantic`` measures ``incremental_semantic_sink`` instead
(persisted IVF index, frozen quantizer, home-list compare) on the
same corpus/epoch shape — the only ingest sink without a throughput
row until r14.

Usage: python tools/embedding_sink_throughput.py [N] [k] [--backend B]
       [--sink lsh|semantic]
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
OUT = "/tmp/embedding_sink_tp"


def replicated_vectors(spark, n: int):
    from tiki_data_pipeline_spark.io import load_table

    base = load_table(spark, SRC, "embeddings").select(
        F.col("vec_id"), F.col("embedding")
    )
    reps = spark.range(n).select(F.col("id").alias("rep"))
    joined = base.crossJoin(reps)
    planted = F.col("rep") % 5 == 1
    # non-planted replicas get deterministic-chaos vectors (cos of a
    # rep- and index-dependent phase): cosine vs any other replica ≈ 0,
    # so they status unique and the store GROWS epoch over epoch —
    # the append leg is part of what this measures. Planted replicas
    # stay exact copies of rep 0 (cross-epoch exact dups).
    perturbed = F.transform(
        "embedding",
        lambda x, i: F.when(
            planted, x
        ).otherwise(
            F.cos(x * (F.col("rep").cast("double") + F.lit(2.0)) + i)
        ),
    )
    return joined.select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        perturbed.cast("array<float>").alias("embedding"),
    )


def main() -> None:
    args = sys.argv[1:]
    backend = "posix"
    if "--backend" in args:
        i = args.index("--backend")
        backend = args[i + 1]
        os.environ["SPARK_GRAFT_STORE_BACKEND"] = backend
        args = args[:i] + args[i + 2:]
    sink = "lsh"
    if "--sink" in args:
        i = args.index("--sink")
        sink = args[i + 1]
        args = args[:i] + args[i + 2 :]
    n = int(args[0]) if len(args) > 0 else 10
    k = int(args[1]) if len(args) > 1 else 8
    spark = get_spark(app_name="embedding_sink_tp")
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    from tiki_data_pipeline_spark.operators import similarity as SIM
    from tiki_data_pipeline_spark.sources.files import store_data
    from tiki_data_pipeline_spark.streaming.jobs import (
        incremental_embedding_sink,
        incremental_semantic_sink,
    )

    vecs = replicated_vectors(spark, n)
    seed = vecs.filter(F.col("vec_id") < 10_000_000)
    stream_src = f"{OUT}/incoming"
    (
        vecs.filter(F.col("vec_id") >= 10_000_000)
        .withColumn("_b", F.pmod(F.col("vec_id"), F.lit(k)))
        .repartition(k, "_b")
        .write.partitionBy("_b")
        .parquet(stream_src)
    )
    if sink == "semantic":
        store = f"{OUT}/ivf_store"
        SIM.write_ivf_index(seed, store, n_centroids="auto")
    else:
        store = f"{OUT}/lsh_store"
        SIM.write_lsh_index(seed, store)
    n_stream = vecs.count() - seed.count()

    statuses: list = []
    reader = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src + "/_b=*")
    )
    t0 = time.perf_counter()
    make = (
        incremental_semantic_sink
        if sink == "semantic"
        else incremental_embedding_sink
    )
    q = make(reader, store, statuses, f"{OUT}/ckpt", threshold=0.999)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    stored = store_data(spark, store).count()
    print(
        json.dumps(
            {
                "sink": f"incremental_{'semantic' if sink == 'semantic' else 'embedding'}_sink",
                "backend": backend,
                "replication": n,
                "epochs": len(statuses),
                "vectors_streamed": n_stream,
                "wall_s": round(wall, 2),
                "vectors_per_s": round(n_stream / wall, 1),
                "rows_in_store": stored,
            }
        )
    )


if __name__ == "__main__":
    main()
