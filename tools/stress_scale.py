#!/usr/bin/env python
"""Scale-up stress harness: synthesize an N× copy of sf0.1 (shifted
keys) under /tmp and run the headline queries against it, printing
per-query timings. Evidence that the plans scale near-linearly —
run after significant plan changes.

Usage: python tools/stress_scale.py [N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

STRESS_QUERIES = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "vw_top_products_revenue",
    "latest_order_per_customer",
    "doc_exact_dedup",
    "doc_text_stats",
    "doc_minhash_lsh_near_dup",
    "doc_rolling_fingerprints",
    "vw_price_segment_analysis",
    # curation family — all narrow or single-shuffle; packing's window
    # runs at shard parallelism, decontamination broadcasts the bench set
    "doc_repetition_filter",
    "doc_stratified_sample",
    "doc_sequence_packing",
    "corpus_mix_weights",
    "doc_word_entropy",
    "doc_decontamination",
    "doc_sample_fixed_per_stratum",
    "corpus_curation_pipeline",
    "doc_pii_redaction",
    "daily_revenue_7d_ma",
    # round-6 additions: span-level dedup + staged embedding dedup
    "doc_duplicate_span_stats",
    "embedding_incremental_dedup_status",
    # NB: doc_simhash_near_dup output grows with the SQUARE of the
    # duplicate multiplicity under synthetic N× replication (every
    # copy pairs with every other) — run it at small N only.
]


def build(spark, dst: str, n: int) -> None:
    reps = spark.range(n).withColumnRenamed("id", "rep")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
        .write.parquet(f"{dst}/lineitem.parquet")
    )
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * 10_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * 1500)
        .drop("rep")
        .write.parquet(f"{dst}/orders.parquet")
    )
    (
        cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * 1500)
        .drop("rep")
        .write.parquet(f"{dst}/customer.parquet")
    )
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10000)
        .drop("rep")
        .write.parquet(f"{dst}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (
        # keep rep 0 ids intact so the registry's _QUERY_IDS still
        # exist; perturb replica vectors slightly so the N× corpus is
        # not pure duplicates (a degenerate ANN case)
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 100_000)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x: x + (F.col("rep") % 7).cast("float") * F.lit(0.001),
            ),
        )
        .drop("rep")
        .write.parquet(f"{dst}/embeddings.parquet")
    )
    for t in ["region", "nation", "supplier", "part", "events"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = f"/tmp/sf_stress_{n}x"
    spark = get_spark(app_name=f"stress{n}x")
    if not os.path.isdir(dst):
        os.makedirs(dst)
        build(spark, dst, n)
        print(f"generated {n}x dataset at {dst}")

    from tiki_data_pipeline_spark.plans.queries import QUERIES

    for q in STRESS_QUERIES:
        t0 = time.perf_counter()
        rows = QUERIES[q](spark, dst).count()
        print(f"{q}: {time.perf_counter() - t0:.2f}s ({rows} rows) at {n}x")

    # Persisted-ANN scale check: the index build is the only cost that
    # grows with the corpus; serve time must track probed-partition
    # bytes. Printed separately so build amortization is visible.
    from tiki_data_pipeline_spark.io import load_table
    from tiki_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, dst, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    for kind in ("lsh", "ivf"):
        path = f"{dst}/{kind}_index"
        t0 = time.perf_counter()
        if kind == "lsh":
            if not os.path.isdir(path):
                SIM.write_lsh_index(emb, path)
            built = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = SIM.lsh_index_topk(spark, path, queries, k=5, emit_radius=2).count()
        else:
            if not os.path.isdir(path):
                SIM.write_ivf_index(emb, path)
            built = time.perf_counter() - t0
            t0 = time.perf_counter()
            rows = SIM.ivf_index_topk(spark, path, queries, k=5).count()
        print(
            f"{kind}_index: build {built:.2f}s serve "
            f"{time.perf_counter() - t0:.2f}s ({rows} rows) at {n}x"
        )

    # Incremental-dedup scale check: store build amortized over the
    # corpus; the per-delta decision cost must track DELTA size, not
    # corpus size (the store contributes one broadcast-joined scan).
    from tiki_data_pipeline_spark.operators import dedup as DD

    docs = load_table(spark, dst, "documents")
    store = f"{dst}/mh_store"
    t0 = time.perf_counter()
    if not os.path.isdir(store):
        DD.write_minhash_index(docs.filter(F.col("doc_id") % 100 != 7), store)
    built = time.perf_counter() - t0
    delta = docs.filter(F.col("doc_id") % 100 == 7)  # ~1% arrives as a delta
    t0 = time.perf_counter()
    rows = DD.incremental_dedup_status(spark, store, delta).count()
    print(
        f"mh_store: build {built:.2f}s delta-decide "
        f"{time.perf_counter() - t0:.2f}s ({rows} docs) at {n}x"
    )

    # Distributed embedding dedup: a large delta vs the persisted LSH
    # index — no driver collect, probe replication query-side only.
    lsh_store = f"{dst}/lsh_even_index"
    even = emb.filter(F.col("vec_id") % 2 == 0)
    delta_emb = emb.filter(F.col("vec_id") % 100 == 7)
    t0 = time.perf_counter()
    if not os.path.isdir(lsh_store):
        SIM.write_lsh_index(even, lsh_store)
    built = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = SIM.lsh_index_near_dups(
        spark, lsh_store, delta_emb, threshold=0.45, emit_radius=2
    ).count()
    print(
        f"emb_incremental: build {built:.2f}s delta-match "
        f"{time.perf_counter() - t0:.2f}s ({rows} pairs) at {n}x"
    )


if __name__ == "__main__":
    main()
