#!/usr/bin/env python
"""Incremental-store scaling harness (r5 verdict ask #3).

Generates an N-times synthetic corpus from sf0.1's documents and
embeddings (5 000 docs / 2 000 vecs at 1x → 5M docs / 2M vecs at
1000x) and times the incremental-store family end to end:

  1. MinHash store build over the non-delta corpus (one-time cost,
     grows with corpus size — amortized across every later delta)
  2. 1%-delta ``incremental_dedup_status`` (the daily serve path —
     must track DELTA size, staying near-flat in corpus size except
     for the columnar store scan)
  3. Persisted-LSH embedding index build + delta
     ``lsh_index_near_dups`` (the distributed embedding-dedup path)
  4. Deletion lifecycle: tombstone the planted match targets + a ~1%
     bulk set, serve with tombstones pending, fold physically, serve
     again (the takedown path — asserts retired ids stop matching)
  5. K successive ``append_minhash_index`` deltas followed by
     ``compact_store`` (the maintenance path)

Replicas are content-mutated, not copied: replica ``rep`` of a doc
rewrites every other word with an md5 token keyed by (word, rep,
doc) so cross-replica 3-shingle Jaccard is ~0 — the corpus is
mostly unique, the realistic dedup regime. A planted slice
(rep % 50 == 1) mutates only the first word, forming genuine
near-dup clusters. Embedding replicas add deterministic sin-noise
(large for most reps → unique; tiny for the planted slice →
near-dup of the base vector).

Delta/store split (disjoint, with planted dups whose match target
is IN the store): delta = all reps of base % 100 == 7 (mostly
unique across reps) ∪ planted reps of base % 100 == 8 (whose
unmutated rep-0 twin stays in the store); store = everything else.
So the serve path must both pass-through the unique majority and
catch the planted minority against the persisted index.

Usage: python tools/stress_incremental.py [--compare-exhaustive] [N] [N...]
       (default: 1 10 100 1000)
Each level prints one JSON line; paste the table into SCALE.md.
``--compare-exhaustive`` additionally times the pre-r8 serve shape
(exhaustive probe masks + forced store-wide exact join) beside the
r8 auto defaults, with pair/dup-count parity in the same line.
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
APPENDS = 5  # successive ingest deltas before compaction


def build_corpus(spark, dst: str, n: int) -> None:
    reps = spark.range(n).withColumnRenamed("id", "rep")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    words = F.split(F.col("text"), " ")
    # Per-(word, rep, doc) token: alternate positions rewritten for
    # normal reps (near-zero shingle overlap with any other replica);
    # planted reps rewrite position 0 only (a true near-dup cluster).
    mutated = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                F.col("rep") == 0, w
            ).when(
                ((F.col("rep") % 50 == 1) & (i == 0))
                | ((F.col("rep") % 50 != 1) & ((i + F.col("rep")) % 2 == 0)),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_", w, F.col("rep"), F.col("doc_id"), i.cast("string")
                        )
                    ),
                    1,
                    6,
                ),
            ).otherwise(w),
        ),
        " ",
    )
    (
        docs.crossJoin(reps)
        .withColumn("text", mutated)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000)
        .drop("rep")
        .repartition(max(32, n // 8))
        .write.parquet(f"{dst}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    noise_scale = (
        F.when(F.col("rep") == 0, F.lit(0.0))
        .when(F.col("rep") % 50 == 1, F.lit(0.001))
        .otherwise(F.lit(0.3))
    )
    (
        emb.crossJoin(reps)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                # chirp noise: sin(c + b·i + a·i²) with per-(vec, rep)
                # coefficients. A linear phase (sin(φ + i)) lives in
                # the 2-D span of (sin i, cos i) — every noise vector
                # on one circle, so buckets collapse into mega-
                # clusters and the probe join measures the fixture's
                # pathology, not the engine. Distinct chirp rates are
                # near-orthogonal, giving each replica its own
                # pseudo-random direction.
                lambda x, i: (
                    x
                    + noise_scale
                    * F.sin(
                        (F.col("vec_id") * 7 + F.col("rep")) % 107
                        + ((F.col("vec_id") * 13 + F.col("rep") * 29) % 103)
                        * 0.113
                        * i.cast("double")
                        + ((F.col("vec_id") * 31 + F.col("rep") * 17) % 101)
                        * 0.0618
                        * i.cast("double")
                        * i.cast("double")
                    )
                ).cast("float"),
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 100_000)
        .drop("rep")
        .repartition(max(32, n // 16))
        .write.parquet(f"{dst}/embeddings.parquet")
    )


def deletion_stage(spark, store, docs, delta, doc_is_delta, out) -> None:
    """Takedown lifecycle: retire the planted slice's rep-0 match
    targets (so the delta's near-dups must flip) plus a ~1% bulk set,
    serve with tombstones PENDING (anti-join overhead must stay near
    the warm serve cost), fold physically, serve again. Pins that
    deletion is immediate at serve time and free after the fold, and
    the pointer-level invariant: NO surviving match references a
    retired id."""
    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.sources.files import (
        delete_from_store,
        fold_tombstones,
    )

    from tiki_data_pipeline_spark.sources.files import is_manifest_store

    manifest = is_manifest_store(store)
    victim_pred = (
        ((F.col("doc_id") % 10_000 % 100 == 8) & (F.col("doc_id") < 10_000))
        | (F.col("doc_id") % 97 == 0)
    ) & ~doc_is_delta
    victims = docs.filter(victim_pred).select(F.col("doc_id").alias("id"))
    # how many of the delta's current matches point AT a victim — the
    # takedown's expected effect size (at n≥10 this is the whole
    # planted slice; at 1× there are no planted reps and it may be 0)
    pre = DD.incremental_dedup_status(
        spark, store, delta.limit(out["delta_docs"])
    )
    out["matched_victims"] = (
        pre.join(
            victims.withColumnRenamed("id", "matched_id"), "matched_id", "semi"
        ).count()
    )
    # persist the pre-delete decisions as a lineage epoch (the layout
    # the streaming sinks write) so the fold's decisions scrub runs at
    # every level — the pointer invariant must hold for the PERSISTED
    # log, not just freshly computed serves. Both backends since r13:
    # posix writes the run/epoch-partitioned sidecar, manifest commits
    # the same scope as manifest entries (the streaming sinks' layout).
    if manifest:
        from tiki_data_pipeline_spark.sources import store_backend as MB

        MB.store_put(
            pre,
            store,
            mode="overwrite",
            sub="_decisions/run=stressrun/epoch=0",
        )
    else:
        (
            pre.withColumn("run", F.lit("stressrun"))
            .withColumn("epoch", F.lit(0))
            .write.mode("overwrite")
            .partitionBy("run", "epoch")
            .parquet(store + "/_decisions")
        )
    t0 = time.perf_counter()
    out["del_ids"] = delete_from_store(spark, store, victims)
    out["delete_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    post = DD.incremental_dedup_status(
        spark, store, delta.limit(out["delta_docs"])
    ).localCheckpoint()
    counts = {
        r["status"]: r["c"]
        for r in post.groupBy("status").agg(F.count("*").alias("c")).collect()
    }
    out["decide_tombstoned_s"] = round(time.perf_counter() - t0, 2)
    out["dups_tombstoned"] = counts.get("exact_dup", 0) + counts.get("near_dup", 0)
    # the deletion invariant: NO surviving match points at a retired id
    # (a doc whose best match was retired may legally re-match a live
    # runner-up, so total dup count is not the right assertion)
    still = (
        post.join(
            victims.withColumnRenamed("id", "matched_id"), "matched_id", "semi"
        ).count()
    )
    assert still == 0, (
        f"{still} surviving matches point at retired ids "
        f"(expected 0; {out['matched_victims']} pointed at them pre-delete)"
    )
    t0 = time.perf_counter()
    fold_tombstones(spark, store)
    out["fold_s"] = round(time.perf_counter() - t0, 2)
    # the lineage half of the invariant: post-fold, ZERO persisted
    # decision rows reference a retired id — neither as subject
    # (doc_id) nor through a matched_id pointer. Runs on BOTH
    # backends (r13: the manifest fold scrubs its _decisions entries
    # leaf-pruned, same contract as the posix sidecar scrub).
    from tiki_data_pipeline_spark.sources.files import store_sub

    dec_refs = (
        store_sub(spark, store, "_decisions")
        .select(F.explode(F.array("doc_id", "matched_id")).alias("id"))
        .join(victims, "id", "semi")
        .count()
    )
    assert dec_refs == 0, (
        f"{dec_refs} persisted decision rows still reference retired ids "
        f"(expected 0; {out['matched_victims']} pointed at them pre-delete)"
    )
    out["decision_victim_refs_post_fold"] = dec_refs
    t0 = time.perf_counter()
    DD.incremental_dedup_status(spark, store, delta.limit(out["delta_docs"])).count()
    out["decide_post_fold_s"] = round(time.perf_counter() - t0, 2)


def pruned_fold_stage(spark, dst: str, out: dict) -> None:
    """Pruned vs full fold on a store where pruning CAN win: the
    MinHash band store above is the adversarial worst case (every doc
    has a row in EVERY band partition, so any victim set touches all
    dirs and the pruned fold degenerates to the full rewrite plus the
    pre-scan). On a cid-partitioned IVF store a takedown is usually
    CONCENTRATED (one user, one source, one near-dup cluster — here:
    one centroid's list), so the pruned fold rewrites that list's
    share of the store and hardlinks the rest. Measures both paths on
    identical copies and asserts row parity."""
    import shutil as sh

    from tiki_data_pipeline_spark.io import load_table
    from tiki_data_pipeline_spark.operators import similarity as SIM
    from tiki_data_pipeline_spark.sources.files import (
        delete_from_store,
        fold_tombstones,
        store_data,
    )

    emb = load_table(spark, dst, "embeddings")
    base = f"{dst}/ivf_store_del"
    sh.rmtree(base, ignore_errors=True)
    t0 = time.perf_counter()
    SIM.write_ivf_index(emb, base, n_centroids="auto", partitioned=True)
    out["emb_store_build_s"] = round(time.perf_counter() - t0, 2)
    scan = store_data(spark, base)
    out["emb_total_parts"] = scan.select("cid").distinct().count()
    # a concentrated takedown: every vector in ONE centroid's list
    victim_cid = scan.groupBy("cid").count().orderBy("cid").first()["cid"]
    victims = scan.filter(F.col("cid") == victim_cid).select("id")
    out["emb_victims"] = victims.count()

    copies = {}
    for mode in ("pruned", "full"):
        cp = f"{base}_{mode}"
        sh.rmtree(cp, ignore_errors=True)
        # manifests carry RELATIVE paths, so a hardlink clone of the
        # whole tree is a valid independent store in either backend
        sh.copytree(base, cp, copy_function=os.link)
        delete_from_store(spark, cp, victims)
        t0 = time.perf_counter()
        fold_tombstones(spark, cp, prune=(mode == "pruned"))
        out[f"emb_fold_{mode}_s"] = round(time.perf_counter() - t0, 2)
        copies[mode] = cp
    n_p = store_data(spark, copies["pruned"]).count()
    n_f = store_data(spark, copies["full"]).count()
    assert n_p == n_f, f"pruned/full fold row mismatch: {n_p} != {n_f}"
    out["emb_rows_post_fold"] = n_p
    for cp in copies.values():
        sh.rmtree(cp, ignore_errors=True)
    sh.rmtree(base, ignore_errors=True)


def run_deletion_level(spark, n: int) -> dict:
    """--deletion-only: store build + pre-delete decide + the full
    deletion_stage (invariant included) at one level, skipping the
    DSIR/PQ/IVF-PQ/span stages — makes the 1000× invariant run a
    ~3-minute first-class harness mode instead of an ad-hoc script."""
    from tiki_data_pipeline_spark.io import load_table
    from tiki_data_pipeline_spark.operators import dedup as DD

    dst = f"/tmp/sf_inc_{n}x"
    marker = os.path.join(dst, "_GENERATED")
    if os.path.isdir(dst) and not os.path.exists(marker):
        shutil.rmtree(dst)
        print(f"# discarded partial {dst} (no completeness marker)",
              file=sys.stderr)
    if not os.path.isdir(dst):
        os.makedirs(dst)
        build_corpus(spark, dst, n)
        open(marker, "w").write("ok\n")

    out: dict = {"n": n, "stage": "deletion_only"}
    docs = load_table(spark, dst, "documents")
    doc_base = F.col("doc_id") % 10_000
    doc_rep = (F.col("doc_id") / 10_000).cast("long")
    doc_is_delta = (doc_base % 100 == 7) | (
        (doc_base % 100 == 8) & (doc_rep % 50 == 1)
    )
    store = f"{dst}/mh_store_del"
    shutil.rmtree(store, ignore_errors=True)
    t0 = time.perf_counter()
    DD.write_minhash_index(docs.filter(~doc_is_delta), store)
    out["store_build_s"] = round(time.perf_counter() - t0, 2)
    from tiki_data_pipeline_spark.sources.files import (
        expire_store_versions,
        rollback_store,
        snapshot_store,
    )

    out["backend"] = (
        "manifest"
        if os.environ.get("SPARK_GRAFT_STORE_BACKEND") == "manifest"
        else "posix"
    )
    # versioning cost at scale: posix = a hardlink tree over every
    # store file; manifest = ONE small JSON put. Rollback: posix =
    # staged hardlink swap; manifest = one manifest commit.
    t0 = time.perf_counter()
    v1 = snapshot_store(store, tag="pre-takedown")
    out["snapshot_s"] = round(time.perf_counter() - t0, 3)
    delta = docs.filter(doc_is_delta)
    t0 = time.perf_counter()
    decided = DD.incremental_dedup_status(spark, store, delta)
    out["delta_docs"] = decided.count()
    out["decide_before_s"] = round(time.perf_counter() - t0, 2)
    out["dups_before"] = decided.filter(F.col("status") != "unique").count()
    deletion_stage(spark, store, docs, delta, doc_is_delta, out)
    t0 = time.perf_counter()
    v2 = snapshot_store(store)
    out["snapshot_post_fold_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    rollback_store(store, v1)
    out["rollback_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    rollback_store(store, v2)  # roll forward to the post-fold state
    out["roll_forward_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["expired"] = expire_store_versions(store, keep_last=1)
    out["expire_s"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(store, ignore_errors=True)
    pruned_fold_stage(spark, dst, out)
    return out


def run_level(spark, n: int) -> dict:
    from tiki_data_pipeline_spark.io import load_table
    from tiki_data_pipeline_spark.operators import dedup as DD
    from tiki_data_pipeline_spark.operators import similarity as SIM
    from tiki_data_pipeline_spark.sources.files import compact_store

    dst = f"/tmp/sf_inc_{n}x"
    marker = os.path.join(dst, "_GENERATED")
    if os.path.isdir(dst) and not os.path.exists(marker):
        # a crashed/killed generation left a partial corpus — a rerun
        # would otherwise silently measure a fraction of the level
        shutil.rmtree(dst)
        print(f"# discarded partial {dst} (no completeness marker)",
              file=sys.stderr)
    if not os.path.isdir(dst):
        os.makedirs(dst)
        t0 = time.perf_counter()
        build_corpus(spark, dst, n)
        open(marker, "w").write("ok\n")
        print(f"# generated {n}x at {dst} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    out: dict = {"n": n}
    docs = load_table(spark, dst, "documents")
    out["docs"] = docs.count()

    # delta = unique-majority slice ∪ planted near-dups of store docs
    doc_base = F.col("doc_id") % 10_000
    doc_rep = (F.col("doc_id") / 10_000).cast("long")
    doc_is_delta = (doc_base % 100 == 7) | (
        (doc_base % 100 == 8) & (doc_rep % 50 == 1)
    )

    # 1. store build over the non-delta corpus
    store = f"{dst}/mh_store"
    shutil.rmtree(store, ignore_errors=True)
    base = docs.filter(~doc_is_delta)
    t0 = time.perf_counter()
    DD.write_minhash_index(base, store)
    out["store_build_s"] = round(time.perf_counter() - t0, 2)

    # 2. ~1% delta decided against the store (the daily serve path)
    delta = docs.filter(doc_is_delta)
    t0 = time.perf_counter()
    decided = DD.incremental_dedup_status(spark, store, delta)
    out["delta_docs"] = decided.count()
    out["delta_decide_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["delta_dups"] = (
        decided.filter(F.col("status") != "unique").count()
        if "status" in decided.columns
        else None
    )
    out["delta_decide2_s"] = round(time.perf_counter() - t0, 2)

    # 2b. DSIR importance weights over the full replicated corpus
    # (target = the en slice). One featurize pass per corpus, bucket
    # table broadcast; must scale ~linearly in total token count.
    from tiki_data_pipeline_spark.operators import curation as CU

    t0 = time.perf_counter()
    dsir = CU.dsir_log_weights(docs, docs.filter(F.col("lang") == "en"))
    out["dsir_mean_en"] = round(
        dsir.join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") == "en")
        .agg(F.avg("log_weight")).collect()[0][0], 4,
    )
    out["dsir_weights_s"] = round(time.perf_counter() - t0, 2)
    # production hash mode (r10): same estimator, xxhash64 token
    # hashing with no bigram strings — the sign check pins that the
    # cheap mode still separates the target slice
    t0 = time.perf_counter()
    dx = CU.dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), hash="xxhash64"
    )
    means_xx = {
        r["is_en"]: r["m"]
        for r in dx.join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("log_weight").isNotNull())
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    out["dsir_weights_xx_s"] = round(time.perf_counter() - t0, 2)
    assert means_xx[True] > means_xx[False], (
        f"xxhash64 DSIR lost target separation: {means_xx}"
    )

    # 2b2. PQ: compress the embedding corpus to 16 codes/vector, then
    # serve 10 queries by pure ADC (codes-only scan) and by
    # ADC-shortlist + exact refine; recall of the refined path vs
    # brute force is the pin (measured 1.0 at every level).
    emb_all = load_table(spark, dst, "embeddings")
    pq_path = f"{dst}/pq_index"
    shutil.rmtree(pq_path, ignore_errors=True)
    t0 = time.perf_counter()
    SIM.write_pq_index(emb_all, pq_path)
    out["pq_build_s"] = round(time.perf_counter() - t0, 2)
    qids = list(range(10))
    pq_queries = emb_all.filter(F.col("vec_id").isin(qids))
    t0 = time.perf_counter()
    adc = SIM.pq_index_topk(spark, pq_path, pq_queries, k=5)
    out["pq_adc_rows"] = adc.count()
    out["pq_adc_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ref = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.pq_index_topk(
            spark, pq_path, pq_queries, k=5, refine_with=emb_all
        ).collect()
    }
    out["pq_refined_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb_all, qids, k=5).collect()
    }
    out["pq_truth_s"] = round(time.perf_counter() - t0, 2)
    out["pq_refined_recall"] = round(len(ref & exact) / len(exact), 3)
    assert out["pq_refined_recall"] >= 0.9, (
        f"PQ refined recall pin failed: {out['pq_refined_recall']}"
    )

    # 2b3. IVF-PQ: the composed serve (probe pruning x 16-byte code
    # rows). Build includes the r9 nprobe CALIBRATION pass (full-
    # probe ADC over a 16-query held-in sample -> calibrated_nprobe
    # in store meta); serve trusts meta. Recall vs the same brute-
    # force truth is PINNED >= 0.9 at every level — the r8 composed-
    # path hole (0.88 at 100x under the 1/16 floor alone).
    from tiki_data_pipeline_spark.sources.files import read_store_meta

    ivfpq_path = f"{dst}/ivfpq_index"
    shutil.rmtree(ivfpq_path, ignore_errors=True)
    t0 = time.perf_counter()
    SIM.write_ivfpq_index(emb_all, ivfpq_path, n_centroids="auto")
    out["ivfpq_build_s"] = round(time.perf_counter() - t0, 2)
    out["ivfpq_nprobe"] = (read_store_meta(ivfpq_path) or {}).get(
        "calibrated_nprobe"
    )
    t0 = time.perf_counter()
    ipr = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivfpq_index_topk(
            spark, ivfpq_path, pq_queries, k=5, refine_with=emb_all
        ).collect()
    }
    out["ivfpq_refined_s"] = round(time.perf_counter() - t0, 2)
    out["ivfpq_refined_recall"] = round(len(ipr & exact) / len(exact), 3)
    assert out["ivfpq_refined_recall"] >= 0.9, (
        f"IVF-PQ composed recall pin failed: {out['ivfpq_refined_recall']}"
    )
    t0 = time.perf_counter()
    out["ivfpq_adc_rows"] = SIM.ivfpq_index_topk(
        spark, ivfpq_path, pq_queries, k=5
    ).count()
    out["ivfpq_adc_s"] = round(time.perf_counter() - t0, 2)

    # 2c. line-level dedup removal, worst case: a boilerplate footer
    # line is appended to EVERY doc, so every doc is affected and the
    # text-reassembly path (the expensive half) runs corpus-wide.
    t0 = time.perf_counter()
    ld = DD.remove_duplicate_lines(
        docs.withColumn(
            "text",
            F.concat(F.col("text"), F.lit("\nall rights reserved worldwide")),
        )
    )
    out["line_dedup_affected"] = ld.filter(
        F.col("n_lines_removed") > 0
    ).count()
    out["line_dedup_s"] = round(time.perf_counter() - t0, 2)

    # 2c2. variable-length span removal (r9): plant a 32-token
    # boilerplate block on a 1-in-20 slice so the run-merge path (the
    # gaps-and-islands window over covered positions) has real long
    # runs to merge, while the unplanted majority exercises the
    # narrow passthrough. Timed end to end through full evaluation.
    block = " ".join(f"legalterm{i}" for i in range(32))
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(F.col("text"), F.lit(" " + block)),
        ).otherwise(F.col("text")),
    )
    t0 = time.perf_counter()
    sr = DD.remove_duplicate_spans(planted, min_run=30)
    out["span_var_cut_docs"] = sr.filter(F.col("n_tokens_removed") > 0).count()
    out["span_var_s"] = round(time.perf_counter() - t0, 2)

    # 2d. training-shard assignment + mix-budget sampling (both must
    # stay ~linear: one shuffle each, text never shuffles in apply_mix)
    t0 = time.perf_counter()
    shards = CU.shard_assignment(docs, 64)
    out["shard_max_pos"] = shards.agg(F.max("pos")).collect()[0][0]
    out["shard_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    mix = CU.apply_mix(
        docs,
        {"en": 500_000, "zh": 250_000, "fr": 250_000},
        token_budget=20_000 * n,
    )
    out["mix_docs"] = mix.count()
    out["mix_s"] = round(time.perf_counter() - t0, 2)

    # 3. embedding incremental near-dup vs persisted LSH index
    emb = load_table(spark, dst, "embeddings")
    out["vecs"] = emb.count()
    vec_base = F.col("vec_id") % 100_000
    vec_rep = (F.col("vec_id") / 100_000).cast("long")
    vec_is_delta = (vec_base % 100 == 7) | (
        (vec_base % 100 == 8) & (vec_rep % 50 == 1)
    )
    lsh_store = f"{dst}/lsh_store"
    shutil.rmtree(lsh_store, ignore_errors=True)
    t0 = time.perf_counter()
    # "auto" scales the plane count with the corpus so mean bucket
    # occupancy (→ probe-join fan-out) stays ~flat across levels
    SIM.write_lsh_index(emb.filter(~vec_is_delta), lsh_store, n_planes="auto")
    out["lsh_build_s"] = round(time.perf_counter() - t0, 2)
    delta_emb = emb.filter(vec_is_delta)
    # DEFAULT serve path: probe_planes/skip_hot_buckets/exact_stage
    # all "auto" — at >= DIRECTED_PROBE_MIN_ROWS store rows this is
    # the directed multi-probe + (zero-dup-mass) exact short-circuit
    # a default caller gets since r8
    from tiki_data_pipeline_spark.sources.files import read_store_meta

    out["lsh_meta"] = {
        k: v
        for k, v in (read_store_meta(lsh_store) or {}).items()
        if k in ("n_planes", "n_rows", "n_distinct_vectors")
    }
    t0 = time.perf_counter()
    out["emb_pairs"] = SIM.lsh_index_near_dups(
        spark, lsh_store, delta_emb, threshold=0.9, emit_radius=2
    ).count()
    out["emb_delta_s"] = round(time.perf_counter() - t0, 2)
    # staged per-vector decision (exact-first, near on the remainder)
    t0 = time.perf_counter()
    status = SIM.lsh_index_dedup_status(
        spark, lsh_store, delta_emb, threshold=0.9, emit_radius=2
    )
    out["emb_status_dups"] = status.filter(F.col("status") != "unique").count()
    out["emb_status_s"] = round(time.perf_counter() - t0, 2)
    if COMPARE_EXHAUSTIVE:
        # the pre-r8 default, for the side-by-side: exhaustive probe
        # masks + forced store-wide exact join. Pair/dup counts must
        # agree with the default path (recall parity at this corpus).
        t0 = time.perf_counter()
        out["emb_pairs_exhaustive"] = SIM.lsh_index_near_dups(
            spark, lsh_store, delta_emb, threshold=0.9, emit_radius=2,
            probe_planes=None,
        ).count()
        out["emb_delta_exhaustive_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        st_ex = SIM.lsh_index_dedup_status(
            spark, lsh_store, delta_emb, threshold=0.9, emit_radius=2,
            probe_planes=None, exact_stage=True,
        )
        out["emb_status_dups_exhaustive"] = st_ex.filter(
            F.col("status") != "unique"
        ).count()
        out["emb_status_exhaustive_s"] = round(time.perf_counter() - t0, 2)

    # 3a-cal. measured-recall plane calibration (r11): auto planes
    # target ~200 rows/bucket for the MEAN corpus; every extra plane
    # halves bucket occupancy (→ candidate volume through the scoring
    # join, the measured 2M-vector serve cost) at a recall price
    # calibrate_lsh_planes MEASURES on a sample instead of guessing.
    # Build a second store at the calibrated count, serve the same
    # delta, and pin: (a) planted-dup recovery must not drop below
    # the default store's, (b) the serve should not be slower.
    t0 = time.perf_counter()
    # ground truth for the calibration: the pairs the DEFAULT store's
    # serve finds for this delta (near-dups are ~40 in 200k vectors
    # here — far too rare for calibrate's uniform sample to contain
    # any; the r11 first run measured n_true_pairs=0 and a vacuous
    # floor fallback). Endpoints span delta+store, so the vector
    # source is the full emb frame.
    true_pairs = SIM.lsh_index_near_dups(
        spark, lsh_store, delta_emb, threshold=0.9, emit_radius=2
    ).select("new_id", "old_id")
    cal = SIM.calibrate_lsh_planes(
        spark,
        emb,
        threshold=0.9,
        target_recall=0.95,
        n_rows=out["lsh_meta"].get("n_rows"),
        pairs=true_pairs,
    )
    out["lsh_cal"] = {
        k: cal[k]
        for k in (
            "n_planes",
            "floor",
            "achieved_on_sample",
            "n_true_pairs",
            "pairs_source",
        )
    }
    out["lsh_cal_s"] = round(time.perf_counter() - t0, 2)
    if cal["n_planes"] > cal["floor"]:
        cal_store = f"{dst}/lsh_store_cal"
        shutil.rmtree(cal_store, ignore_errors=True)
        t0 = time.perf_counter()
        SIM.write_lsh_index(
            emb.filter(~vec_is_delta), cal_store, n_planes=cal["n_planes"]
        )
        out["lsh_cal_build_s"] = round(time.perf_counter() - t0, 2)
        planted_delta = delta_emb.filter(
            (vec_base % 100 == 8) & (vec_rep % 50 == 1)
        )
        dup_planted = lambda store: (
            SIM.lsh_index_dedup_status(
                spark, store, planted_delta, threshold=0.9, emit_radius=2
            )
            .filter(F.col("status") != "unique")
            .count()
        )
        base_planted = dup_planted(lsh_store)
        t0 = time.perf_counter()
        out["emb_status_dups_cal"] = (
            SIM.lsh_index_dedup_status(
                spark, cal_store, delta_emb, threshold=0.9, emit_radius=2
            )
            .filter(F.col("status") != "unique")
            .count()
        )
        out["emb_status_cal_s"] = round(time.perf_counter() - t0, 2)
        cal_planted = dup_planted(cal_store)
        out["lsh_cal_planted"] = {"base": base_planted, "cal": cal_planted}
        assert cal_planted >= 0.9 * base_planted, (
            f"calibrated store lost planted dups: {cal_planted} vs "
            f"{base_planted} at n_planes={cal['n_planes']}"
        )

    # 3b. IVF auto-nprobe recall pin (r8): build an auto-sized IVF
    # index over the store slice, serve 10 PLANTED delta vectors
    # (the 0.001-noise near-dup slice) with nprobe="auto", and
    # compare against exact brute-force top-5 over the same store —
    # recall must hold >= 0.9. The queries are the planted slice on
    # purpose: their true neighbors form a real cluster (base vector
    # + its tiny-noise family), which is the regime IVF serving
    # exists for; the 0.3-chirp replicas are built to be mutually
    # near-orthogonal (each its own pseudo-random direction), so a
    # "random" query's top-5 over them has no recoverable structure
    # at ANY sub-exhaustive nprobe — that would measure the
    # fixture's adversarial geometry, not the index.
    ivf_store = f"{dst}/ivf_store"
    shutil.rmtree(ivf_store, ignore_errors=True)
    store_emb = emb.filter(~vec_is_delta)
    t0 = time.perf_counter()
    SIM.write_ivf_index(store_emb, ivf_store, n_centroids="auto")
    out["ivf_build_s"] = round(time.perf_counter() - t0, 2)
    qvecs = emb.filter(
        (vec_base % 100 == 8) & (vec_rep % 50 == 1)
    ).limit(10)
    meta = read_store_meta(ivf_store) or {}
    out["ivf_auto_nprobe"] = SIM.auto_nprobe(
        int(meta.get("n_rows", 0)), SIM.auto_n_centroids(int(meta.get("n_rows", 0))), 5
    )
    t0 = time.perf_counter()
    approx = SIM.ivf_index_topk(spark, ivf_store, qvecs, k=5, nprobe="auto")
    approx_rows = approx.collect()
    out["ivf_serve_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    q_collect = qvecs.collect()
    truth = {}
    import numpy as np

    store_np = store_emb.select("vec_id", "embedding").toPandas()
    sm = np.array(list(store_np["embedding"]), dtype=np.float64)
    sn = np.linalg.norm(sm, axis=1)
    sid = store_np["vec_id"].to_numpy()
    ok = sn > 0
    sm, sn, sid = sm[ok], sn[ok], sid[ok]
    for r in q_collect:
        qv = np.array(r["embedding"], dtype=np.float64)
        qn = np.linalg.norm(qv)
        if qn == 0:
            continue
        cos = (sm @ qv) / (sn * qn)
        # true NEAREST neighbor (the planted query's base-vector twin)
        truth[r["vec_id"]] = int(sid[np.lexsort((sid, -cos))[0]])
    got: dict = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, t in truth.items() if t in got.get(q, set()))
    # recall1@5: fraction of queries whose TRUE nearest neighbor is in
    # the served top-5 — the metric that matters for near-dup serving
    # (the base twin must surface); deeper ranks on this corpus are
    # the mutually-near-orthogonal 0.3-chirp replicas, i.e. noise
    out["ivf_recall1_at_5"] = round(hits / len(truth), 4) if truth else None
    out["ivf_truth_s"] = round(time.perf_counter() - t0, 2)
    assert out["ivf_recall1_at_5"] is None or out["ivf_recall1_at_5"] >= 0.9, (
        f"IVF auto-nprobe recall pin failed: {out['ivf_recall1_at_5']}"
    )
    # clean same-distribution delta must NOT trigger a retrain
    rec = SIM.ivf_retrain_recommendation(spark, ivf_store, delta_emb)
    out["ivf_retrain"] = rec["retrain"]
    out["ivf_dist_ratio"] = rec["dist_ratio"]

    # 3b. SemDeDup semantic dedup over the FULL corpus (one k-means
    # assignment pass + per-cluster gram matrices; k ≈ √n via
    # auto_n_centroids keeps expected per-cluster pair work ~O(n^1.5)
    # total). The planted slice (rep % 50 == 1 twins of the rep-0
    # base, cosine ≈ 1) must be flagged semantic_dup at 0.9 — a
    # recall pin on the quantizer co-clustering near-identical pairs.
    k_sem = SIM.auto_n_centroids(out["vecs"])
    t0 = time.perf_counter()
    sem_cents = SIM.ivf_train(emb, k=k_sem)
    sem = SIM.semantic_dedup(emb, threshold=0.9, centroids=sem_cents)
    sem_counts = {
        r["status"]: r["cnt"]
        for r in sem.groupBy("status").agg(F.count("*").alias("cnt")).collect()
    }
    out["semantic_dedup_s"] = round(time.perf_counter() - t0, 2)
    out["semantic_k"] = k_sem
    out["semantic_dups"] = sem_counts.get("semantic_dup", 0)
    planted_twins = emb.filter(
        (vec_base % 100 == 8) & (vec_rep % 50 == 1)
    ).count()
    out["semantic_planted"] = planted_twins
    assert out["semantic_dups"] >= 0.9 * planted_twins, (
        f"semantic dedup missed planted twins: "
        f"{out['semantic_dups']} < 0.9*{planted_twins}"
    )

    # 4. Deletion lifecycle at scale (takedown shape), BEFORE the
    # ingest appends so the store still holds only the base corpus
    # (serving the delta after an append would self-match its own
    # stored copy and mask the drop).
    deletion_stage(spark, store, docs, delta, doc_is_delta, out)

    # 5. K successive appends, then compaction
    t0 = time.perf_counter()
    for a in range(APPENDS):
        DD.append_minhash_index(
            delta.filter(F.col("doc_id") % APPENDS == a), store
        )
    out["appends_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["compacted_dirs"] = compact_store(spark, store)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    # serve again on the compacted, appended store: cost must not grow
    t0 = time.perf_counter()
    DD.incremental_dedup_status(spark, store, delta.limit(out["delta_docs"])).count()
    out["delta_decide_post_compact_s"] = round(time.perf_counter() - t0, 2)
    return out


COMPARE_EXHAUSTIVE = False


def main() -> None:
    global COMPARE_EXHAUSTIVE
    args = sys.argv[1:]
    if "--compare-exhaustive" in args:
        COMPARE_EXHAUSTIVE = True
        args = [a for a in args if a != "--compare-exhaustive"]
    deletion_only = "--deletion-only" in args
    args = [a for a in args if a != "--deletion-only"]
    if "--backend" in args:
        i = args.index("--backend")
        os.environ["SPARK_GRAFT_STORE_BACKEND"] = args[i + 1]
        args = args[:i] + args[i + 2:]
    levels = [int(a) for a in args] or [1, 10, 100, 1000]
    spark = get_spark(app_name="stress_incremental")
    for n in levels:
        res = run_deletion_level(spark, n) if deletion_only else run_level(spark, n)
        print(json.dumps(res))


if __name__ == "__main__":
    main()
