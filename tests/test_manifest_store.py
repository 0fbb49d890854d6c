"""Manifest-backend mechanics: the object-store-safe twins of the
posix hardlink/inode assertions in test_store_versions.py.

The manifest backend (sources/store_backend.py) re-expresses the
store layer's snapshot/swap/fold machinery on five object-store
primitives (atomic put, get, list, delete, exists): data files are
immutable under ``_g/<gen>/`` prefixes, a JSON manifest lists each
generation's files, and ``_mf/CURRENT.json`` is the single atomic
commit pointer. These tests pin what the posix suite pins with
inodes: snapshots cost zero data I/O, folds carry untouched
partitions BY REFERENCE, crashes before the pointer flip are
invisible and garbage-collected, expiry is manifest-diff GC.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.sources import store_backend as MB
from tiki_data_pipeline_spark.sources.files import (
    compact_store,
    delete_from_store,
    expire_store_versions,
    fold_tombstones,
    read_store_version,
    snapshot_store,
    store_data,
    store_put,
    store_sub,
)


@pytest.fixture(autouse=True)
def _manifest_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STORE_BACKEND", "manifest")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _bkt_store(spark, path, n=400, buckets=8):
    rows = spark.range(n).select(
        F.col("id"), (F.col("id") % buckets).cast("int").alias("bkt")
    )
    store_put(rows, path, "overwrite", partition_by="bkt")
    return path


def _gen_files(path):
    return {
        os.path.relpath(f, path)
        for f in (
            os.path.join(dp, fn)
            for dp, _dns, fns in os.walk(os.path.join(path, "_g"))
            for fn in fns
        )
        if f.endswith(".parquet")
    }


class TestCommit:
    def test_store_is_manifest_and_reads_back(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        assert MB.is_manifest_store(p)
        df = store_data(spark, p)
        assert df.count() == 400
        assert set(df.columns) == {"id", "bkt"}
        # partition pruning survives the manifest read: the file
        # index keeps bkt= partitions, so an isin probe skips others
        plan = df.filter(F.col("bkt").isin([3]))._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and df.filter(F.col("bkt").isin([3])).count() == 50

    def test_append_adds_overwrite_replaces(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        more = spark.range(400, 500).select(
            F.col("id"), (F.col("id") % 8).cast("int").alias("bkt")
        )
        store_put(more, p, "append", partition_by="bkt")
        assert store_data(spark, p).count() == 500
        store_put(more, p, "overwrite", partition_by="bkt")
        assert store_data(spark, p).count() == 100

    def test_overwrite_of_data_clears_sidecars_like_posix(
        self, spark, tmp_path
    ):
        """Posix full-tree overwrite nukes sidecars (Spark clears the
        directory); the manifest overwrite must match — a rebuilt
        store that silently kept its OLD tombstones would hide ids
        the new corpus legitimately contains."""
        p = _bkt_store(spark, str(tmp_path / "s"))
        delete_from_store(spark, p, _ids(spark, [1, 2]))
        assert store_data(spark, p).count() == 400  # raw rows
        _bkt_store(spark, p)  # full rebuild
        from tiki_data_pipeline_spark.sources.files import store_tombstones

        assert store_tombstones(spark, p) is None

    def test_crashed_commit_is_invisible_and_gced(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        before = store_data(spark, p).count()
        # simulate a crash AFTER files + manifest were written but
        # BEFORE the pointer flip: orphan generation + orphan manifest
        cur = MB.current_gen(p)
        orphan_dir = os.path.join(p, "_g", f"{cur + 1:08d}")
        os.makedirs(orphan_dir)
        with open(os.path.join(orphan_dir, "part-zzz.parquet"), "wb") as f:
            f.write(b"not really parquet")
        with open(
            os.path.join(p, "_mf", f"gen-{cur + 1:08d}.json"), "w"
        ) as f:
            json.dump(
                {"gen": cur + 1, "parent": cur, "op": "crash", "files": []}, f
            )
        # readers resolve CURRENT: the orphan is invisible
        assert store_data(spark, p).count() == before
        rep = MB.gc_store(p)
        assert rep["files_deleted"] >= 1 and rep["manifests_deleted"] >= 1
        assert not os.path.exists(os.path.join(orphan_dir, "part-zzz.parquet"))
        # and the NEXT commit reuses the generation number cleanly
        store_put(_ids(spark, [9999]).select(F.col("id"), F.lit(0).alias("bkt")), p, "append", partition_by="bkt")
        assert store_data(spark, p).count() == before + 1


class TestZeroCopy:
    def test_snapshot_writes_no_data_files(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        files_before = _gen_files(p)
        v = snapshot_store(p, tag="pin")
        assert _gen_files(p) == files_before  # zero data I/O
        assert read_store_version(spark, p, v).count() == 400

    def test_fold_carries_untouched_partitions_by_reference(
        self, spark, tmp_path
    ):
        p = _bkt_store(spark, str(tmp_path / "s"))
        m0 = MB.read_manifest(p, MB.current_gen(p))
        by_part_before = {}
        for f in m0["files"]:
            by_part_before.setdefault(MB._lp(f).split("/", 1)[0], set()).add(f)
        # victims all hash into bkt=3
        victims = [i for i in range(400) if i % 8 == 3][:10]
        delete_from_store(spark, p, _ids(spark, victims))
        assert fold_tombstones(spark, p) == 10
        m1 = MB.read_manifest(p, MB.current_gen(p))
        by_part_after = {}
        for f in m1["files"]:
            by_part_after.setdefault(MB._lp(f).split("/", 1)[0], set()).add(f)
        for part in by_part_before:
            if part == "bkt=3":
                # affected partition: rewritten as NEW files
                assert by_part_after[part] != by_part_before[part]
            else:
                # untouched: the IDENTICAL file references carried over
                assert by_part_after[part] == by_part_before[part]
        # the rewritten partition's OLD files were garbage-collected
        # (nothing pins them)
        assert not (by_part_before["bkt=3"] & _gen_files(p))
        df = store_data(spark, p)
        assert df.count() == 390
        assert df.filter(F.col("id").isin(victims)).count() == 0

    def test_pinned_snapshot_protects_prefold_files(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        v = snapshot_store(p)
        m0_files = set(MB.read_manifest(p, MB.current_gen(p))["files"])
        victims = [3, 11, 19]
        delete_from_store(spark, p, _ids(spark, victims))
        fold_tombstones(spark, p)
        # pre-fold files survive GC because the snapshot pins them
        assert m0_files <= _gen_files(p)
        assert read_store_version(spark, p, v).count() == 400
        # expiring the snapshot releases them
        assert expire_store_versions(p, keep_last=0) == [v]
        assert not (m0_files - set(MB.read_manifest(p, MB.current_gen(p))["files"])) & _gen_files(p)
        assert store_data(spark, p).count() == 397

    def test_rollback_is_one_commit_no_data_io(self, spark, tmp_path):
        from tiki_data_pipeline_spark.sources.files import rollback_store

        p = _bkt_store(spark, str(tmp_path / "s"))
        v = snapshot_store(p)
        delete_from_store(spark, p, _ids(spark, [0, 8, 16]))
        fold_tombstones(spark, p)
        files_before = _gen_files(p)
        rollback_store(p, v)
        assert _gen_files(p) == files_before  # no files written or lost
        assert store_data(spark, p).count() == 400


class TestMaintenance:
    def test_compact_collapses_generations(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        for lo in (400, 500, 600):
            batch = spark.range(lo, lo + 100).select(
                F.col("id"), (F.col("id") % 8).cast("int").alias("bkt")
            )
            store_put(batch, p, "append", partition_by="bkt")
        n_files_before = len(_gen_files(p))
        n = compact_store(spark, p)
        assert n == 8  # one logical dir per bkt partition
        assert len(_gen_files(p)) == 8  # one file per partition
        assert len(_gen_files(p)) < n_files_before
        assert store_data(spark, p).count() == 700

    def test_fingerprints_sidecar_folds_bucket_pruned(self, spark, tmp_path):
        """The fpb-bucketed _fingerprints sidecar folds O(affected
        buckets) in manifest mode too: victim buckets rewritten,
        others carried by reference."""
        from tiki_data_pipeline_spark.operators import dedup as DD

        docs = spark.createDataFrame(
            [(i, f"body text {i} " * 5) for i in range(40)],
            "doc_id long, text string",
        )
        p = str(tmp_path / "mh")
        DD.write_minhash_index(docs, p)
        assert MB.is_manifest_store(p)
        refs_before = {
            f
            for f in MB.read_manifest(p, MB.current_gen(p))["files"]
            if MB._lp(f).startswith("_fingerprints/")
        }
        from tiki_data_pipeline_spark.sources.files import fp_bucket

        victim = 7
        vb = spark.range(1).select(
            fp_bucket(F.lit(victim).cast("long")).alias("b")
        ).collect()[0]["b"]
        delete_from_store(spark, p, _ids(spark, [victim]))
        fold_tombstones(spark, p)
        refs_after = {
            f
            for f in MB.read_manifest(p, MB.current_gen(p))["files"]
            if MB._lp(f).startswith("_fingerprints/")
        }
        untouched_before = {
            f for f in refs_before if not MB._lp(f).startswith(f"_fingerprints/fpb={vb}/")
        }
        assert untouched_before <= refs_after  # carried by reference
        assert not any(
            MB._lp(f).startswith(f"_fingerprints/fpb={vb}/") and f in refs_before
            for f in refs_after
        )  # the victim bucket was rewritten
        fps = store_sub(spark, p, "_fingerprints")
        assert fps.filter(F.col("id") == victim).count() == 0
        assert fps.count() == 39

    def test_incremental_serve_on_manifest_store(self, spark, tmp_path):
        """End-to-end parity: the staged exact-first dedup serve runs
        unchanged against a manifest-backed minhash store."""
        from tiki_data_pipeline_spark.operators import dedup as DD

        corpus = [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(10)]
        p = str(tmp_path / "mh")
        DD.write_minhash_index(
            spark.createDataFrame(corpus, "doc_id long, text string"), p
        )
        batch = spark.createDataFrame(
            [(91, corpus[4][1]), (92, "completely novel text body")],
            "doc_id long, text string",
        )
        st = {
            r["doc_id"]: (r["status"], r["matched_id"])
            for r in DD.incremental_dedup_status(spark, p, batch).collect()
        }
        assert st[91] == ("exact_dup", 4)
        assert st[92][0] == "unique"
        # append extends the store; the next serve sees the new doc
        DD.append_minhash_index(
            spark.createDataFrame([(92, "completely novel text body")], "doc_id long, text string"),
            p,
        )
        st2 = {
            r["doc_id"]: r["status"]
            for r in DD.incremental_dedup_status(
                spark, p, spark.createDataFrame([(93, "completely novel text body")], "doc_id long, text string")
            ).collect()
        }
        assert st2[93] == "exact_dup"


class TestInternalRewritesKeepSidecars:
    """compact/migrate are INTERNAL data rewrites: they must carry
    every sidecar + meta reference (the posix staged swaps copy
    sidecars into staging verbatim) — only a caller-facing full
    rebuild drops them. Regression: the first manifest compact
    implementation dropped _fingerprints/_meta references."""

    def test_compact_preserves_fingerprints_meta_and_serve(
        self, spark, tmp_path
    ):
        from tiki_data_pipeline_spark.operators import dedup as DD
        from tiki_data_pipeline_spark.sources.files import read_store_meta

        corpus = [
            (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(10)
        ]
        p = str(tmp_path / "mh")
        DD.write_minhash_index(
            spark.createDataFrame(corpus, "doc_id long, text string"), p
        )
        DD.append_minhash_index(
            spark.createDataFrame(
                [(20, "fresh body " * 4)], "doc_id long, text string"
            ),
            p,
        )
        compact_store(spark, p)
        assert read_store_meta(p)["kind"] == "minhash"
        fps = store_sub(spark, p, "_fingerprints")
        assert fps is not None and fps.count() == 11
        batch = spark.createDataFrame(
            [(91, corpus[4][1])], "doc_id long, text string"
        )
        st = DD.incremental_dedup_status(spark, p, batch).collect()[0]
        assert (st["status"], st["matched_id"]) == ("exact_dup", 4)

    def test_migrate_layout_preserves_sidecars(self, spark, tmp_path):
        from tiki_data_pipeline_spark.sources.files import (
            migrate_store_layout,
            read_store_meta,
            store_layout,
            write_store_meta,
        )

        p = _bkt_store(spark, str(tmp_path / "s"))
        write_store_meta(p, {"kind": "bare", "n_rows": 400})
        delete_from_store(spark, p, _ids(spark, [1]))
        assert store_layout(p) == ("bkt", True)
        assert migrate_store_layout(spark, p, partitioned=False)
        assert store_layout(p) == ("bkt", False)
        assert read_store_meta(p)["kind"] == "bare"
        # pending tombstones survived the migration: serve still hides
        from tiki_data_pipeline_spark.sources.files import apply_tombstones

        live = apply_tombstones(store_data(spark, p), p)
        assert live.count() == 399
        assert migrate_store_layout(spark, p, partitioned=True)
        assert store_layout(p) == ("bkt", True)
        assert apply_tombstones(store_data(spark, p), p).count() == 399


class TestConcurrentCommit:
    """Single-writer contract violations must fail LOUDLY, not
    last-write-win the pointer (r13): a commit records the generation
    it was based on and refuses when CURRENT moved; the generation
    manifest itself is claimed with an exclusive create (the
    object-store CAS), so two racers that both pass the check cannot
    both land."""

    def test_commit_refuses_when_current_moved(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        cur = MB.current_gen(p)
        # a second writer commits between our base read and our commit
        MB._commit(p, MB.read_manifest(p, cur)["files"], "racer")
        with pytest.raises(MB.ConcurrentCommitError, match="CURRENT moved"):
            MB._commit(p, [], "loser", based_on=cur)

    def test_generation_manifest_claim_is_exclusive(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"))
        cur = MB.current_gen(p)
        # simulate a LIVE racer: claimed gen cur+1 moments ago but not
        # yet flipped CURRENT (the in-flight claim→flip window)
        import time as _time

        assert MB.FS.put_if_absent(
            MB._gen_manifest_path(p, cur + 1),
            json.dumps({"gen": cur + 1, "created_unix": int(_time.time())}),
        )
        with pytest.raises(MB.ConcurrentCommitError, match="live"):
            MB._commit(p, [], "loser", based_on=cur)
        # the racer crashes instead of flipping: once the claim ages
        # past the grace window it is a recoverable orphan — the next
        # commit sweeps it in-line and succeeds, no manual gc_store
        os.environ["SPARK_GRAFT_ORPHAN_GRACE_SECS"] = "0"
        try:
            assert MB._commit(
                p, MB.read_manifest(p, cur)["files"], "retry", based_on=cur
            ) == cur + 1
        finally:
            del os.environ["SPARK_GRAFT_ORPHAN_GRACE_SECS"]

    def test_crash_orphan_claim_self_heals_without_gc(self, spark, tmp_path):
        """A crash between the generation-manifest claim and the
        CURRENT flip must NOT wedge the store: the next commit (e.g. a
        replayed streaming epoch) sweeps the aged orphan and lands."""
        p = _bkt_store(spark, str(tmp_path / "s"))
        cur = MB.current_gen(p)
        # crash orphan: claim written 1h ago, CURRENT never flipped
        assert MB.FS.put_if_absent(
            MB._gen_manifest_path(p, cur + 1),
            json.dumps(
                {"gen": cur + 1, "op": "crash",
                 "created_unix": int(__import__("time").time()) - 3600,
                 "files": []}
            ),
        )
        g = MB._commit(
            p, MB.read_manifest(p, cur)["files"], "replayed", based_on=cur
        )
        assert g == cur + 1
        assert MB.current_gen(p) == g
        assert MB.read_manifest(p, g)["op"] == "replayed"

    def test_store_put_race_raises_not_lost_update(self, spark, tmp_path):
        """End-to-end: two store_put writers based on the same CURRENT
        — the second to commit must raise, and the store must still
        read back as exactly the winner's rows."""
        p = _bkt_store(spark, str(tmp_path / "s"), n=16, buckets=2)
        winner = spark.range(100, 108).select(
            F.col("id"), (F.col("id") % 2).cast("int").alias("bkt")
        )
        loser = spark.range(200, 204).select(
            F.col("id"), (F.col("id") % 2).cast("int").alias("bkt")
        )
        real_commit = MB._commit
        raced = {"done": False}

        def racing_commit(root, files, op, parent=None, based_on=None):
            if not raced["done"]:
                raced["done"] = True
                real_commit(
                    root,
                    files=MB.read_manifest(root, MB.current_gen(root))["files"],
                    op="append:data",
                )
            return real_commit(root, files, op, parent=parent, based_on=based_on)

        import unittest.mock as mock

        with mock.patch.object(MB, "_commit", side_effect=racing_commit):
            with pytest.raises(MB.ConcurrentCommitError):
                store_put(loser, p, "append")
        MB.gc_store(p)
        ids = {r["id"] for r in store_data(spark, p).collect()}
        assert not ids & set(range(200, 204)), "loser's rows leaked in"


class TestCompactFilesPerPartition:
    def test_partitioned_compact_honors_target(self, spark, tmp_path):
        p = _bkt_store(spark, str(tmp_path / "s"), n=400, buckets=4)
        MB.compact_store_manifest(spark, p, target_files_per_partition=2)
        per_dir: dict = {}
        for f in MB.manifest_files(p, None):
            lp = MB._lp(f)
            if lp.endswith(".parquet") and "=" in lp:
                per_dir.setdefault(lp.split("/", 1)[0], set()).add(lp)
        assert per_dir, "no partitioned data files after compact"
        assert all(1 <= len(v) <= 2 for v in per_dir.values())
        assert any(len(v) == 2 for v in per_dir.values()), (
            "target_files_per_partition=2 produced single-file dirs only"
        )
        assert store_data(spark, p).count() == 400


class TestDecisionsCompaction:
    def test_compact_regroups_decisions_into_one_generation(self, spark, tmp_path):
        """Every streaming epoch's sub-scoped commit lands its
        decisions leaf in its own generation; compaction must re-group
        the scope into ONE generation (one read group afterwards) with
        rows AND (run, epoch) partition values intact."""
        p = _bkt_store(spark, str(tmp_path / "s"), n=64, buckets=4)
        for e in range(4):
            MB.store_put(
                spark.createDataFrame(
                    [(100 + e, "unique", None)],
                    "doc_id long, status string, matched_id long",
                ).coalesce(1),
                p,
                mode="overwrite",
                sub=f"_decisions/run=rabc/epoch={e}",
            )
        refs = [
            f for f in MB.manifest_files(p, "_decisions") if f.endswith(".parquet")
        ]
        gens_before = {f.split("/", 2)[1] for f in refs}
        assert len(gens_before) == 4
        before = {
            (r["doc_id"], r["run"], r["epoch"])
            for r in store_sub(spark, p, "_decisions").collect()
        }

        compact_store(spark, p)

        refs = [
            f for f in MB.manifest_files(p, "_decisions") if f.endswith(".parquet")
        ]
        gens_after = {f.split("/", 2)[1] for f in refs}
        assert len(gens_after) == 1
        after = {
            (r["doc_id"], r["run"], r["epoch"])
            for r in store_sub(spark, p, "_decisions").collect()
        }
        assert after == before
        # idempotent: a second compact with one generation is a no-op
        assert MB._compact_decisions_manifest(spark, p) == 0
