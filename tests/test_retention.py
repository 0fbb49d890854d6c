"""M7 retention: real partition moves/drops (reference
postgres_storage.py:1799-1857 cleanup_old_history)."""

from __future__ import annotations

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.operators.history import apply_retention


def test_apply_retention_moves_and_drops_partitions(spark, tmp_path):
    hist = FX.crawl_history_df(spark)
    base = str(tmp_path / "crawl_history")
    arch = str(tmp_path / "crawl_history_archive")
    result = apply_retention(spark, hist, base, arch, FX.HISTORY_NOW)

    # now = 2025-01-20 → delete cutoff month 2024-01, archive cutoff 2024-07
    assert result["deleted_months"] == ["2023-06", "2023-12"]
    assert result["archived_months"] == ["2024-05"]
    # 2024-07 straddles the archive cutoff (conservative keep)
    assert result["kept_months"] == ["2024-07", "2024-12", "2025-01"]

    kept = spark.read.parquet(base)
    archived = spark.read.parquet(arch)
    # archived rows land in the archive dataset...
    assert {r["history_id"] for r in archived.collect()} == {12}
    # ...expired rows are gone everywhere
    kept_ids = {r["history_id"] for r in kept.collect()}
    assert kept_ids.isdisjoint({15, 16})
    # and nothing else was lost: kept + archived = original - deleted
    all_ids = {r[0] for r in FX.HISTORY_ROWS}
    assert kept_ids | {12} == all_ids - {15, 16}


def test_apply_retention_merges_late_rows_into_existing_archive_month(
    spark, tmp_path
):
    """Late rows for an already-archived month must MERGE into the
    existing archive partition — not nest month=X/month=X, not clobber
    existing archive files, not lose rows."""
    base = str(tmp_path / "h")
    arch = str(tmp_path / "a")
    hist = FX.crawl_history_df(spark)
    apply_retention(spark, hist, base, arch, FX.HISTORY_NOW)
    archived_before = {r["history_id"] for r in spark.read.parquet(arch).collect()}
    assert archived_before == {12}

    # a late row lands for the already-archived month 2024-05
    late = spark.createDataFrame(
        [(99, "100004", 125000.0, 125000.0, 0, 210, "2024-05-20 10:00:00")],
        schema=FX.HISTORY_SPARK_SCHEMA,
    )
    from pyspark.sql import functions as F

    late = late.withColumn("crawled_at", F.to_timestamp("crawled_at"))
    base2 = str(tmp_path / "h2")
    result = apply_retention(spark, late, base2, arch, FX.HISTORY_NOW)
    assert result["archived_months"] == ["2024-05"]

    # no nested month=X/month=X anywhere under the archive
    from pathlib import Path

    nested = list(Path(arch).glob("month=*/month=*"))
    assert nested == [], f"nested partition dirs: {nested}"
    # both the original and the late row are readable from the archive
    archived = {r["history_id"] for r in spark.read.parquet(arch).collect()}
    assert archived == {12, 99}


def test_apply_retention_skips_rewrite_when_layout_exists(spark, tmp_path):
    """Re-applying retention over an existing month-partitioned dataset
    must be pure partition metadata work — no full-dataset rewrite (the
    data files of kept months must be byte-identical afterwards)."""
    base = str(tmp_path / "h")
    arch = str(tmp_path / "a")
    hist = FX.crawl_history_df(spark)
    apply_retention(spark, hist, base, arch, FX.HISTORY_NOW)

    from pathlib import Path

    def snapshot(p):
        return {
            str(f.relative_to(p)): (f.stat().st_size, f.stat().st_mtime_ns)
            for f in Path(p).rglob("*")
            if f.is_file()
        }

    before = snapshot(base)
    # history=None: pure metadata re-apply over the on-disk partitions
    result = apply_retention(spark, None, base, arch + "2", FX.HISTORY_NOW)
    assert result["kept_months"] == ["2024-07", "2024-12", "2025-01"]
    assert snapshot(base) == before, "kept partitions were rewritten"


def test_apply_retention_appends_new_months_from_caller(spark, tmp_path):
    """Re-applying with caller rows for a month NOT yet on disk must
    materialize them (append, no rewrite) instead of silently dropping
    them; months already on disk are never rewritten."""
    from pathlib import Path

    base = str(tmp_path / "h")
    arch = str(tmp_path / "a")
    hist = FX.crawl_history_df(spark)
    apply_retention(spark, hist, base, arch, FX.HISTORY_NOW)

    from pyspark.sql import functions as F

    kept = spark.read.parquet(base).drop("month")
    extra = kept.limit(1).withColumn(
        "crawled_at",
        F.lit(FX.HISTORY_NOW).cast("timestamp") + F.expr("INTERVAL 40 DAYS"),
    )
    result = apply_retention(
        spark,
        kept.unionByName(extra).localCheckpoint(),
        base,
        arch + "2",
        FX.HISTORY_NOW,
    )
    # the fresh future month is now a kept partition on disk
    new_month = [m for m in result["kept_months"] if m > "2025-01"]
    assert new_month, result
    assert any(Path(base).glob(f"month={new_month[0]}")), "new month not appended"
    # already-kept months stayed as-is (no rewrite, no re-archive of them)
    assert {"2024-07", "2024-12", "2025-01"} <= set(result["kept_months"])


def test_apply_retention_is_idempotent_on_kept_months(spark, tmp_path):
    hist = FX.crawl_history_df(spark)
    base = str(tmp_path / "h")
    arch = str(tmp_path / "a")
    apply_retention(spark, hist, base, arch, FX.HISTORY_NOW)
    # re-applying over the surviving rows changes nothing further
    # (checkpoint: the overwrite would otherwise clobber its own input)
    kept = spark.read.parquet(base).drop("month").localCheckpoint()
    result = apply_retention(spark, kept, base, arch + "2", FX.HISTORY_NOW)
    assert result["deleted_months"] == []
    assert result["archived_months"] == []
    assert result["kept_months"] == ["2024-07", "2024-12", "2025-01"]


def test_apply_retention_none_history_requires_existing_layout(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no month= partitions"):
        apply_retention(
            spark, None, str(tmp_path / "missing"), str(tmp_path / "a"), FX.HISTORY_NOW
        )
