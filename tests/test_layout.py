"""Z-order clustering layout + footer-stats scan pruning.

The operator's whole value claim is measurable from parquet footers
alone: after ``write_zordered`` on two columns, a selective 2-D box
predicate must be able to skip most row groups on min/max statistics,
while the same data written in arrival order skips ~nothing. These
tests pin that claim with deterministic data (no RNG), plus the
boring-but-load-bearing parts: round-trip identity, NULL handling,
bucket monotonicity, and the recorded layout metadata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.operators import layout as L

N = 50_000


@pytest.fixture(scope="module")
def grid(spark):
    # x and y decorrelated via coprime multipliers: the pairs fill the
    # [0,1000)^2 grid, so neither single-column sort helps the other.
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") * 7919 % 1000).cast("double").alias("x"),
        (F.col("id") * 104729 % 1000).cast("double").alias("y"),
    )


BOX = {"x": (100.0, 199.0), "y": (400.0, 499.0)}  # ~1% of the space


class TestZorderPruning:
    def test_box_prunes_zordered_but_not_arrival_order(
        self, spark, grid, tmp_path
    ):
        zpath = str(tmp_path / "z")
        npath = str(tmp_path / "n")
        L.write_zordered(grid, zpath, ["x", "y"], target_files=16)
        grid.repartition(16).write.parquet(npath)
        zstats = L.scan_pruning_stats(zpath, BOX)
        nstats = L.scan_pruning_stats(npath, BOX)
        assert zstats["rows"] == nstats["rows"] == N
        # hash-distributed files each span the full value range: the
        # footer can prune nothing
        assert nstats["rows_pruned_frac"] <= 0.2
        # z-ordered files cover small hyper-rectangles: a 1% box
        # touches few of them
        assert zstats["rows_pruned_frac"] >= 0.5
        assert zstats["rows_pruned_frac"] > nstats["rows_pruned_frac"]

    def test_filtered_read_matches_unclustered(self, spark, grid, tmp_path):
        zpath = str(tmp_path / "z2")
        L.write_zordered(grid, zpath, ["x", "y"], target_files=8)
        pred = (
            F.col("x").between(*BOX["x"]) & F.col("y").between(*BOX["y"])
        )
        expect = {r["id"] for r in grid.filter(pred).collect()}
        got = {
            r["id"] for r in spark.read.parquet(zpath).filter(pred).collect()
        }
        assert got == expect and len(got) > 0

    def test_roundtrip_identity(self, spark, grid, tmp_path):
        zpath = str(tmp_path / "z3")
        L.write_zordered(grid, zpath, ["x", "y"], target_files=4)
        back = spark.read.parquet(zpath)
        assert back.count() == N
        assert (
            back.unionByName(grid).groupBy("id", "x", "y").count()
            .filter(F.col("count") != 2).count() == 0
        )

    def test_layout_meta_recorded(self, spark, grid, tmp_path):
        zpath = str(tmp_path / "z4")
        meta = L.write_zordered(grid, zpath, ["x", "y"], bits=4, target_files=2)
        assert L.read_layout_meta(zpath) == meta
        assert meta["cols"] == ["x", "y"] and meta["bits"] == 4
        assert len(meta["bounds"]["x"]) == 15  # 2**4 - 1 cut points


class TestBucketIndex:
    def test_monotonic_and_null_safe(self, spark):
        df = spark.createDataFrame(
            [(None,), (-5.0,), (0.5,), (1.5,), (2.5,), (99.0,)],
            "v double",
        )
        out = df.select(
            L.bucket_index(F.col("v"), [0.0, 1.0, 2.0]).alias("b")
        ).collect()
        assert [r["b"] for r in out] == [0, 0, 1, 2, 3, 3]

    def test_zorder_value_interleaves(self, spark):
        # bucket ids (3, 0) = bits 11 and 00 -> z = 0b0101 = 5
        df = spark.range(1).select(
            L.zorder_value([F.lit(3), F.lit(0)], bits=2).alias("z")
        )
        assert df.collect()[0]["z"] == 5


class TestAppend:
    def test_append_keeps_grid_and_stays_skippable(
        self, spark, grid, tmp_path
    ):
        zpath = str(tmp_path / "za")
        half_a = grid.filter(F.col("id") % 2 == 0)
        half_b = grid.filter(F.col("id") % 2 == 1)
        meta = L.write_zordered(half_a, zpath, ["x", "y"], target_files=8)
        got = L.append_zordered(half_b, zpath, target_files=8)
        # frozen grid: the append reuses the recorded boundaries
        assert got == meta and L.read_layout_meta(zpath) == meta
        back = spark.read.parquet(zpath)
        assert back.count() == N
        # the merged table still prunes the box well: both the old and
        # the appended files cluster on the same value grid
        stats = L.scan_pruning_stats(zpath, BOX)
        assert stats["rows"] == N
        assert stats["rows_pruned_frac"] >= 0.5

    def test_append_to_unlayouted_table_fails_loudly(
        self, spark, grid, tmp_path
    ):
        plain = str(tmp_path / "plain")
        grid.write.parquet(plain)
        with pytest.raises(ValueError, match="_layout.json"):
            L.append_zordered(grid, plain)


def test_sampled_bounds_still_prune(spark, grid, tmp_path):
    """Boundary derivation from a 5% sample must cluster ~as well as
    the exact quantile pass — bounds steer layout, never correctness,
    so the 100 TB path pays a bounded scan instead of a full one."""
    zpath = str(tmp_path / "zs")
    L.write_zordered(
        grid, zpath, ["x", "y"], target_files=16, sample_fraction=0.05
    )
    stats = L.scan_pruning_stats(zpath, BOX)
    assert stats["rows"] == N  # every row written, layout-only change
    assert stats["rows_pruned_frac"] >= 0.5
