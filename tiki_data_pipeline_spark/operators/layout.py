"""Multi-dimensional data layout: Z-order clustering + footer-stats
scan pruning.

At 100 TB the cheapest scan is the one that never happens: parquet
readers (Spark's included) skip whole row groups whose footer
min/max statistics cannot satisfy the pushed filter. A table sorted
on ONE column prunes range predicates on that column only; a box
predicate over TWO-OR-MORE columns needs the file layout to be local
in every queried dimension at once. Z-ordering delivers that by
sorting on the bit-interleaving of equi-depth bucket ids — every
row group then covers a small hyper-rectangle of the value space,
so its per-column [min, max] windows are tight and most groups fall
entirely outside any selective box.

Everything here is Spark-built-in expression work (bucket lookup is
a balanced CASE decision tree over the boundary literals — O(log
buckets) codegen'd compares per row; interleaving is shift/AND/sum
arithmetic) plus ONE range repartition, so the write costs the same
shuffle any clustered write pays (the Z key is evaluated twice: the
range partitioner's sampling pass and the write pass — inherent to
sorting on a computed key). Equi-depth (quantile) buckets rather than equi-width:
skewed columns (prices, counts) otherwise collapse most rows into a
few bucket values and the interleaving degenerates.

Reference analogue: the reference leans on per-table B-tree indexes
in its OLTP store (src/pipelines/crawl/storage/postgres_storage.py)
for selective access; on immutable parquet at cluster scale the
equivalent lever is clustering + statistics-based skipping
(Delta/Iceberg OPTIMIZE ZORDER is the lakehouse twin of
``write_zordered``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 256 equi-depth buckets per dimension

LAYOUT_META = "_layout.json"


def equi_depth_bounds(
    df: DataFrame,
    col: str,
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.001,
) -> list[float]:
    """Interior quantile cut points splitting ``col`` into 2**bits
    equal-mass buckets. One approxQuantile pass (Greenwald-Khanna,
    single aggregation job, driver gets ~2**bits doubles — bounded
    regardless of table size)."""
    buckets = 1 << bits
    probs = [i / buckets for i in range(1, buckets)]
    return df.stat.approxQuantile(col, probs, relative_error)


def bucket_index(col: Column, bounds: list[float]) -> Column:
    """Equi-depth bucket id of a value = how many cut points it has
    passed, found by a balanced CASE decision tree over the sorted
    boundary literals: the invariant ``answer >= mid  ⟺
    value >= bounds[mid-1]`` halves the candidate range per branch,
    so each row pays O(log buckets) codegen'd compares (8 at
    bits=8). The first cut tried a fold over the boundary array —
    higher-order-function lambdas evaluate interpreted per element,
    and a flat 255-element scan made the write 20× slower than an
    unclustered write; the tree is a static 2n-node expression whose
    EVALUATION short-circuits down one root-to-leaf path. No UDF, no
    join. NULL compares are false, so NULLs walk the left spine into
    bucket 0."""
    v = col.cast("double")

    def tree(lo: int, hi: int) -> Column:
        # answer (count of bounds <= v) is known to lie in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(
            v >= F.lit(float(bounds[mid - 1])), tree(mid, hi)
        ).otherwise(tree(lo, mid - 1))

    return tree(0, len(bounds))


def zorder_value(bucket_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Bit-interleave D bucket ids into one long Morton (Z) key:
    bit i of dimension j lands at position i*D + j. Static
    shift/AND/sum expression tree (bits × D terms), codegen-friendly."""
    d = len(bucket_cols)
    z: Column | None = None
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * d + j)
            z = term if z is None else z + term
    assert z is not None, "zorder_value needs at least one dimension"
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    target_files: int | None = None,
    sample_fraction: float | None = None,
) -> dict:
    """Write ``df`` to ``path`` clustered by the Z-order of ``cols``.

    One range repartition on the Z key (range, not hash: range keeps
    Z-adjacent rows — and therefore value-space-adjacent rows — in
    the same output file) followed by a within-partition sort, so
    every row group's per-column min/max windows are tight. The
    boundary arrays are recorded in ``_layout.json`` (underscore
    prefix: invisible to readers, the sidecar convention every store
    here uses) so later appends can bucket with the SAME cut points
    instead of drifting. Returns the layout metadata dict."""
    spark = df.sparkSession
    # ONE quantile job for every clustering column (approxQuantile
    # takes a column list) — not a pass per dimension. At 100 TB the
    # exact Greenwald-Khanna pass is itself a full-table scan;
    # sample_fraction trades it for a bounded one — bucket boundaries
    # only steer LAYOUT (which rows co-locate), never correctness, so
    # quantiles of a 1% sample cluster ~as well as exact ones.
    buckets = 1 << bits
    probs = [i / buckets for i in range(1, buckets)]
    src = (
        df.sample(fraction=sample_fraction, seed=7)
        if sample_fraction
        else df
    )
    bounds = dict(zip(cols, src.stat.approxQuantile(cols, probs, 0.001)))
    z = zorder_value([bucket_index(F.col(c), bounds[c]) for c in cols], bits)
    n = target_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(n), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    meta = {"cols": cols, "bits": bits, "bounds": bounds}
    with open(os.path.join(path, LAYOUT_META), "w") as f:
        json.dump(meta, f)
    return meta


def append_zordered(
    df: DataFrame, path: str, target_files: int | None = None
) -> dict:
    """Append a batch to an existing Z-ordered table, clustering the
    NEW files on the SAME boundary grid recorded in ``_layout.json``
    (re-deriving quantiles from the batch would drift the grid and
    blur every future file's min/max windows). The live table stays
    globally skippable: old files keep their tight rectangles, the
    appended files get their own. Periodic re-layout (re-running
    :func:`write_zordered` over the accumulated table, which also
    refreshes the boundaries against data drift) is the compaction
    step — same regime as every store's fold/compact maintenance."""
    meta = read_layout_meta(path)
    if meta is None:
        raise ValueError(
            f"{path} has no _layout.json - not a Z-ordered table; "
            "build it with write_zordered() first"
        )
    z = zorder_value(
        [bucket_index(F.col(c), meta["bounds"][c]) for c in meta["cols"]],
        meta["bits"],
    )
    n = target_files or max(
        1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")) // 8
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(n), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("append")
        .parquet(path)
    )
    return meta


def read_layout_meta(path: str) -> dict | None:
    mf = os.path.join(path, LAYOUT_META)
    if not os.path.isfile(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def scan_pruning_stats(path: str, box: dict[str, tuple]) -> dict:
    """What fraction of the table a footer-driven reader can SKIP for
    a box predicate {col: (lo, hi)}: a row group is prunable when any
    queried column's [min, max] window misses its range entirely —
    exactly the decision Spark's parquet reader (and DuckDB's, and
    any engine's) makes from the same statistics. Pure pyarrow footer
    reads — no data pages touched, no Spark job; this is the honest,
    engine-independent measure of what a layout buys."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet") and not fn.startswith((".", "_"))
    )
    out = {
        "files": 0,
        "files_pruned": 0,
        "row_groups": 0,
        "row_groups_pruned": 0,
        "rows": 0,
        "rows_pruned": 0,
    }
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        out["files"] += 1
        file_all_pruned = md.num_row_groups > 0
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            out["row_groups"] += 1
            out["rows"] += rg.num_rows
            cols = {
                rg.column(i).path_in_schema: rg.column(i)
                for i in range(rg.num_columns)
            }
            prunable = False
            for col, (lo, hi) in box.items():
                cc = cols.get(col)
                st = cc.statistics if cc is not None else None
                if st is None or not st.has_min_max:
                    continue
                if st.min > hi or st.max < lo:
                    prunable = True
                    break
            if prunable:
                out["row_groups_pruned"] += 1
                out["rows_pruned"] += rg.num_rows
            else:
                file_all_pruned = False
        if file_all_pruned:
            out["files_pruned"] += 1
    out["rows_pruned_frac"] = (
        out["rows_pruned"] / out["rows"] if out["rows"] else 0.0
    )
    return out
