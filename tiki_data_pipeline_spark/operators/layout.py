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
    meta = {"cols": cols, "bits": bits, "bounds": bounds, "appends": 0}
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
    appended files get their own. Periodic re-layout
    (:func:`relayout_zordered` — a crash-safe staged swap that also
    refreshes the boundaries against data drift; never re-run
    :func:`write_zordered` onto the live path, its direct overwrite
    would read and clobber the same dataset) is the compaction step —
    same regime as every store's fold/compact maintenance;
    :func:`layout_maintenance_check` decides WHEN it is due."""
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
    # lifecycle bookkeeping: how many frozen-grid appends have landed
    # since the last full layout — one input to the maintenance check
    meta["appends"] = int(meta.get("appends", 0)) + 1
    with open(os.path.join(path, LAYOUT_META), "w") as f:
        json.dump(meta, f)
    return meta


def relayout_zordered(
    spark,
    path: str,
    bits: int | None = None,
    target_files: int | None = None,
    sample_fraction: float | None = None,
) -> dict:
    """Re-cluster a Z-ordered table in place: fresh quantile bounds
    over the ACCUMULATED data (healing grid drift), one global
    re-sort, small appended files compacted away. Crash-safe staged
    swap (the repo's ``swap_parquet_rewrite`` idiom — a direct
    ``write_zordered(path)`` over its own source would clobber the
    dataset it is reading). Clustering columns and bit width default
    to the recorded layout. Production twin: re-running ``OPTIMIZE
    ZORDER`` on a lakehouse table."""
    from tiki_data_pipeline_spark.sources.files import (
        recover_interrupted_swap,
        swap_parquet_rewrite,
    )

    recover_interrupted_swap(path)
    meta = read_layout_meta(path)
    if meta is None:
        raise ValueError(
            f"{path} has no _layout.json - not a Z-ordered table; "
            "build it with write_zordered() first"
        )
    cols = meta["cols"]
    use_bits = bits if bits is not None else int(meta["bits"])
    new_meta: dict = {}

    def _stage(staging: str) -> None:
        new_meta.update(
            write_zordered(
                spark.read.parquet(path),
                staging,
                cols,
                bits=use_bits,
                target_files=target_files,
                sample_fraction=sample_fraction,
            )
        )

    swap_parquet_rewrite(path, _stage)
    return new_meta


def grid_drift(
    df: DataFrame, meta: dict, n_checks: int = 16
) -> dict[str, float]:
    """How far the live data has drifted off the recorded bucket
    grid, per clustering column: the recorded cut point at rank
    ``i/buckets`` should still sit at empirical CDF ``i/buckets``;
    drift = max |F̂(cut_i) − i/buckets| over ``n_checks`` evenly
    spaced cuts. 0 = grid still equi-depth; 0.5 = half the mass moved
    across a cut (appends concentrated in few buckets → blurred
    min/max windows). ONE aggregation job for all columns and checks
    (each probe is a SUM of a boolean cast — no sort, no quantile
    re-estimation), driver gets n_cols × n_checks doubles."""
    buckets = 1 << int(meta["bits"])
    aggs = []
    spec: list[tuple[str, int, float]] = []
    for c in meta["cols"]:
        bounds = meta["bounds"][c]
        step = max(1, len(bounds) // n_checks)
        for i in range(step - 1, len(bounds), step):
            spec.append((c, len(spec), (i + 1) / buckets))
            aggs.append(
                F.avg(
                    (F.col(c).cast("double") <= F.lit(float(bounds[i])))
                    .cast("double")
                ).alias(f"_p{len(spec) - 1}")
            )
    row = df.agg(*aggs).collect()[0]
    out: dict[str, float] = {}
    for c, k, want in spec:
        got = row[f"_p{k}"]
        if got is None:
            continue
        out[c] = max(out.get(c, 0.0), abs(float(got) - want))
    return out


def layout_maintenance_check(
    spark,
    path: str,
    max_files: int = 256,
    max_appends: int = 16,
    max_drift: float = 0.10,
    drift_sample_fraction: float | None = None,
) -> dict:
    """Decide whether a Z-ordered table is due for
    :func:`relayout_zordered`: (a) small-file accumulation — appended
    batches each add files, and scans pay per-file open costs; (b)
    append count since the last layout; (c) grid drift — appends
    bucketed on a frozen grid stop being equi-depth when the data
    distribution moves, blurring min/max windows
    (:func:`grid_drift`). Returns the measurements plus
    ``recommend``/``reasons``; :func:`maintain_zordered` acts on it.
    The drift probe is one aggregation job (optionally sampled); the
    file count is a listing."""
    meta = read_layout_meta(path)
    if meta is None:
        raise ValueError(f"{path} has no _layout.json - not a Z-ordered table")
    n_files = sum(
        1
        for _dp, _dns, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet") and not fn.startswith((".", "_"))
    )
    df = spark.read.parquet(path)
    if drift_sample_fraction:
        df = df.sample(fraction=drift_sample_fraction, seed=7)
    drift = grid_drift(df, meta)
    worst = max(drift.values(), default=0.0)
    reasons = []
    if n_files > max_files:
        reasons.append(f"files {n_files} > {max_files}")
    if int(meta.get("appends", 0)) > max_appends:
        reasons.append(f"appends {meta.get('appends')} > {max_appends}")
    if worst > max_drift:
        reasons.append(f"grid drift {worst:.3f} > {max_drift}")
    return {
        "files": n_files,
        "appends": int(meta.get("appends", 0)),
        "drift": drift,
        "max_drift": worst,
        "recommend": bool(reasons),
        "reasons": reasons,
    }


def maintain_zordered(
    spark,
    path: str,
    max_files: int = 256,
    max_appends: int = 16,
    max_drift: float = 0.10,
    target_files: int | None = None,
    sample_fraction: float | None = None,
) -> dict:
    """The lifecycle loop in one call: run
    :func:`layout_maintenance_check` and, when it recommends,
    :func:`relayout_zordered`. Returns the check dict plus
    ``relayout_ran``. Safe to call every maintenance window — a
    healthy table costs one listing + one aggregation job and no
    rewrite."""
    check = layout_maintenance_check(
        spark,
        path,
        max_files=max_files,
        max_appends=max_appends,
        max_drift=max_drift,
        drift_sample_fraction=sample_fraction,
    )
    if check["recommend"]:
        relayout_zordered(
            spark,
            path,
            target_files=target_files,
            sample_fraction=sample_fraction,
        )
    return {**check, "relayout_ran": check["recommend"]}


def read_layout_meta(path: str) -> dict | None:
    mf = os.path.join(path, LAYOUT_META)
    if not os.path.isfile(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def _comparable_min_max(mn, mx, lo, hi):
    """Normalize raw pyarrow row-group statistics against box bounds
    before comparing: physical-type stats for decimal/string/binary
    columns can be bytes or Decimal while the box holds ints — a raw
    ``st.min > hi`` would raise TypeError (or, worse, order
    incorrectly). Numeric (int/float/Decimal) stats compare against
    numeric bounds; str/bytes/date-like only against the SAME type.
    Returns (min, max) when a valid comparison exists, else None —
    and None means 'not prunable', never a wrong prune."""
    import datetime
    import decimal

    num = (int, float, decimal.Decimal)

    def _is_num(x):
        return isinstance(x, num) and not isinstance(x, bool)

    if all(_is_num(x) for x in (mn, mx, lo, hi)):
        return mn, mx
    for t in (str, bytes, datetime.datetime, datetime.date):
        if all(isinstance(x, t) for x in (mn, mx, lo, hi)):
            if t is datetime.date and any(
                isinstance(x, datetime.datetime) for x in (mn, mx, lo, hi)
            ):
                return None  # mixed date/datetime does not order
            return mn, mx
    return None


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
                try:
                    # pyarrow refuses to logically cast stats for some
                    # physical types (e.g. fixed-len-byte-array
                    # decimals raise ArrowNotImplementedError on
                    # .min) — unreadable stats mean no pruning
                    raw_mn, raw_mx = st.min, st.max
                except Exception:
                    continue
                norm = _comparable_min_max(raw_mn, raw_mx, lo, hi)
                if norm is None:
                    continue  # incomparable types: honest = no pruning
                mn, mx = norm
                if mn > hi or mx < lo:
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
