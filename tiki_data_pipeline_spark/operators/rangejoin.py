"""Range-bucket join against a small interval dimension.

The reference's J11 shape (``fact JOIN dim ON v >= lo AND v < hi``,
e.g. the six price bands of dim_price_segment,
TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1173-1188) is a non-equi join:
Spark can only plan it as a BroadcastNestedLoopJoin, which drags
every fact row through an interpreted row-at-a-time comparison loop
— measured 22 s vs 2 s at 10x sf0.1 when the fact side feeds it
(NOTES.md), and the one plan shape that can't survive a 100 TB fact.

An interval dim is SMALL by definition (bands, tiers, SLA buckets).
So compile the join away: collect the dim once on the driver, verify
the intervals are disjoint, and assign each fact row its interval
index with a literal CASE chain — whole-stage-codegen'd, zero join,
zero shuffle. Dim attributes attach as literal-array lookups on the
index. The result is row-identical to the inner non-equi join.

For interval dims too large to inline (thousands of bands) or
overlapping intervals, the scalable shape is bucket expansion:
``range_join_expanded`` explodes each interval into its covering
fixed-width buckets, equi-joins fact rows on their single bucket, and
re-checks the residual predicate — an ordinary shuffled/broadcast
hash join at any dim size, never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket_attach(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    max_dim_rows: int = 1024,
) -> DataFrame:
    """Inner range join ``fact.value_col in [dim.lo, dim.hi)`` with a
    bounded interval dim, compiled to codegen'd expressions.

    Returns ``fact`` plus every dim column except ``lo_col``/``hi_col``;
    fact rows falling in no interval are dropped (inner-join
    semantics). Raises if the dim exceeds ``max_dim_rows`` or the
    intervals overlap — both mean this rewrite is the wrong tool and
    an explicit bucket-expansion join should be written instead.
    """
    clash = [
        c
        for c in dim.columns
        if c not in (lo_col, hi_col) and c in fact.columns
    ]
    if clash:
        # withColumn would silently OVERWRITE the fact column where a
        # real join raises AMBIGUOUS_REFERENCE — keep that contract
        raise ValueError(
            f"dim attribute column(s) {clash} already exist on the fact "
            "side; rename one side before the range join"
        )
    rows = sorted(dim.collect(), key=lambda r: r[lo_col])
    if len(rows) > max_dim_rows:
        raise ValueError(
            f"interval dim has {len(rows)} rows (> {max_dim_rows}); "
            "use an explicit bucket-expansion equi-join instead"
        )
    for a, b in zip(rows, rows[1:]):
        if b[lo_col] < a[hi_col]:
            raise ValueError(
                f"overlapping intervals: [{a[lo_col]}, {a[hi_col]}) and "
                f"[{b[lo_col]}, {b[hi_col]})"
            )

    v = F.col(value_col)
    idx: Column | None = None
    for i, r in enumerate(rows):
        cond = (v >= F.lit(r[lo_col])) & (v < F.lit(r[hi_col]))
        idx = F.when(cond, F.lit(i)) if idx is None else idx.when(cond, F.lit(i))
    out = (
        fact.withColumn("_range_idx", idx)
        .filter(F.col("_range_idx").isNotNull())
    )
    for c in dim.columns:
        if c in (lo_col, hi_col):
            continue
        lookup = F.array(*[F.lit(r[c]) for r in rows])
        out = out.withColumn(c, F.element_at(lookup, F.col("_range_idx") + 1))
    return out.drop("_range_idx")


def range_join_expanded(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    max_span_buckets: int = 4096,
    broadcast_max_rows: int = 1_000_000,
) -> DataFrame:
    """Inner range join ``fact.value_col in [dim.lo, dim.hi)`` via
    bucket expansion — the shape that scales when the interval dim is
    too large to inline as expressions or its intervals OVERLAP
    (where ``range_bucket_attach`` correctly refuses).

    Each dim interval explodes into the integer buckets of width
    ``bucket_width`` it covers; each fact row computes its single
    bucket; the join is a plain equi-join on the bucket plus the
    residual range predicate. A (fact, interval) match surfaces in
    exactly the fact row's bucket, so no post-join dedup is needed,
    and overlapping intervals yield one row per match — identical to
    the non-equi join's semantics with hash-join physics: the dim
    side grows by span/width, the fact side never duplicates.

    Intervals spanning more than ``max_span_buckets`` buckets raise:
    that means ``bucket_width`` is mis-sized for the dim (expansion
    would bloat the build side), not that the data is wrong.
    """
    w = float(bucket_width)
    lo_b = F.floor(F.col(lo_col) / w).cast("long")
    # [lo, hi) covers buckets floor(lo/w) .. ceil(hi/w)-1: an exact
    # multiple upper bound excludes its own bucket (hi is exclusive)
    hi_b = (F.ceil(F.col(hi_col) / w) - 1).cast("long")
    dimb = dim.withColumn("_span", hi_b - lo_b + 1)
    # one pass answers both guard questions: the per-interval span cap
    # AND the total expanded row count that decides the join strategy.
    # A local dim (literal bands built on the driver) is answered by
    # executeCollect with no tasks launched; a distributed dim pays
    # one small agg job instead of shipping every span to the driver.
    if dimb.isLocal():
        spans = [r["_span"] for r in dimb.select("_span").collect()]
        stats = {
            "_mx": max(spans) if spans else None,
            "_total": sum(spans) if spans else None,
        }
    else:
        stats = dimb.agg(
            F.max("_span").alias("_mx"), F.sum("_span").alias("_total")
        ).collect()[0]
    if stats["_mx"] is not None and stats["_mx"] > max_span_buckets:
        r = dimb.filter(F.col("_span") > max_span_buckets).limit(1).collect()[0]
        raise ValueError(
            f"interval [{r[lo_col]}, {r[hi_col]}) spans {r['_span']} buckets "
            f"(> {max_span_buckets}); raise bucket_width"
        )
    dimb = dimb.drop("_span").withColumn(
        "_dim_bucket", F.explode(F.sequence(lo_b, hi_b))
    )
    if stats["_total"] is not None and stats["_total"] <= broadcast_max_rows:
        # the exploded dim comes from a local relation with no stats;
        # left unhinted, Catalyst estimated it large and broadcast the
        # FACT side instead (BuildLeft over the whole orders scan in
        # the r14 plan capture) — exactly inverted at 100 TB, where
        # the fact side must never be built into a hash relation. The
        # expanded row count just computed makes the decision exact:
        # a bounded dim is pinned as the build side, so the fact side
        # streams with zero exchange; a dim too big to broadcast is
        # left to AQE, which by then sees real sizes on both sides.
        dimb = F.broadcast(dimb)
    factb = fact.withColumn(
        "_fact_bucket", F.floor(F.col(value_col) / w).cast("long")
    )
    v = F.col(value_col)
    return (
        factb.join(
            dimb,
            (F.col("_fact_bucket") == F.col("_dim_bucket"))
            & (v >= F.col(lo_col))
            & (v < F.col(hi_col)),
        )
        .drop("_fact_bucket", "_dim_bucket", lo_col, hi_col)
    )
