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
overlapping intervals, the scalable shape is bucket expansion
(explode each interval into covering fixed-width buckets, equi-join
on bucket, re-check the residual predicate); no reference workload
needs it, so this module deliberately stops at the bounded case and
raises loudly past ``max_dim_rows``.
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
