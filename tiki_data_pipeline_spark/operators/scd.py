"""Slowly-changing-dimension type 2 (SCD2) versioning.

The reference's upsert history (M1/M8: overwrite + append-only change
log) combined gives dimension versioning; warehouses express that as
SCD2 rows with validity intervals. On Delta this is a single
``MERGE``; the portable plan below is the same join-classify shape the
engine uses for the other mutations.

Scale: one shuffle on the key (the full-outer join), executed ONCE —
each joined row expands to its 1-2 output versions through a single
explode projection instead of three filtered re-reads of the join.
History rows (``is_current = false``) never join — they union straight
through, so the cost tracks the CURRENT slice, not the full history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _differs(tracked: list[str]) -> Column:
    cond = F.lit(False)
    for c in tracked:
        # null-safe inequality: NULL → value is a real change
        cond = cond | ~F.col(f"_new_{c}").eqNullSafe(F.col(f"_old_{c}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    incoming: DataFrame,
    key: str,
    tracked: list[str],
    effective_ts: str,
    dedupe_incoming: bool = True,
) -> DataFrame:
    """Apply an incoming snapshot to an SCD2 dimension.

    ``dim`` columns: key, tracked…, valid_from, valid_to, is_current.
    ``incoming`` columns: key, tracked…. Rows whose tracked values
    changed get their current version closed (valid_to = effective_ts)
    and a new open version inserted; brand-new keys insert an open
    version; unchanged rows pass through untouched.

    A snapshot with duplicate keys would fan out through the join and
    open multiple current versions for the same key — corrupting the
    dimension — so incoming is deduped to one row per key first
    (deterministic: lowest tracked-tuple wins). Pass
    ``dedupe_incoming=False`` only when uniqueness is guaranteed
    upstream.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    if dedupe_incoming:
        dw = W.partitionBy(key).orderBy(*[F.col(c) for c in tracked])
        incoming = (
            incoming.withColumn("_rn", F.row_number().over(dw))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    cur = current.select(
        key,
        "valid_from",
        "valid_to",
        *[F.col(c).alias(f"_old_{c}") for c in tracked],
    )
    inc = incoming.select(
        key, *[F.col(c).alias(f"_new_{c}") for c in tracked]
    ).withColumn("_inc", F.lit(True))
    # explicit presence marker — keying "new" off valid_from IS NULL
    # would destroy an existing current row whose valid_from is NULL
    cur = cur.withColumn("_cur", F.lit(True))
    joined = cur.join(inc, key, "full_outer")

    is_new_key = F.col("_cur").isNull()
    changed = F.col("_inc").isNotNull() & ~is_new_key & _differs(tracked)

    def _version(src: str, valid_from: Column, valid_to: Column, is_cur: bool) -> Column:
        return F.struct(
            F.col(key).alias(key),
            *[F.col(f"_{src}_{c}").alias(c) for c in tracked],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            F.lit(is_cur).alias("is_current"),
        )

    closed = _version("old", F.col("valid_from"), eff, False)
    opened = _version("new", eff, F.lit(None).cast("timestamp"), True)
    unchanged = _version("old", F.col("valid_from"), F.col("valid_to"), True)

    versions = (
        F.when(changed, F.array(closed, opened))
        .when(is_new_key, F.array(opened))
        .otherwise(F.array(unchanged))
    )
    applied = joined.select(F.explode(versions).alias("_r")).select("_r.*")
    return history.select(
        key, *tracked, "valid_from", "valid_to", "is_current"
    ).unionByName(applied)
