"""Slowly-changing-dimension type 2 (SCD2) versioning.

The reference's upsert history (M1/M8: overwrite + append-only change
log) combined gives dimension versioning; warehouses express that as
SCD2 rows with validity intervals. On Delta this is a single
``MERGE``; the portable plan below is the same join-classify-union
shape the engine uses for the other mutations.

Scale: one shuffle on the key (the full-outer join); history rows
(``is_current = false``) never join — they union straight through,
so the cost tracks the CURRENT slice, not the full history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
) -> DataFrame:
    """Apply an incoming snapshot to an SCD2 dimension.

    ``dim`` columns: key, tracked…, valid_from, valid_to, is_current.
    ``incoming`` columns: key, tracked…. Rows whose tracked values
    changed get their current version closed (valid_to = effective_ts)
    and a new open version inserted; brand-new keys insert an open
    version; unchanged rows pass through untouched.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    cur = current.select(
        key,
        "valid_from",
        "valid_to",
        "is_current",
        *[F.col(c).alias(f"_old_{c}") for c in tracked],
    )
    inc = incoming.select(key, *[F.col(c).alias(f"_new_{c}") for c in tracked])
    inc_present = incoming.select(key).withColumn("_inc", F.lit(True))
    joined = cur.join(inc, key, "full_outer").join(inc_present, key, "left")

    is_new_key = F.col("valid_from").isNull()
    changed = F.col("_inc").isNotNull() & ~is_new_key & _differs(tracked)

    closed = joined.filter(changed).select(
        key,
        *[F.col(f"_old_{c}").alias(c) for c in tracked],
        "valid_from",
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    unchanged = joined.filter(~changed & ~is_new_key).select(
        key,
        *[F.col(f"_old_{c}").alias(c) for c in tracked],
        "valid_from",
        "valid_to",
        F.lit(True).alias("is_current"),
    )
    opened = joined.filter(changed | is_new_key).select(
        key,
        *[F.col(f"_new_{c}").alias(c) for c in tracked],
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        history.select(key, *tracked, "valid_from", "valid_to", "is_current")
        .unionByName(closed)
        .unionByName(unchanged)
        .unionByName(opened)
    )
