"""Distributed global ranking (surrogate-key derivation).

A ``dense_rank() OVER (ORDER BY key)`` with no PARTITION BY collapses
the whole relation into ONE task — the classic unscalable window. For
a UNIQUE natural key (every dim build's situation) the same result is
a two-phase distributed rank:

1. range-partition by the key (each partition holds a contiguous,
   sorted key range);
2. ``row_number`` within each partition (parallel);
3. add per-partition offsets (cumulative counts of the partitions to
   the left — at most ``n_parts`` tiny rows, broadcast back).

Per the reference's SERIAL surrogate keys
(TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1173-1320) the result is the
1-based rank of the natural key — identical to the single-partition
window's output, but parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dense_sk_by_unique_key(
    df: DataFrame, key_col: str, sk_name: str, n_parts: int = 32
) -> DataFrame:
    """Append ``sk_name`` = 1-based global rank of the UNIQUE
    ``key_col`` (equal to dense_rank/row_number over the key's order).

    One range shuffle + one small counts job; the localCheckpoint pins
    partition boundaries so the offsets computed in the counts job
    apply to exactly the rows the window numbered (range partitioning
    samples, so an unpinned plan could re-sample between jobs).
    """
    ranged = (
        df.repartitionByRange(n_parts, F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = (
        ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["n"]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    rn = F.row_number().over(W.partitionBy("_pid").orderBy(key_col))
    return (
        ranged.withColumn("_rn", rn)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(sk_name, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )
