"""Skew-handling join helpers (brief: "skewed keys hurt … salting for
skew, AQE for runtime re-plan").

AQE's skew-join split (on by default in session.py) is the first
line of defense; ``salted_join`` is the explicit fallback for joins
whose hot keys are known or discoverable — e.g. a crawl-events table
where one product id carries half the rows.

Mechanics: the skewed (large) side gets a random salt in [0, n); the
small side is exploded n× with every salt value; the join key becomes
(key, salt). Row multiplication happens only on the SMALL side, and
the hot key's rows spread over n reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``key`` with the large side
    salted across ``n_salts`` sub-partitions. Result is identical to
    ``large.join(small, key, how)`` for inner/left joins."""
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_large.join(salted_small, [key, "_salt"], how)
        .drop("_salt")
    )


def top_keys(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Hot-key probe: the k heaviest join keys with their row counts —
    the skew diagnosis step before choosing salts."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(k)
    )
