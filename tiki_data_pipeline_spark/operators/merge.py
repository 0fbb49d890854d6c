"""Upsert / MERGE semantics without Delta (SURVEY.md §2.9 M1-M6).

The reference upserts into Postgres with ``INSERT .. ON CONFLICT``
in two flavors (reference loader.py:232-293, postgres_storage.py:
980-1012). With no Delta jars in this environment, MERGE is expressed
as a full-outer join + per-column coalesce + rewrite — the portable
fallback named in SURVEY §7.3. On a Delta/Iceberg deployment each of
these maps 1:1 onto ``MERGE INTO``.

Scale: the join shuffles both sides on the key once; with the target
table bucketed by the merge key the shuffle disappears for the big
side. Incoming batches are typically small → broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.functions.scalars import coalesce_nullif


def upsert_overwrite(current: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """M1 — ON CONFLICT DO UPDATE SET col = EXCLUDED.col for every
    column: incoming row wins wholesale (reference loader.py:232-293)."""
    cols = [c for c in current.columns if c != key]
    cur = current.select(key, *[F.col(c).alias(f"_old_{c}") for c in cols])
    # row-wins semantics: when the incoming side exists, every column
    # comes from it (including its NULLs) — presence tracked by a
    # lit(True) marker ON the incoming side (a NULL _new_ column can't
    # distinguish "absent row"; a separate presence join would fan out
    # quadratically on duplicate incoming keys).
    inc = incoming.select(
        key, *[F.col(c).alias(f"_new_{c}") for c in cols]
    ).withColumn("_inc", F.lit(True))
    joined = cur.join(inc, key, "full_outer")
    picked = [
        F.when(F.col("_inc").isNotNull(), F.col(f"_new_{c}"))
        .otherwise(F.col(f"_old_{c}"))
        .alias(c)
        for c in cols
    ]
    return joined.select(key, *picked)


def upsert_preserve_nonnull(
    current: DataFrame, incoming: DataFrame, key: str, string_cols: list[str]
) -> DataFrame:
    """M2 — preserve-on-upsert: only non-empty incoming values replace
    the stored ones, via ``COALESCE(NULLIF(new,''), old)`` for strings
    and ``COALESCE(new, old)`` otherwise
    (reference postgres_storage.py:980-1012, F21 semantics).

    Adds ``is_new`` = row did not exist in ``current``.
    """
    cur_cols = [c for c in current.columns if c != key]
    inc_cols = [c for c in incoming.columns if c != key]
    # presence marker on the current side (a separate presence join
    # would fan out quadratically on duplicate keys)
    cur = current.select(
        key, *[F.col(c).alias(f"_old_{c}") for c in cur_cols]
    ).withColumn("_old_present", F.lit(True))
    inc = incoming.select(key, *[F.col(c).alias(f"_new_{c}") for c in inc_cols])
    joined = cur.join(inc, key, "full_outer")
    out_cols = []
    for c in cur_cols + [c for c in inc_cols if c not in cur_cols]:
        new_c = F.col(f"_new_{c}") if c in inc_cols else None
        old_c = F.col(f"_old_{c}") if c in cur_cols else None
        if new_c is None:
            out_cols.append(old_c.alias(c))
        elif old_c is None:
            out_cols.append(new_c.alias(c))
        elif c in string_cols:
            out_cols.append(coalesce_nullif(new_c, old_c).alias(c))
        else:
            out_cols.append(F.coalesce(new_c, old_c).alias(c))
    return joined.select(
        key, *out_cols, F.col("_old_present").isNull().alias("is_new")
    )


def insert_if_absent(current: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """M3 — ON CONFLICT DO NOTHING: append only unseen keys
    (reference postgres_storage.py:1026-1039)."""
    fresh = incoming.join(current.select(key), key, "left_anti")
    return current.unionByName(fresh, allowMissingColumns=True)


def quality_gated_delete(
    products: DataFrame, required: list[str] | None = None
) -> DataFrame:
    """M5 — flag rows missing seller/brand/rating for deletion; the
    caller keeps ``quarantined = false`` rows and routes the rest to a
    quarantine table (reference postgres_storage.py:1667-1797 deletes
    them; we never destroy rows silently)."""
    required = required or ["seller_name", "brand", "rating_average"]
    cond = F.lit(False)
    for c in required:
        cond = cond | F.col(c).isNull()
    return products.withColumn("quarantined", cond)


def merge_into_sql(
    target: str,
    source: str,
    key: str,
    columns: list[str],
    mode: str = "overwrite",
    string_cols: list[str] | None = None,
) -> str:
    """Render the lakehouse ``MERGE INTO`` equivalent of each upsert
    mode — the documented 1:1 swap-in point when Delta/Iceberg jars
    are present (``spark.sql(merge_into_sql(...))`` replaces the
    join-rewrite path; reference merge semantics
    postgres_storage.py:250-356,1899-1961).

    Modes: ``overwrite`` (M1, incoming row wins wholesale),
    ``preserve_nonnull`` (M2, per-column COALESCE(NULLIF) keeps the
    old value when incoming is NULL/empty), ``insert_if_absent``
    (M3, ON CONFLICT DO NOTHING).

    Column and table identifiers are backtick-quoted (Spark SQL
    style); names containing backticks are rejected rather than
    escaped, so no caller-supplied name can break out of the
    rendered statement.
    """

    def qt(ident: str) -> str:
        # table names may be db-qualified; quote each dotted part
        if "`" in ident:
            raise ValueError(f"identifier may not contain backticks: {ident!r}")
        return ".".join(f"`{p}`" for p in ident.split("."))

    def q(ident: str) -> str:
        # column names quote WHOLE — a dot is part of the name, not a
        # qualifier (dot-splitting here would render struct access)
        if "`" in ident:
            raise ValueError(f"identifier may not contain backticks: {ident!r}")
        return f"`{ident}`"

    cols = [c for c in columns if c != key]
    string_cols = set(string_cols or [])
    insert_cols = ", ".join(q(c) for c in [key] + cols)
    insert_vals = ", ".join(f"s.{q(c)}" for c in [key] + cols)
    if mode == "overwrite":
        sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in cols)
        matched = f"WHEN MATCHED THEN UPDATE SET {sets}"
    elif mode == "preserve_nonnull":
        sets = ", ".join(
            f"t.{q(c)} = COALESCE(NULLIF(s.{q(c)}, ''), t.{q(c)})"
            if c in string_cols
            else f"t.{q(c)} = COALESCE(s.{q(c)}, t.{q(c)})"
            for c in cols
        )
        matched = f"WHEN MATCHED THEN UPDATE SET {sets}"
    elif mode == "insert_if_absent":
        matched = ""  # ON CONFLICT DO NOTHING
    else:
        raise ValueError(f"unknown merge mode: {mode}")
    return (
        f"MERGE INTO {qt(target)} t USING {qt(source)} s"
        f" ON t.{q(key)} = s.{q(key)}\n"
        + (matched + "\n" if matched else "")
        + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
