"""CDC / crawl-history operators (SURVEY.md §2.2 P9, §2.5 W4/W8,
§2.9 M7/M8, §2.10 T1).

The reference keeps an append-only ``crawl_history`` log and, per
batch, compares incoming state against the latest stored snapshot
(reference postgres_storage.py:1250-1512). Batch Spark expression:
one window over (product_id ORDER BY crawled_at) gives every
previous-value column in a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# Flash-sale rule (reference postgres_storage.py:1358-1366):
# discount ≥30% or absolute discount ≥100k VND.
FLASH_SALE_MIN_PCT = 30
FLASH_SALE_MIN_AMOUNT = 100_000


def latest_per_product(history: DataFrame) -> DataFrame:
    """W4 — latest snapshot per product (`DISTINCT ON` port,
    reference postgres_storage.py:1283-1305); deterministic tie-break
    on history_id."""
    w = W.partitionBy("product_id").orderBy(
        F.col("crawled_at").desc(), F.col("history_id").desc()
    )
    return (
        history.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _chg(cur: Column, prev: Column) -> Column:
    return F.when(prev.isNotNull(), cur - prev)


def with_change_columns(history: DataFrame) -> DataFrame:
    """P9 + W8 — change columns vs the previous snapshot, plus the
    reference's crawl_type classification
    (reference postgres_storage.py:1317-1413):

    - ``price_change`` / ``price_change_percent`` / ``sales_change``
    - ``is_flash_sale``: discount% ≥ 30 OR discount amount ≥ 100000
    - ``crawl_type``: first_seen | price_change | sales_change |
      no_change (price takes precedence over sales, as in the
      reference's decision order).
    """
    w = W.partitionBy("product_id").orderBy(
        F.col("crawled_at").asc(), F.col("history_id").asc()
    )
    prev_price = F.lag("price").over(w)
    prev_orig = F.lag("original_price").over(w)
    prev_disc = F.lag("discount_percent").over(w)
    prev_sales = F.lag("sales_count").over(w)
    discount_amount = F.col("original_price") - F.col("price")
    return (
        history.withColumn("previous_price", prev_price)
        .withColumn("previous_original_price", prev_orig)
        .withColumn("previous_discount_percent", prev_disc)
        .withColumn("previous_sales_count", prev_sales)
        .withColumn("price_change", F.round(_chg(F.col("price"), prev_price), 2))
        .withColumn(
            "price_change_percent",
            F.when(
                prev_price.isNotNull() & (prev_price > 0),
                F.round((F.col("price") - prev_price) / prev_price * 100, 2),
            ),
        )
        .withColumn("sales_change", _chg(F.col("sales_count"), prev_sales))
        .withColumn("discount_amount", F.round(discount_amount, 2))
        .withColumn(
            "is_flash_sale",
            (F.col("discount_percent") >= FLASH_SALE_MIN_PCT)
            | (discount_amount >= FLASH_SALE_MIN_AMOUNT),
        )
        .withColumn(
            "crawl_type",
            # first_seen = no previous ROW (not "previous price was
            # NULL"), and null-SAFE change compares — the reference's
            # Python `!=` treats None-vs-value as a change and keys
            # "first crawl" off row presence (postgres_storage.py:
            # 1318-1345); plain Spark != would misroute NULL prices
            # into no_change and NULL-price predecessors into
            # first_seen.
            F.when(F.lag(F.lit(1)).over(w).isNull(), "first_seen")
            .when(~F.col("price").eqNullSafe(prev_price), "price_change")
            .when(~F.col("sales_count").eqNullSafe(prev_sales), "sales_change")
            .otherwise("no_change"),
        )
    )


def cdc_append_rows(history: DataFrame) -> DataFrame:
    """M8 — the rows the reference would append: everything except
    ``no_change`` (reference postgres_storage.py:1382-1413 inserts on
    change, first-seen, or improvement)."""
    return with_change_columns(history).filter(F.col("crawl_type") != "no_change")


def retention_buckets(history: DataFrame, now: str) -> DataFrame:
    """M7 — retention policy: keep (<6 months), archive (6-12 months),
    delete (>12 months) (reference postgres_storage.py:1799-1857).

    At scale the history table is partitioned by month and this
    becomes partition moves/drops, not row scans.
    """
    now_ts = F.lit(now).cast("timestamp")
    bucket = (
        F.when(F.col("crawled_at") < now_ts - F.expr("INTERVAL 12 MONTHS"), "delete")
        .when(F.col("crawled_at") < now_ts - F.expr("INTERVAL 6 MONTHS"), "archive")
        .otherwise("keep")
    )
    return history.withColumn("retention_bucket", bucket)


def apply_retention(
    spark,
    history: DataFrame | None,
    base_path: str,
    archive_path: str,
    now: str,
    archive_months: int = 6,
    delete_months: int = 12,
) -> dict:
    """M7 — enforce the retention policy with partition operations
    (reference postgres_storage.py:1799-1857 ``cleanup_old_history``:
    archive 6-12-month rows into ``crawl_history_archive``, delete
    >12-month rows).

    The history dataset is written partitioned by ``month``
    (``yyyy-MM`` of ``crawled_at``), so retention is metadata work,
    not row scans: an entirely-expired month partition is dropped, an
    entirely-archivable one is MOVED (directory rename) into the
    archive dataset. Months straddling a cutoff stay in place —
    conservative by design; they roll over on a later run. At 100 TB
    this is the only shape that works: the move/drop cost is O(months
    touched), independent of row count.

    Returns ``{"kept_months": [...], "archived_months": [...],
    "deleted_months": [...]}``.

    If ``base_path`` is already a ``month=``-partitioned dataset the
    full materialization is SKIPPED and retention runs directly on the
    existing partitions — re-applying the policy is pure metadata work
    (no full-dataset rewrite, which would be absurd at 100 TB). Months
    present in ``history`` but missing on disk are still append-written
    (O(new months), never a rewrite) so caller-supplied rows are never
    silently dropped; pass ``history=None`` to skip even that and run
    on-disk-only. On first materialization ``history`` must not be a
    lazy read of ``base_path`` itself (the overwrite would clobber its
    own input) — checkpoint first.

    Archiving a month whose partition already exists in the archive
    (late rows for a previously-archived month) MERGES the data files
    into the existing partition — never nesting ``month=X/month=X``,
    never overwriting an existing archive file.
    """
    import shutil
    from datetime import datetime
    from pathlib import Path

    # NULL crawled_at lands in Hive's default partition on the initial
    # write; the append diff below uses the same name so re-applied
    # NULL-month rows are neither dropped nor crashed on.
    null_part = "__HIVE_DEFAULT_PARTITION__"
    base = Path(base_path)
    existing = {p.name.split("=", 1)[1] for p in base.glob("month=*")}
    if not existing:
        if history is None:
            raise ValueError(
                f"apply_retention: {base_path} has no month= partitions and "
                "history=None — nothing to materialize or retain"
            )
        hist = history.withColumn("month", F.date_format("crawled_at", "yyyy-MM"))
        hist.write.mode("overwrite").partitionBy("month").parquet(base_path)
    elif history is not None:
        # Re-apply with caller rows: append ONLY months not yet on disk
        # (a lazy re-read of base_path diffs to nothing and writes
        # nothing; existing months never rewritten).
        hist = history.withColumn("month", F.date_format("crawled_at", "yyyy-MM"))
        seen = {
            r["month"] if r["month"] is not None else null_part
            for r in hist.select("month").distinct().collect()
        }
        new_months = sorted(seen - existing)
        if new_months:
            cond = F.col("month").isin([m for m in new_months if m != null_part])
            if null_part in new_months:
                cond = cond | F.col("month").isNull()
            hist.filter(cond).write.mode("append").partitionBy("month").parquet(
                base_path
            )

    def _shift_month(ts: datetime, months: int) -> str:
        y, m = ts.year, ts.month - months
        while m <= 0:
            y, m = y - 1, m + 12
        return f"{y:04d}-{m:02d}"

    now_dt = datetime.fromisoformat(now)
    delete_cutoff = _shift_month(now_dt, delete_months)
    archive_cutoff = _shift_month(now_dt, archive_months)

    result: dict = {"kept_months": [], "archived_months": [], "deleted_months": []}
    arch = Path(archive_path)
    arch.mkdir(parents=True, exist_ok=True)
    for part_dir in sorted(base.glob("month=*")):
        month = part_dir.name.split("=", 1)[1]
        if month < delete_cutoff:
            shutil.rmtree(part_dir)
            result["deleted_months"].append(month)
        elif month < archive_cutoff:
            dest = arch / part_dir.name
            if dest.exists():
                # Late rows for an already-archived month: merge file-by-
                # file (shutil.move on an existing dir would NEST
                # month=X inside month=X, corrupting the layout).
                for f in sorted(part_dir.iterdir()):
                    if f.name.startswith(("_", ".")):
                        continue  # _SUCCESS / checksums: metadata, not data
                    target = dest / f.name
                    n = 0
                    while target.exists():
                        n += 1
                        target = dest / f"late-{n:03d}-{f.name}"
                    shutil.move(str(f), str(target))
                shutil.rmtree(part_dir)
            else:
                shutil.move(str(part_dir), str(dest))
            result["archived_months"].append(month)
        else:
            result["kept_months"].append(month)
    return result


def crawl_priority(
    products: DataFrame, history: DataFrame, now: str, limit: int = 10
) -> DataFrame:
    """T1/P14/J2/W3 — the incremental crawl planner
    (reference incremental_crawler.py:12-102):

    - price-change count per product in the last 30 days + last crawl
      time (J2 filtered-join + agg);
    - priority: 1 = never crawled, 2 = hot (>5 changes), 3 = stale
      (>24h), 4 = fresh (P14 CASE cascade);
    - ordered by (priority ASC, change_count DESC, last_crawled ASC
      NULLS FIRST) with a per-run LIMIT (W3).
    """
    now_ts = F.lit(now).cast("timestamp")
    changed = with_change_columns(history).filter(
        (F.col("crawl_type") == "price_change")
        & (F.col("crawled_at") > now_ts - F.expr("INTERVAL 30 DAYS"))
    )
    stats = history.groupBy("product_id").agg(
        F.max("crawled_at").alias("last_crawled_at")
    )
    changes = changed.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("price_change_count")
    )
    joined = (
        products.join(stats, "product_id", "left")
        .join(changes, "product_id", "left")
        .withColumn(
            "price_change_count", F.coalesce(F.col("price_change_count"), F.lit(0))
        )
    )
    priority = (
        F.when(F.col("last_crawled_at").isNull(), 1)
        .when(F.col("price_change_count") > 5, 2)
        .when(F.col("last_crawled_at") < now_ts - F.expr("INTERVAL 24 HOURS"), 3)
        .otherwise(4)
    )
    return (
        joined.withColumn("priority", priority)
        .orderBy(
            F.col("priority").asc(),
            F.col("price_change_count").desc(),
            F.col("last_crawled_at").asc_nulls_first(),
            F.col("product_id").asc(),
        )
        .limit(limit)
    )
