"""Oracle-checked CDC / incremental / upsert queries (SURVEY.md
§2.2 P9, §2.5 W4/W8, §2.9 M2/M5/M7/M8, §2.10 T1) on the
crawl_history + products fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark import transform as TR
from tiki_data_pipeline_spark.operators import history as HI
from tiki_data_pipeline_spark.operators import merge as ME
from tiki_data_pipeline_spark.plans.registry import query
from tiki_data_pipeline_spark.plans.transform_queries import PRODUCTS_CTE

_NOW = FX.HISTORY_NOW

# Change-column window SQL shared by several oracles (mirror of
# history.with_change_columns).
_CHANGES_SQL = """
changes AS (
  SELECT history_id, product_id, price, original_price, discount_percent,
         sales_count, crawled_at,
         LAG(price) OVER w AS previous_price,
         LAG(original_price) OVER w AS previous_original_price,
         LAG(discount_percent) OVER w AS previous_discount_percent,
         LAG(sales_count) OVER w AS previous_sales_count,
         ROUND(price - LAG(price) OVER w, 2) AS price_change,
         CASE WHEN LAG(price) OVER w IS NOT NULL AND LAG(price) OVER w > 0
              THEN ROUND((price - LAG(price) OVER w) / LAG(price) OVER w * 100, 2)
         END AS price_change_percent,
         sales_count - LAG(sales_count) OVER w AS sales_change,
         ROUND(original_price - price, 2) AS discount_amount,
         (discount_percent >= 30 OR original_price - price >= 100000) AS is_flash_sale,
         CASE WHEN ROW_NUMBER() OVER w = 1 THEN 'first_seen'
              WHEN price IS DISTINCT FROM LAG(price) OVER w THEN 'price_change'
              WHEN sales_count IS DISTINCT FROM LAG(sales_count) OVER w
                THEN 'sales_change'
              ELSE 'no_change' END AS crawl_type
  FROM crawl_history
  WINDOW w AS (PARTITION BY product_id ORDER BY crawled_at ASC, history_id ASC)
)
"""

_CHANGE_COLS = [
    "history_id", "product_id", "price", "original_price", "discount_percent",
    "sales_count", "crawled_at", "previous_price", "previous_original_price",
    "previous_discount_percent", "previous_sales_count", "price_change",
    "price_change_percent", "sales_change", "discount_amount", "is_flash_sale",
    "crawl_type",
]


@query(
    "history_latest_per_key",
    oracle=f"""
    WITH {FX.crawl_history_cte()}
    SELECT history_id, product_id, price, original_price, discount_percent,
           sales_count, crawled_at
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY product_id ORDER BY crawled_at DESC, history_id DESC) AS rn
      FROM crawl_history
    ) t WHERE rn = 1
    """,
)
def history_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — latest snapshot per product (DISTINCT ON port)."""
    return HI.latest_per_product(FX.crawl_history_df(spark))


@query(
    "history_change_detection",
    oracle=f"""
    WITH {FX.crawl_history_cte()},
    {_CHANGES_SQL}
    SELECT {', '.join(_CHANGE_COLS)} FROM changes
    """,
)
def history_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/W8 — previous-value columns + change typing per snapshot."""
    return HI.with_change_columns(FX.crawl_history_df(spark)).select(*_CHANGE_COLS)


@query(
    "history_cdc_append",
    oracle=f"""
    WITH {FX.crawl_history_cte()},
    {_CHANGES_SQL}
    SELECT {', '.join(_CHANGE_COLS)} FROM changes WHERE crawl_type <> 'no_change'
    """,
)
def history_cdc_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — the append set: changed / first-seen rows only."""
    return HI.cdc_append_rows(FX.crawl_history_df(spark)).select(*_CHANGE_COLS)


@query(
    "history_retention_buckets",
    oracle=f"""
    WITH {FX.crawl_history_cte()}
    SELECT history_id, product_id, crawled_at,
           CASE WHEN crawled_at < TIMESTAMP '{_NOW}' - INTERVAL 12 MONTH THEN 'delete'
                WHEN crawled_at < TIMESTAMP '{_NOW}' - INTERVAL 6 MONTH THEN 'archive'
                ELSE 'keep' END AS retention_bucket
    FROM crawl_history
    """,
)
def history_retention_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — keep / archive (6-12mo) / delete (>12mo) routing."""
    return HI.retention_buckets(FX.crawl_history_df(spark), _NOW).select(
        "history_id", "product_id", "crawled_at", "retention_bucket"
    )


@query(
    "incremental_crawl_priority",
    oracle=f"""
    WITH {PRODUCTS_CTE},
    {FX.crawl_history_cte()},
    {_CHANGES_SQL},
    stats AS (
      SELECT product_id, MAX(crawled_at) AS last_crawled_at
      FROM crawl_history GROUP BY product_id
    ),
    n_changes AS (
      SELECT product_id, COUNT(*) AS price_change_count
      FROM changes
      WHERE crawl_type = 'price_change'
        AND crawled_at > TIMESTAMP '{_NOW}' - INTERVAL 30 DAY
      GROUP BY product_id
    )
    SELECT p.product_id, s.last_crawled_at,
           COALESCE(n.price_change_count, 0) AS price_change_count,
           CASE WHEN s.last_crawled_at IS NULL THEN 1
                WHEN COALESCE(n.price_change_count, 0) > 5 THEN 2
                WHEN s.last_crawled_at < TIMESTAMP '{_NOW}' - INTERVAL 24 HOUR THEN 3
                ELSE 4 END AS priority
    FROM products p
    LEFT JOIN stats s ON p.product_id = s.product_id
    LEFT JOIN n_changes n ON p.product_id = n.product_id
    ORDER BY priority ASC, price_change_count DESC,
             last_crawled_at ASC NULLS FIRST, p.product_id ASC
    LIMIT 10
    """,
)
def incremental_crawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/P14/J2/W3 — the incremental crawl planner."""
    products = TR.transform_products(FX.raw_products_df(spark))
    history = FX.crawl_history_df(spark)
    return HI.crawl_priority(products, history, _NOW).select(
        "product_id", "last_crawled_at", "price_change_count", "priority"
    )


@query(
    "history_sales_velocity",
    oracle=f"""
    WITH {FX.crawl_history_cte()},
    recentered AS (
      SELECT product_id,
             CAST(epoch(crawled_at) AS BIGINT)
               - MIN(CAST(epoch(crawled_at) AS BIGINT))
                   OVER (PARTITION BY product_id) AS x,
             CAST(sales_count AS BIGINT) AS y
      FROM crawl_history
    ),
    sums AS (
      SELECT product_id, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM recentered GROUP BY product_id
    )
    SELECT product_id, n,
           CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE) * 86400.0, 4)
           END AS sales_per_day
    FROM sums
    """,
)
def history_sales_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 sales_velocity — least-squares sales-per-day slope per
    product over its history. Integer sums over RECENTERED epochs
    (x − min x per product keeps n·Σx² inside bigint), one final
    double division shared bit-for-bit by both engines."""
    history = FX.crawl_history_df(spark)
    w = W.partitionBy("product_id")
    epoch = F.unix_timestamp("crawled_at").cast("bigint")
    recentered = history.select(
        "product_id",
        (epoch - F.min(epoch).over(w)).alias("x"),
        F.col("sales_count").cast("bigint").alias("y"),
    )
    sums = recentered.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / denom.cast("double")
        * 86400.0
    )
    return sums.select(
        "product_id",
        "n",
        F.when((F.col("n") >= 2) & (denom != 0), F.round(slope, 4)).alias(
            "sales_per_day"
        ),
    )


# --------------------------------------------------------------------------
# Upsert semantics (M2 + F21)

_INCOMING_COLS = [
    ("product_id", "VARCHAR"),
    ("name", "VARCHAR"),
    ("price", "BIGINT"),
    ("seller_name", "VARCHAR"),
    ("brand", "VARCHAR"),
]

_INCOMING_ROWS = [
    # empty name → keep old; new price wins; NULL seller → keep old
    ("100001", "", 380000, None, "Sony Official"),
    # NULL price → keep old; empty brand → keep old
    ("100002", "Áo thun nam mới", None, "New Seller", ""),
    # brand-new product
    ("200001", "Sản phẩm mới", 99000, "Shop Mới", "BrandNew"),
]


@query(
    "upsert_preserve_nonnull",
    oracle=f"""
    WITH {PRODUCTS_CTE},
    {FX.values_cte('incoming', _INCOMING_COLS, _INCOMING_ROWS)}
    SELECT COALESCE(c.product_id, i.product_id) AS product_id,
           COALESCE(NULLIF(i.name, ''), c.name) AS name,
           COALESCE(i.price, c.price) AS price,
           COALESCE(NULLIF(i.seller_name, ''), c.seller_name) AS seller_name,
           COALESCE(NULLIF(i.brand, ''), c.brand) AS brand,
           c.product_id IS NULL AS is_new
    FROM products c FULL OUTER JOIN incoming i ON c.product_id = i.product_id
    WHERE i.product_id IS NOT NULL OR c.product_id IS NOT NULL
    """,
)
def upsert_preserve_nonnull_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/F21 — COALESCE(NULLIF(new,''), old) merge of a small batch."""
    current = TR.transform_products(FX.raw_products_df(spark)).select(
        "product_id", "name", "price", "seller_name", "brand"
    )
    incoming = spark.createDataFrame(
        _INCOMING_ROWS,
        schema="product_id string, name string, price bigint,"
        " seller_name string, brand string",
    )
    return ME.upsert_preserve_nonnull(
        current, incoming, "product_id", string_cols=["name", "seller_name", "brand"]
    ).select("product_id", "name", "price", "seller_name", "brand", "is_new")


@query(
    "products_quality_gate",
    oracle=f"""
    WITH {PRODUCTS_CTE}
    SELECT product_id, seller_name, brand, rating_average,
           (seller_name IS NULL OR brand IS NULL OR rating_average IS NULL)
             AS quarantined
    FROM products
    """,
)
def products_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — quality-gated delete with quarantine flag (no silent drops)."""
    products = TR.transform_products(FX.raw_products_df(spark))
    return ME.quality_gated_delete(products).select(
        "product_id", "seller_name", "brand", "rating_average", "quarantined"
    )
