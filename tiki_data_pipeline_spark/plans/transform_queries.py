"""Oracle-checked queries for the transform stage + scalar functions.

These run on the inline reference-shaped fixture (fixtures.py) so the
DuckDB oracle can verify reference ETL semantics — the driver tables
have no dirty strings to parse.

Cross-engine parity notes (bugs these encode around):
- DuckDB ``CAST(double AS BIGINT)`` rounds, Spark truncates → both
  sides ``ROUND()`` before casting.
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to replace all
  occurrences; Spark always replaces all.
- DuckDB ``regexp_extract`` returns '' on no-match (same as Spark);
  both sides wrap in NULLIF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark import transform as TR
from tiki_data_pipeline_spark.functions import scalars as S
from tiki_data_pipeline_spark.plans.registry import query

_FINAL_COLS = [
    "product_id",
    "name",
    "url",
    "category_url",
    "category_id",
    "category_path",
    "price",
    "original_price",
    "discount_percent",
    "sales_count",
    "rating_average",
    "review_count",
    "seller_name",
    "seller_id",
    "seller_is_official",
    "brand",
    "stock_available",
    "stock_status",
    "crawled_at",
]

# Shared normalization SQL (the DuckDB mirror of transform.normalize_products).
_NORMALIZE_SQL = """
normalized AS (
  SELECT
    ingest_order,
    TRIM(product_id) AS product_id,
    TRIM(REGEXP_REPLACE(name, '\\s+', ' ', 'g')) AS name,
    TRIM(url) AS url,
    category_url,
    CASE
      WHEN NULLIF(REGEXP_EXTRACT(category_id, '^c?([0-9]+)$', 1), '') IS NOT NULL
        THEN 'c' || REGEXP_EXTRACT(category_id, '^c?([0-9]+)$', 1)
      WHEN NULLIF(REGEXP_EXTRACT(category_url, '/c([0-9]+)', 1), '') IS NOT NULL
        THEN 'c' || REGEXP_EXTRACT(category_url, '/c([0-9]+)', 1)
    END AS category_id,
    category_path,
    TRY_CAST(NULLIF(REGEXP_REPLACE(price_current, '[^0-9]', '', 'g'), '') AS BIGINT) AS price,
    TRY_CAST(NULLIF(REGEXP_REPLACE(price_original, '[^0-9]', '', 'g'), '') AS BIGINT) AS original_price,
    TRY_CAST(NULLIF(REPLACE(REGEXP_EXTRACT(LOWER(TRIM(sales_count_raw)),
        '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 1), ',', '.'), '') AS DOUBLE)
      * (CASE REGEXP_EXTRACT(LOWER(TRIM(sales_count_raw)),
              '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 2)
         WHEN 'k' THEN 1000.0 WHEN 'm' THEN 1000000.0 ELSE 1.0 END) AS sales_double,
    discount_percent AS discount_percent_raw,
    TRY_CAST(rating_avg AS DOUBLE) AS rating_average,
    TRY_CAST(rating_count AS BIGINT) AS review_count,
    TRIM(REGEXP_REPLACE(seller_name, '\\s+', ' ', 'g')) AS seller_t,
    seller_id,
    seller_official AS seller_is_official,
    NULLIF(TRIM(REGEXP_REPLACE(brand, '^Thương hiệu:\\s*', '')), '') AS brand,
    stock_available,
    stock_status,
    COALESCE(TRY_STRPTIME(crawled_at, '%Y-%m-%d %H:%M:%S'),
             TRY_STRPTIME(crawled_at, '%Y-%m-%dT%H:%M:%S'),
             TRY_STRPTIME(crawled_at, '%Y-%m-%dT%H:%M:%S.%f'),
             TRY_STRPTIME(crawled_at, '%Y-%m-%d %H:%M:%S.%f'),
             TRY_STRPTIME(crawled_at, '%Y-%m-%d')) AS crawled_at
  FROM raw_products
),
typed AS (
  SELECT
    ingest_order, product_id, name, url, category_url, category_id, category_path,
    price, original_price,
    CASE WHEN price IS NOT NULL AND price <> 0
              AND original_price IS NOT NULL AND original_price > 0
         THEN ROUND((original_price - price) / original_price * 100, 2)
         ELSE discount_percent_raw END AS discount_percent,
    TRY_CAST(ROUND(sales_double) AS BIGINT) AS sales_count,
    rating_average, review_count,
    CASE WHEN seller_t IS NULL OR LENGTH(seller_t) < 2 OR LENGTH(seller_t) > 100
              OR REGEXP_MATCHES(seller_t, '^[0-9]+$')
              OR REGEXP_MATCHES(LOWER(seller_t),
                 'đã mua|đã bán|sold|bought|xem thêm|more info|chi tiết|loading|đang tải')
              OR REGEXP_MATCHES(seller_t, '^[^\\p{L}\\p{N}_]+$')
              OR REGEXP_MATCHES(seller_t, '^[0-9]+\\s')
         THEN NULL ELSE seller_t END AS seller_name,
    seller_id, seller_is_official, brand, stock_available, stock_status, crawled_at
  FROM normalized
)
"""


# Reusable WITH-fragment: `products` = the full transform output.
# Other query modules (CDC, incremental, upsert) compose on top of it.
PRODUCTS_CTE = f"""{FX.raw_products_cte()},
{_NORMALIZE_SQL},
valid AS (
  SELECT * FROM typed
  WHERE REGEXP_MATCHES(product_id, '^[0-9]+$')
    AND name <> ''
    AND url LIKE 'http%'
    AND price IS NOT NULL AND price > 0
    AND (original_price IS NULL OR price <= original_price)
    AND (rating_average IS NULL OR (rating_average >= 0 AND rating_average <= 5))
),
products AS (
  SELECT {', '.join(_FINAL_COLS)}
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id ORDER BY ingest_order) AS rn
    FROM valid
  ) t WHERE rn = 1
)"""


@query(
    "transform_products",
    oracle=f"""
    WITH {PRODUCTS_CTE}
    SELECT {', '.join(c for c in _FINAL_COLS if c != 'category_path')},
           CASE WHEN category_path IS NULL THEN NULL
                ELSE COALESCE(array_to_string(category_path, ' > '), '') END
             AS category_path
    FROM products
    """,
)
def transform_products_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transform stage on the dirty fixture (P1+P2+P3+validate+D2).

    ``category_path`` is array<string> in the engine API; the QUERY
    projects it to a ' > '-joined string so row canonicalizers that
    can't hash lists still work. NULL array → NULL string on both
    engines (Spark concat_ws would silently fold NULL to ''; DuckDB
    array_to_string folds empty to NULL — both are guarded)."""
    raw = FX.raw_products_df(spark)
    out = TR.transform_products(raw).select(*_FINAL_COLS)
    return out.withColumn(
        "category_path",
        F.when(
            F.col("category_path").isNull(), F.lit(None).cast("string")
        ).otherwise(F.concat_ws(" > ", "category_path")),
    )


@query(
    "product_quality_scores",
    oracle=f"""
    WITH {FX.raw_products_cte()},
    {_NORMALIZE_SQL},
    scored AS (
      SELECT ingest_order, product_id,
        (CASE WHEN product_id IS NOT NULL THEN 1.0 ELSE 0.0 END
         + CASE WHEN name IS NOT NULL AND name <> '' THEN 1.0 ELSE 0.0 END
         + CASE WHEN url IS NOT NULL AND url <> '' THEN 1.0 ELSE 0.0 END
         + CASE WHEN price IS NOT NULL THEN 1.0 ELSE 0.0 END) / 4.0 AS crit_frac,
        (CASE WHEN seller_name IS NOT NULL THEN 1.0 ELSE 0.0 END
         + CASE WHEN brand IS NOT NULL THEN 1.0 ELSE 0.0 END
         + CASE WHEN sales_count IS NOT NULL THEN 1.0 ELSE 0.0 END
         + CASE WHEN rating_average IS NOT NULL THEN 1.0 ELSE 0.0 END) / 4.0 AS imp_frac,
        (CASE WHEN category_path IS NOT NULL AND LEN(category_path) > 0 THEN 1.0 ELSE 0.0 END
         + CASE WHEN stock_status IS NOT NULL THEN 1.0 ELSE 0.0 END) / 2.0 AS opt_frac
      FROM typed
    )
    SELECT ingest_order, product_id,
           CASE WHEN crit_frac = 1.0
                THEN ROUND(0.5 + 0.35 * imp_frac + 0.15 * opt_frac, 4)
                ELSE 0.0 END AS quality_score,
           CASE WHEN crit_frac <> 1.0 THEN 'skip'
                WHEN (CASE WHEN crit_frac = 1.0
                      THEN ROUND(0.5 + 0.35 * imp_frac + 0.15 * opt_frac, 4)
                      ELSE 0.0 END) >= 0.7 THEN 'accept'
                ELSE 'retry' END AS action,
           CASE WHEN crit_frac <> 1.0 THEN 'incomplete'
                WHEN imp_frac = 1.0 THEN 'complete'
                ELSE 'partial' END AS data_quality
    FROM scored
    """,
)
def product_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ completeness score + action cascade (P11-P13) on all rows."""
    raw = FX.raw_products_df(spark)
    normalized = TR.normalize_products(TR.flatten_raw_products(raw))
    return TR.with_quality_score(normalized).select(
        "ingest_order", "product_id", "quality_score", "action", "data_quality"
    )


# --------------------------------------------------------------------------
# Scalar-function parity cases (F1/F2/F5/F6/F7 documented cases from
# reference tests/test_utils.py:28-142 — '2k'→2000, '1.5k'→1500,
# '389.000₫'→389000, product/category id extraction).

_SCALAR_CASES = [
    (1, "389.000₫", "2k", "https://tiki.vn/tai-nghe-p100001", "c4160",
     "https://tiki.vn/sach/c4000"),
    (2, "1.250.000₫", "1.5k", "https://tiki.vn/p/123456", "4160",
     "https://tiki.vn/dien-tu/c1000?utm_source=x"),
    (3, "150000", "đã bán 1.2k", "https://tiki.vn/ao-p-789", "abc",
     "https://tiki.vn/no-id-here"),
    (4, "", "3m", "https://tiki.vn/khong-id", None, None),
    (5, None, "500", "https://tiki.vn/x-p9", "c77", "https://tiki.vn/y/c88"),
    (6, "0₫", None, "https://tiki.vn/-p42-case", "00123", "https://tiki.vn/z/c9?page=2"),
]

_SCALAR_COLS = [
    ("case_id", "INTEGER"),
    ("price_str", "VARCHAR"),
    ("sales_str", "VARCHAR"),
    ("url", "VARCHAR"),
    ("cat_id", "VARCHAR"),
    ("cat_url", "VARCHAR"),
]


@query(
    "scalar_parse_functions",
    oracle=f"""
    WITH {FX.values_cte('cases', _SCALAR_COLS, _SCALAR_CASES)}
    SELECT case_id,
      TRY_CAST(NULLIF(REGEXP_REPLACE(price_str, '[^0-9]', '', 'g'), '') AS BIGINT) AS parsed_price,
      TRY_CAST(ROUND(
        TRY_CAST(NULLIF(REPLACE(REGEXP_EXTRACT(LOWER(TRIM(sales_str)),
            '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 1), ',', '.'), '') AS DOUBLE)
        * (CASE REGEXP_EXTRACT(LOWER(TRIM(sales_str)),
                '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 2)
           WHEN 'k' THEN 1000.0 WHEN 'm' THEN 1000000.0 ELSE 1.0 END)
      ) AS BIGINT) AS parsed_sales,
      NULLIF(REGEXP_EXTRACT(url, '[/-]p[/-]?([0-9]+)', 1), '') AS product_id,
      CASE
        WHEN NULLIF(REGEXP_EXTRACT(cat_id, '^c?([0-9]+)$', 1), '') IS NOT NULL
          THEN 'c' || REGEXP_EXTRACT(cat_id, '^c?([0-9]+)$', 1)
        WHEN NULLIF(REGEXP_EXTRACT(cat_url, '/c([0-9]+)', 1), '') IS NOT NULL
          THEN 'c' || REGEXP_EXTRACT(cat_url, '/c([0-9]+)', 1)
      END AS category_id
    FROM cases
    """,
)
def scalar_parse_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5/F7 parity on the reference's documented cases."""
    df = spark.createDataFrame(
        _SCALAR_CASES,
        schema="case_id int, price_str string, sales_str string, url string,"
        " cat_id string, cat_url string",
    )
    sales_double = S.parse_sales_count(F.col("sales_str"))
    return df.select(
        "case_id",
        S.parse_price(F.col("price_str")).alias("parsed_price"),
        sales_double.alias("parsed_sales"),
        S.extract_product_id_from_url(F.col("url")).alias("product_id"),
        S.normalize_category_id(F.col("cat_id"), F.col("cat_url")).alias("category_id"),
    )
