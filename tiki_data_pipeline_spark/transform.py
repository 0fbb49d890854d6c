"""Product transform stage (SURVEY.md §2.2 P1-P3, §2.6 D2 + validation).

Port of the reference's ``DataTransformer.transform_products``
(reference src/pipelines/transform/transformer.py:101-451):

1. **P1 flatten** — nested ``price{}/rating{}/seller{}/stock{}``
   structs → wide columns (transformer.py:294-399).
2. **P2 normalize** — trim/collapse whitespace, strip brand prefix,
   lenient numeric coercion (transformer.py:218-292).
3. **P3 discount recompute** — ``(orig-cur)/orig*100`` rounded to 2
   when both prices present (transformer.py:264-274).
4. **Validation filter** — reject rows violating the contract
   (transformer.py:401-451: missing/non-digit id, empty name, non-http
   url, price ≤ 0, current > original, rating outside [0,5]).
5. **D2 dedup** — first-seen-wins by product_id
   (transformer.py:126-155); "first" = lowest ingest_order, made
   explicit so the distributed result is deterministic.

The reference runs this as a ThreadPoolExecutor map over Python
dicts (U1); here it is a single declarative plan — row-parallelism
is Spark's native partition parallelism, and every expression is a
built-in (no Python UDFs), so the stage stays in whole-stage codegen
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.functions import scalars as S


def flatten_raw_products(raw: DataFrame) -> DataFrame:
    """P1 — nested scrape shape → wide columns (transformer.py:294-399)."""
    return raw.select(
        "ingest_order",
        "product_id",
        "name",
        "url",
        "category_url",
        "category_id",
        "category_path",
        F.col("sales_count").alias("sales_count_raw"),
        F.col("price.current_price").alias("price_current"),
        F.col("price.original_price").alias("price_original"),
        F.col("price.discount_percent").alias("discount_percent_raw"),
        F.col("rating.average").alias("rating_avg_raw"),
        F.col("rating.total_reviews").alias("rating_count_raw"),
        F.col("seller.name").alias("seller_name_raw"),
        F.col("seller.seller_id").alias("seller_id"),
        F.col("seller.is_official").alias("seller_is_official"),
        "brand",
        F.col("stock.available").alias("stock_available"),
        F.col("stock.stock_status").alias("stock_status"),
        F.col("crawled_at").alias("crawled_at_raw"),
    )


def normalize_products(flat: DataFrame) -> DataFrame:
    """P2 + P3 — typed, normalized columns from the flat dirty shape."""
    price = S.parse_price(F.col("price_current"))
    original = S.parse_price(F.col("price_original"))
    return flat.select(
        "ingest_order",
        F.trim(F.col("product_id")).alias("product_id"),
        S.normalize_text(F.col("name")).alias("name"),
        F.trim(F.col("url")).alias("url"),
        "category_url",
        S.normalize_category_id(F.col("category_id"), F.col("category_url")).alias(
            "category_id"
        ),
        "category_path",
        price.alias("price"),
        original.alias("original_price"),
        S.recompute_discount(price, original, F.col("discount_percent_raw")).alias(
            "discount_percent"
        ),
        S.parse_sales_count(F.col("sales_count_raw")).alias("sales_count"),
        F.col("rating_avg_raw").try_cast("double").alias("rating_average"),
        F.col("rating_count_raw").try_cast("bigint").alias("review_count"),
        S.clean_seller_name(F.col("seller_name_raw")).alias("seller_name"),
        "seller_id",
        "seller_is_official",
        S.strip_brand_prefix(F.col("brand")).alias("brand"),
        "stock_available",
        "stock_status",
        S.parse_datetime(F.col("crawled_at_raw")).alias("crawled_at"),
    )


def valid_filter(df: DataFrame) -> DataFrame:
    """Validation contract (transformer.py:401-451, data_validator.py)."""
    return df.filter(
        F.col("product_id").rlike(r"^[0-9]+$")
        & (F.col("name") != "")
        & F.col("url").startswith("http")
        & F.col("price").isNotNull()
        & (F.col("price") > 0)
        & (F.col("original_price").isNull() | (F.col("price") <= F.col("original_price")))
        & (
            F.col("rating_average").isNull()
            | ((F.col("rating_average") >= 0) & (F.col("rating_average") <= 5))
        )
    )


def dedup_first_seen(df: DataFrame) -> DataFrame:
    """D2 — first-seen-wins by product_id (transformer.py:126-155)."""
    w = W.partitionBy("product_id").orderBy(F.col("ingest_order").asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def transform_products(raw: DataFrame) -> DataFrame:
    """Full transform stage: flatten → normalize → validate → dedup."""
    return dedup_first_seen(valid_filter(normalize_products(flatten_raw_products(raw))))


# --------------------------------------------------------------------------
# DQ scoring (P11-P13, reference data_validator.py:89-226)

_CRITICAL = ["product_id", "name", "url", "price"]
_IMPORTANT = ["seller_name", "brand", "sales_count", "rating_average"]
_OPTIONAL = ["category_path", "stock_status"]


def _present(c: str):
    col = F.col(c)
    if c == "category_path":
        return F.when(col.isNotNull() & (F.size(col) > 0), 1.0).otherwise(0.0)
    if c in ("name", "url"):
        return F.when(col.isNotNull() & (col != ""), 1.0).otherwise(0.0)
    return F.when(col.isNotNull(), 1.0).otherwise(0.0)


def with_quality_score(df: DataFrame) -> DataFrame:
    """P11-P13 — weighted completeness score + accept/retry/skip action.

    Weights (data_validator.py:89-123): critical 0.5 (score = 0 if ANY
    critical field missing), important 0.35, optional 0.15 — each class
    contributes weight × fraction-present. Action cascade
    (data_validator.py:126-183): missing critical → skip;
    score ≥ 0.7 → accept; else retry. Label (data_validator.py:211-217):
    complete / partial / incomplete.
    """
    crit_frac = sum(_present(c) for c in _CRITICAL) / F.lit(float(len(_CRITICAL)))
    imp_frac = sum(_present(c) for c in _IMPORTANT) / F.lit(float(len(_IMPORTANT)))
    opt_frac = sum(_present(c) for c in _OPTIONAL) / F.lit(float(len(_OPTIONAL)))
    all_critical = crit_frac == 1.0
    score = F.when(
        all_critical,
        F.round(F.lit(0.5) + F.lit(0.35) * imp_frac + F.lit(0.15) * opt_frac, 4),
    ).otherwise(F.lit(0.0))
    df = df.withColumn("quality_score", score)
    action = (
        F.when(~all_critical, "skip")
        .when(F.col("quality_score") >= 0.7, "accept")
        .otherwise("retry")
    )
    label = (
        F.when(~all_critical, "incomplete")
        .when(imp_frac == 1.0, "complete")
        .otherwise("partial")
    )
    missing = F.array_compact(
        F.array(
            *[
                F.when(_present(c) == 0.0, F.lit(c))
                for c in _CRITICAL + _IMPORTANT + _OPTIONAL
            ]
        )
    )
    return (
        df.withColumn("action", action)
        .withColumn("data_quality", label)
        .withColumn("missing_fields", missing)
    )
