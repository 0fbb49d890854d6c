"""Reconciliation / repair / extraction queries closing the last
SURVEY.md §2 gaps: M9+J10 conditional name repair, P7 has-image
filter, S4 regex field extraction from raw HTML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.plans.registry import query

# Hierarchy-map fixture for the reconciliation join (reference
# category_hierarchy_map.json: url → proper name).
_NAME_MAP = [
    ("https://tiki.vn/quan-nam/c2200", "Quần Nam"),
    ("https://tiki.vn/ao-nam/c2100", "Áo Nam (đã có)"),
]


@query(
    "category_name_reconciliation",
    oracle=f"""
    WITH {FX.categories_cte()},
    name_map AS (
      SELECT * FROM (VALUES ('https://tiki.vn/quan-nam/c2200', 'Quần Nam'),
                            ('https://tiki.vn/ao-nam/c2100', 'Áo Nam (đã có)'))
        AS t(url, proper_name)
    )
    SELECT c.url,
           CASE WHEN c.name = c.category_id AND m.proper_name IS NOT NULL
                THEN m.proper_name ELSE c.name END AS name,
           (c.name = c.category_id AND m.proper_name IS NOT NULL) AS repaired
    FROM categories c LEFT JOIN name_map m ON c.url = m.url
    """,
)
def category_name_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/J10 — repair placeholder names (name == category_id) from a
    broadcast hierarchy map; non-placeholder names are preserved
    (reference tasks/maintenance.py:174-190)."""
    cats = FX.categories_df(spark)
    name_map = spark.createDataFrame(_NAME_MAP, "url string, proper_name string")
    placeholder = F.col("name") == F.col("category_id")
    fixable = placeholder & F.col("proper_name").isNotNull()
    return (
        cats.join(F.broadcast(name_map), "url", "left")
        .select(
            "url",
            F.when(fixable, F.col("proper_name")).otherwise(F.col("name")).alias("name"),
            fixable.alias("repaired"),
        )
    )


@query(
    "category_image_filter",
    oracle=f"""
    WITH {FX.categories_cte()}
    SELECT category_id, name, url
    FROM categories
    WHERE image_url IS NOT NULL AND LENGTH(TRIM(image_url)) > 0
      AND level BETWEEN 0 AND 2
    """,
)
def category_image_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 + P4 — has-image filter and level-range filter composed
    (reference crawl_categories_optimized.py:185-188,
    tasks/category.py:62-82)."""
    cats = FX.categories_df(spark)
    return cats.filter(
        F.col("image_url").isNotNull()
        & (F.length(F.trim(F.col("image_url"))) > 0)
        & F.col("level").between(0, 2)
    ).select("category_id", "name", "url")


# T5 — dead-letter routing on an inline failures fixture.

_FAILURE_ROWS = [
    (1, "https://tiki.vn/p1", "Read timeout after 30s", 0),
    (2, "https://tiki.vn/p2", "HTTP 404 Not Found", 0),
    (3, "https://tiki.vn/p3", "Connection reset by peer", 2),
    (4, "https://tiki.vn/p4", "Connection refused", 3),
    (5, "https://tiki.vn/p5", "Invalid JSON in __NEXT_DATA__", 1),
    (6, "https://tiki.vn/p6", "HTTP 503 Service Unavailable", 1),
    (7, "https://tiki.vn/p7", "Something completely different", 0),
    (8, "https://tiki.vn/p8", "Something completely different", 1),
    (9, "https://tiki.vn/p9", "Rate limit exceeded (429)", 2),
    (10, "https://tiki.vn/p10", "403 Forbidden", 0),
]

_FAILURE_COLS = [
    ("task_id", "INTEGER"),
    ("url", "VARCHAR"),
    ("error", "VARCHAR"),
    ("retry_count", "INTEGER"),
]


@query(
    "dlq_error_routing",
    oracle=f"""
    WITH {FX.values_cte('failures', _FAILURE_COLS, _FAILURE_ROWS)},
    classified AS (
      SELECT *,
        CASE
          WHEN regexp_matches(error, '(?i)404|not found') THEN 'permanent'
          WHEN regexp_matches(error, '(?i)410|gone') THEN 'permanent'
          WHEN regexp_matches(error, '(?i)parse error|invalid json|malformed') THEN 'permanent'
          WHEN regexp_matches(error, '(?i)403|forbidden') THEN 'permanent'
          WHEN regexp_matches(error, '(?i)timeout') THEN 'retryable'
          WHEN regexp_matches(error, '(?i)connection (reset|refused|aborted)') THEN 'retryable'
          WHEN regexp_matches(error, '(?i)temporarily unavailable') THEN 'retryable'
          WHEN regexp_matches(error, '(?i)rate limit|429') THEN 'retryable'
          WHEN regexp_matches(error, '(?i)50[234]') THEN 'retryable'
          ELSE 'unknown'
        END AS error_class
      FROM failures
    )
    SELECT task_id, url, error, retry_count, error_class,
           CASE WHEN error_class = 'retryable' AND retry_count < 3 THEN 'retry'
                WHEN error_class = 'unknown' AND retry_count < 1 THEN 'retry'
                ELSE 'quarantine' END AS decision
    FROM classified
    """,
)
def dlq_error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — dead-letter classification + retry/quarantine decision
    (reference dead_letter_queue.py / exceptions taxonomy)."""
    from tiki_data_pipeline_spark.operators.quarantine import route_failures

    failures = spark.createDataFrame(
        _FAILURE_ROWS, "task_id int, url string, error string, retry_count int"
    )
    return route_failures(failures)


# S4 — selector-chain extraction from raw HTML snippets (reference
# crawl_products_detail.py:864-1106: per-field ordered CSS-selector
# lists, first hit wins). The batch twin is a per-field COALESCE over
# ordered regexp_extract patterns — same first-match-wins semantics,
# fully JVM-side. Patterns use only RE2-safe syntax so the DuckDB
# oracle runs the identical chain.

# One pattern list per field, mirroring the reference's selector order.
_NAME_CHAIN = [
    '<h1 data-view-id="pdp_product_name"[^>]*>([^<]+)',
    '<h1 class="product-name"[^>]*>([^<]+)',
    "<h1[^>]*>([^<]+)",
]
_PRICE_CHAIN = [
    'data-view-id="pdp_product_price"[^>]*>([0-9.,]+)',
    'class="[^"]*current-price[^"]*"[^>]*>([0-9.,]+)',
    'class="[^"]*price-current[^"]*"[^>]*>([0-9.,]+)',
]
_ORIG_PRICE_CHAIN = [
    'class="[^"]*list-price[^"]*"[^>]*>([0-9.,]+)',
    'class="[^"]*original-price[^"]*"[^>]*>([0-9.,]+)',
    'class="[^"]*price-old[^"]*"[^>]*>([0-9.,]+)',
]
_RATING_CHAIN = [
    'data-view-id="pdp_rating_score"[^>]*>([0-9][0-9., /]*)',
    'class="[^"]*rating[^"]*"[^>]*>([0-9][0-9., /]*)',
]
_SELLER_CHAIN = [
    'data-view-id="pdp_seller_name"[^>]*>([^<]+)',
    'class="[^"]*seller-name[^"]*"[^>]*>([^<]+)',
    'href="/seller/[^"]*"[^>]*>([^<]+)',
]

_HTML_ROWS = [
    # every primary selector hits; official seller
    (1, '<h1 data-view-id="pdp_product_name">Tai nghe ABC</h1>'
        '<div data-view-id="pdp_product_price">389.000₫</div>'
        '<div class="product-price__list-price">500.000₫</div>'
        '<div data-view-id="pdp_rating_score">4.8 / 5</div>'
        '<a data-view-id="pdp_seller_name">Tiki Trading</a>'),
    # primaries all miss; 2nd-choice selectors hit
    (2, '<h1 class="product-name">Áo thun</h1>'
        '<span class="current-price">150.000₫</span>'
        '<span class="price-old">200.000₫</span>'
        '<span class="rating-summary">4.2</span>'
        '<a href="/seller/s9">Shop Chính Hãng</a>'),
    # only the last-resort selectors hit; no seller at all
    (3, '<h1>Sách X</h1><span class="price-current">95.000₫</span>'),
    # no product markup → all NULL
    (4, '<div class="empty">no product here</div>'),
]


def _sql_chain(patterns: list[str], digits: bool = False) -> str:
    parts = ", ".join(
        f"NULLIF(TRIM(REGEXP_EXTRACT(html, '{p}', 1)), '')" for p in patterns
    )
    chain = f"COALESCE({parts})"
    if digits:
        return f"TRY_CAST(NULLIF(REGEXP_REPLACE({chain}, '[^0-9]', '', 'g'), '') AS BIGINT)"
    return chain


def _spark_chain(patterns: list[str], digits: bool = False):
    chain = F.coalesce(
        *[
            F.nullif(F.trim(F.regexp_extract("html", p, 1)), F.lit(""))
            for p in patterns
        ]
    )
    if digits:
        return F.nullif(
            F.regexp_replace(chain, "[^0-9]", ""), F.lit("")
        ).try_cast("bigint")
    return chain


@query(
    "html_field_extraction",
    oracle=f"""
    WITH {FX.values_cte('pages', [('page_id', 'INTEGER'), ('html', 'VARCHAR')], _HTML_ROWS)},
    fields AS (
      SELECT page_id,
             {_sql_chain(_NAME_CHAIN)} AS title,
             {_sql_chain(_PRICE_CHAIN, digits=True)} AS price,
             {_sql_chain(_ORIG_PRICE_CHAIN, digits=True)} AS original_price,
             TRY_CAST(REGEXP_EXTRACT({_sql_chain(_RATING_CHAIN)},
                      '([0-9]+[.]?[0-9]*)', 1) AS DOUBLE) AS rating,
             {_sql_chain(_SELLER_CHAIN)} AS seller
      FROM pages
    )
    SELECT page_id, title, price, original_price,
           CASE WHEN price IS NOT NULL AND original_price IS NOT NULL
                     AND original_price > 0
                THEN ROUND((original_price - price) * 1000 / original_price / 10.0, 1)
           END AS discount_percent,
           rating, seller,
           COALESCE(lower(seller) LIKE '%official%'
                    OR lower(seller) LIKE '%chính hãng%'
                    OR lower(seller) LIKE '%tiki%', FALSE) AS is_official
    FROM fields
    """,
)
def html_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — selector-chain field extraction: per-field ordered
    fallback chains with first-match-wins semantics (reference
    crawl_products_detail.py:864-1106), plus the derived
    discount_percent and is_official columns the reference computes
    from the extracted fields."""
    pages = spark.createDataFrame(_HTML_ROWS, "page_id int, html string")
    price = _spark_chain(_PRICE_CHAIN, digits=True)
    orig = _spark_chain(_ORIG_PRICE_CHAIN, digits=True)
    seller = _spark_chain(_SELLER_CHAIN)
    # exact integer tenths: (orig-price)*1000/orig is integer division-
    # free in double only at the final /10, matching the oracle
    discount = F.when(
        price.isNotNull() & orig.isNotNull() & (orig > 0),
        F.round((orig - price) * 1000 / orig / 10.0, 1),
    )
    return pages.select(
        "page_id",
        _spark_chain(_NAME_CHAIN).alias("title"),
        price.alias("price"),
        orig.alias("original_price"),
        discount.alias("discount_percent"),
        F.regexp_extract(_spark_chain(_RATING_CHAIN), r"([0-9]+[.]?[0-9]*)", 1)
        .try_cast("double")
        .alias("rating"),
        seller.alias("seller"),
        F.coalesce(
            F.lower(seller).contains("official")
            | F.lower(seller).contains("chính hãng")
            | F.lower(seller).contains("tiki"),
            F.lit(False),
        ).alias("is_official"),
    )


_SALES_PARSE_SQL = """
    TRY_CAST(ROUND(
      TRY_CAST(NULLIF(REPLACE(REGEXP_EXTRACT(LOWER(TRIM(sales_count_raw)),
          '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 1), ',', '.'), '') AS DOUBLE)
      * (CASE REGEXP_EXTRACT(LOWER(TRIM(sales_count_raw)),
              '([0-9]+(?:[.,][0-9]+)?)\\s*([km]?)', 2)
         WHEN 'k' THEN 1000.0 WHEN 'm' THEN 1000000.0 ELSE 1.0 END)
    ) AS BIGINT)
"""


@query(
    "json_recursive_product_search",
    oracle=f"""
    WITH {{nextdata_cte}},
    -- The winning list per envelope is hand-resolved from the
    -- reference's traversal priority (crawl_products.py:445-521):
    -- E1 top-level products; E2 props→pageProps→data descent; E3 the
    -- items[0] heuristic under data; E4 items fails the heuristic so
    -- initialState wins; E5 props is descended BEFORE initialState;
    -- E6 list-in-list traversal; E7 nothing. The per-item field
    -- extraction below is computed independently in SQL.
    found AS (
      SELECT envelope_id,
        CASE envelope_id
          WHEN 1 THEN next_data->'$.products'
          WHEN 2 THEN next_data->'$.props.pageProps.data.products'
          WHEN 3 THEN next_data->'$.data.items'
          WHEN 4 THEN next_data->'$.initialState.products'
          WHEN 5 THEN next_data->'$.props.products'
          WHEN 6 THEN next_data->'$.foo.bar[0]'
        END AS plist
      FROM envelopes
    ),
    items AS (
      SELECT envelope_id, UNNEST(CAST(plist AS JSON[])) AS item
      FROM found WHERE plist IS NOT NULL
    ),
    ext AS (
      SELECT envelope_id,
        COALESCE(NULLIF(json_extract_string(item, '$.id'), ''),
                 NULLIF(json_extract_string(item, '$.product_id'), ''),
                 NULLIF(json_extract_string(item, '$.sku'), '')) AS product_id,
        COALESCE(NULLIF(json_extract_string(item, '$.name'), ''),
                 NULLIF(json_extract_string(item, '$.title'), '')) AS name,
        COALESCE(NULLIF(json_extract_string(item, '$.url'), ''),
                 NULLIF(json_extract_string(item, '$.link'), '')) AS url0,
        CASE WHEN json_type(item, '$.images') = 'ARRAY'
             THEN COALESCE(NULLIF(json_extract_string(item, '$.image_url'), ''),
                           NULLIF(json_extract_string(item, '$.thumbnail_url'), ''),
                           json_extract_string(item, '$.images[0].url'), '')
             ELSE '' END AS image_url,
        COALESCE(NULLIF(json_extract_string(item, '$.sales_count'), ''),
                 NULLIF(json_extract_string(item, '$.quantity_sold'), ''),
                 NULLIF(json_extract_string(item, '$.sold_count'), ''),
                 NULLIF(json_extract_string(item, '$.total_sold'), ''),
                 NULLIF(json_extract_string(item, '$.order_count'), ''),
                 NULLIF(json_extract_string(item, '$.sales_quantity'), ''),
                 NULLIF(json_extract_string(item, '$.quantity'), ''),
                 NULLIF(json_extract_string(item, '$.sold'), ''),
                 NULLIF(json_extract_string(item, '$.total_quantity_sold'), ''))
          AS sales_count_raw
      FROM items
    )
    SELECT envelope_id, product_id, name,
      CASE WHEN url0 IS NULL OR NOT starts_with(url0, 'http')
           THEN 'https://tiki.vn/p/' || product_id ELSE url0 END AS url,
      image_url,
      {{sales_parse}} AS sales_count
    FROM ext
    WHERE product_id IS NOT NULL AND name IS NOT NULL
    """.format(nextdata_cte=FX.nextdata_cte(), sales_parse=_SALES_PARSE_SQL),
)
def json_recursive_product_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — recursive __NEXT_DATA__ product-list search (reference
    crawl_products.py:424-560): key-priority descent to the first
    product-like list, then per-item field normalization; sales counts
    parsed by the shared F2 scalar."""
    from tiki_data_pipeline_spark.functions.scalars import parse_sales_count
    from tiki_data_pipeline_spark.operators import json_search as JS

    env = FX.nextdata_df(spark)
    found = JS.search_products(env)
    return found.select(
        "envelope_id",
        "product_id",
        "name",
        "url",
        "image_url",
        parse_sales_count(F.col("sales_count_raw")).alias("sales_count"),
    )
