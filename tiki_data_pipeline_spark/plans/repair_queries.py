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


# S4 — regex extraction of simple fields from raw HTML snippets
# (reference crawl_products_detail.py:864-1106 falls back to CSS
# selectors; the engine's batch path extracts the regular fields with
# regexp_extract, keeping the scan JVM-side).

_HTML_ROWS = [
    (1, '<div class="product"><h1 class="title">Tai nghe ABC</h1>'
        '<span class="price" data-price="389000">389.000₫</span>'
        '<a class="seller" href="/seller/s1">Shop Chính Hãng</a></div>'),
    (2, '<div class="product"><h1 class="title">Áo thun</h1>'
        '<span class="price" data-price="150000">150.000₫</span></div>'),
    (3, '<div class="empty">no product here</div>'),
]


@query(
    "html_field_extraction",
    oracle=f"""
    WITH {FX.values_cte('pages', [('page_id', 'INTEGER'), ('html', 'VARCHAR')], _HTML_ROWS)}
    SELECT page_id,
           NULLIF(REGEXP_EXTRACT(html, '<h1 class="title">([^<]+)</h1>', 1), '') AS title,
           TRY_CAST(NULLIF(REGEXP_EXTRACT(html, 'data-price="([0-9]+)"', 1), '')
                    AS BIGINT) AS price,
           NULLIF(REGEXP_EXTRACT(html, 'class="seller"[^>]*>([^<]+)</a>', 1), '') AS seller
    FROM pages
    """,
)
def html_field_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — simple-field extraction from raw HTML via regexp_extract
    (the declarative slice of the reference's selector chains)."""
    pages = spark.createDataFrame(_HTML_ROWS, "page_id int, html string")
    return pages.select(
        "page_id",
        F.nullif(
            F.regexp_extract("html", r'<h1 class="title">([^<]+)</h1>', 1), F.lit("")
        ).alias("title"),
        F.nullif(F.regexp_extract("html", r'data-price="([0-9]+)"', 1), F.lit(""))
        .try_cast("bigint")
        .alias("price"),
        F.nullif(
            F.regexp_extract("html", r'class="seller"[^>]*>([^<]+)</a>', 1), F.lit("")
        ).alias("seller"),
    )
