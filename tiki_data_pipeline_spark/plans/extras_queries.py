"""Remaining operator coverage (SURVEY.md §2): JSON extraction (S3/
F18), pandas-UDF text functions with golden oracles (F9/F14/F15),
M1/M3 upsert modes, M6 orphan cleanup, A10/A11 report queries, and
approximate aggregates (scale-path variants of A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark import transform as TR
from tiki_data_pipeline_spark.functions.text import clean_name, clean_name_udf, short_name, short_name_udf
from tiki_data_pipeline_spark.functions.urls import canonicalize_url, canonicalize_url_udf
from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators import hierarchy as H
from tiki_data_pipeline_spark.operators import merge as ME
from tiki_data_pipeline_spark.plans import exactmath as X
from tiki_data_pipeline_spark.plans.registry import query
from tiki_data_pipeline_spark.plans.transform_queries import PRODUCTS_CTE


# ---------------------------------------------------------------- S3/F18 JSON

@query(
    "events_props_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS total_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F18 — JSON field extraction from the props string column,
    aggregated per event type (get_json_object stays JVM-side)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("total_k"),
        F.max(k).alias("max_k"),
    )


# ------------------------------------------- F9/F14/F15 golden-value oracles
# The pandas-UDF functions have pure-Python cores; their oracles are
# golden VALUES computed from those cores at import time — the oracle
# checks that the DISTRIBUTED execution reproduces the reference core.

_URL_CASES = [
    "http://TIKI.VN/dien-tu/c1000?utm_source=x&b=2&a=1&ref=y",
    "https://tiki.vn/path/",
    "//tiki.vn/x?spm=z",
    "https://tiki.vn/x?empty=&keep=1",
    "https://Tiki.vn/tai-nghe-p100001?src=search&page=2",
    "https://tiki.vn/a?b=2&a=1",
]

_NAME_CASES = [
    "#hot Tai nghe Bluetooth ABC-1234 Chính Hãng 2024",
    "Nồi chiên không dầu 20x30cm sale",
    "Tai nghe Bluetooth XYZ - Hàng chất lượng dành cho game thủ",
    "Áo thun nam cotton thoáng mát freeship",
    "Bộ nồi inox cao cấp ba đáy dùng cho mọi loại bếp từ bếp ga bếp hồng ngoại siêu bền",
]


def _golden_cte() -> str:
    rows = []
    for i, u in enumerate(_URL_CASES):
        rows.append((i, "url", u, canonicalize_url(u), None))
    for i, n in enumerate(_NAME_CASES):
        rows.append((100 + i, "name", n, clean_name(n), short_name(n)))
    return FX.values_cte(
        "golden",
        [
            ("case_id", "INTEGER"),
            ("kind", "VARCHAR"),
            ("raw", "VARCHAR"),
            ("expected_primary", "VARCHAR"),
            ("expected_short", "VARCHAR"),
        ],
        rows,
    )


@query(
    "text_udf_functions",
    oracle=f"""
    WITH {_golden_cte()}
    SELECT case_id, kind, expected_primary AS primary_out, expected_short AS short_out
    FROM golden
    """,
)
def text_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F14/F15 — pandas-UDF functions over a case table; the
    oracle carries golden values from the pure-Python cores, so this
    checks the Arrow/UDF distribution path end-to-end."""
    url_df = spark.createDataFrame(
        [(i, "url", u) for i, u in enumerate(_URL_CASES)],
        schema="case_id int, kind string, raw string",
    ).select(
        "case_id",
        "kind",
        canonicalize_url_udf(F.col("raw")).alias("primary_out"),
        F.lit(None).cast("string").alias("short_out"),
    )
    name_df = spark.createDataFrame(
        [(100 + i, "name", n) for i, n in enumerate(_NAME_CASES)],
        schema="case_id int, kind string, raw string",
    ).select(
        "case_id",
        "kind",
        clean_name_udf(F.col("raw")).alias("primary_out"),
        short_name_udf(F.col("raw")).alias("short_out"),
    )
    return url_df.unionByName(name_df)


# ---------------------------------------------------------------- M1/M3

_M1_INCOMING = [
    ("100001", "Tên Mới Hoàn Toàn", 111000),
    ("200002", "Hàng Mới", 222000),
]


@query(
    "upsert_overwrite",
    oracle=f"""
    WITH {PRODUCTS_CTE},
    incoming AS (
      SELECT * FROM (VALUES ('100001', 'Tên Mới Hoàn Toàn', 111000),
                            ('200002', 'Hàng Mới', 222000))
        AS t(product_id, name, price)
    ),
    cur AS (SELECT product_id, name, CAST(price AS BIGINT) AS price FROM products)
    SELECT COALESCE(c.product_id, i.product_id) AS product_id,
           CASE WHEN i.product_id IS NOT NULL THEN i.name ELSE c.name END AS name,
           CAST(CASE WHEN i.product_id IS NOT NULL THEN i.price ELSE c.price END
                AS BIGINT) AS price
    FROM cur c FULL OUTER JOIN incoming i ON c.product_id = i.product_id
    """,
)
def upsert_overwrite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — ON CONFLICT DO UPDATE: incoming row wins wholesale."""
    current = TR.transform_products(FX.raw_products_df(spark)).select(
        "product_id", "name", "price"
    )
    incoming = spark.createDataFrame(
        _M1_INCOMING, schema="product_id string, name string, price bigint"
    )
    return ME.upsert_overwrite(current, incoming, "product_id")


@query(
    "insert_if_absent",
    oracle=f"""
    WITH {PRODUCTS_CTE},
    incoming AS (
      SELECT * FROM (VALUES ('100001', 'Bị Bỏ Qua', 1),
                            ('300003', 'Chỉ Chèn', 333000))
        AS t(product_id, name, price)
    ),
    cur AS (SELECT product_id, name, CAST(price AS BIGINT) AS price FROM products)
    SELECT product_id, name, price FROM cur
    UNION ALL
    SELECT i.product_id, i.name, CAST(i.price AS BIGINT)
    FROM incoming i WHERE i.product_id NOT IN (SELECT product_id FROM cur)
    """,
)
def insert_if_absent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — ON CONFLICT DO NOTHING: append unseen keys only."""
    current = TR.transform_products(FX.raw_products_df(spark)).select(
        "product_id", "name", "price"
    )
    incoming = spark.createDataFrame(
        [("100001", "Bị Bỏ Qua", 1), ("300003", "Chỉ Chèn", 333000)],
        schema="product_id string, name string, price bigint",
    )
    return ME.insert_if_absent(current, incoming, "product_id")


# ---------------------------------------------------------------- M6 orphans

@query(
    "category_orphan_cleanup",
    oracle=f"""
    WITH {FX.categories_cte()},
    {FX.raw_products_cte()},
    leaves AS (
      SELECT url, name FROM categories
      WHERE url NOT IN (SELECT DISTINCT parent_url FROM categories
                        WHERE parent_url IS NOT NULL)
    )
    SELECT l.url, l.name,
           l.url NOT IN (SELECT DISTINCT category_url FROM raw_products
                         WHERE category_url IS NOT NULL) AS delete_flag
    FROM leaves l
    """,
)
def category_orphan_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — leaf categories with no products get flagged for deletion
    (flag, not silent drop — quarantine philosophy)."""
    cats = FX.categories_df(spark)
    leaves = H.with_leaf_flag(cats).filter(F.col("is_leaf")).select("url", "name")
    used = (
        FX.raw_products_df(spark)
        .filter(F.col("category_url").isNotNull())
        .select(F.col("category_url").alias("_cu"))
        .distinct()
    )
    return (
        leaves.join(F.broadcast(used), F.col("url") == F.col("_cu"), "left")
        .withColumn("delete_flag", F.col("_cu").isNull())
        .drop("_cu")
    )


# ---------------------------------------------------------------- A10/A11

@query(
    "status_counts",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — success/failed-style status counters as a groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "deep_discount_report",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_discount * 100, 2) AS discount_pct,
           {X.o_div_round(f"{X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')})", "100", 100)} AS net_price
    FROM lineitem
    WHERE l_discount > 0.08
    ORDER BY l_discount DESC, l_orderkey, l_linenumber
    LIMIT 5
    """,
)
def deep_discount_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/W6 — top-5 deepest discounts (the AI-report stat block's
    deep-discount list, reference summarizer.py:435-450)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_discount") > 0.08)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_discount") * 100, 2).alias("discount_pct"),
            X.cents(F.col("l_extendedprice")).alias("_ec"),
            X.hundredths(F.col("l_discount")).alias("_dh"),
        )
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "discount_pct",
            X.div_round_expr("_ec * (100 - _dh)", "100", 100) + " AS net_price",
        )
        .orderBy(F.col("discount_pct").desc(), "l_orderkey", "l_linenumber")
        .limit(5)
    )


# ------------------------------------------------ data layout (Z-order scan)

def _zorder_lineitem_cached(spark: SparkSession, sf_dir: str) -> str:
    """lineitem rewritten Z-ordered on (l_extendedprice, l_quantity),
    built once per (session, sf_dir) like every persisted-store
    fixture (llm_queries._session_index)."""
    from tiki_data_pipeline_spark.operators import layout as L
    from tiki_data_pipeline_spark.plans.llm_queries import _session_index

    return _session_index(
        spark,
        sf_dir,
        "zorder_li",
        lambda p: L.write_zordered(
            load_table(spark, sf_dir, "lineitem"),
            p,
            ["l_extendedprice", "l_quantity"],
            target_files=16,
        ),
    )


@query(
    "lineitem_zorder_box_scan",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM({X.o_ints('l_quantity')}) AS DOUBLE) AS sum_qty,
           {X.o_div_round(
               f"SUM({X.o_cents('l_extendedprice')}"
               f" * (100 - {X.o_hundredths('l_discount')}))",
               "100", 100)} AS revenue
    FROM lineitem
    WHERE l_extendedprice BETWEEN 10000 AND 30000
      AND l_quantity BETWEEN 10 AND 20
    GROUP BY l_returnflag
    """,
)
def lineitem_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D box scan over the Z-ordered lineitem copy: the layout
    round-trip must be value-exact under a selective predicate on
    BOTH clustering dimensions. The 100 TB point of the layout is in
    the footers, not the answer: every row group of the Z-ordered
    copy covers a small (price × quantity) rectangle, so this box
    skips most of the table on min/max statistics alone
    (tests/test_layout.py pins the pruning fraction; this query pins
    value fidelity against the UN-clustered oracle table)."""
    li = spark.read.parquet(_zorder_lineitem_cached(spark, sf_dir))
    ext_c = X.cents(F.col("l_extendedprice"))
    d_h = X.hundredths(F.col("l_discount"))
    return (
        li.filter(
            F.col("l_extendedprice").between(10000, 30000)
            & F.col("l_quantity").between(10, 20)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(X.ints(F.col("l_quantity"))).alias("_sq"),
            F.sum(ext_c * (100 - d_h)).alias("_rev"),
        )
        .selectExpr(
            "l_returnflag",
            "n_rows",
            "CAST(_sq AS DOUBLE) AS sum_qty",
            X.div_round_expr("_rev", "100", 100) + " AS revenue",
        )
    )


# ------------------------------------------------------- approx (scale path)

@query("approx_distinct_stats")
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 scale path — approx_count_distinct (HLL) + approx quantiles.

    No oracle: sketch outputs are implementation-specific; accuracy
    bounds are asserted in tests/test_operators.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99]).alias(
            "price_quantiles"
        ),
    ).select(
        "approx_parts",
        "approx_suppliers",
        # projected to a scalar so row canonicalizers can hash it
        F.concat_ws(
            ",", F.transform("price_quantiles", lambda x: x.cast("string"))
        ).alias("price_quantiles"),
    )
