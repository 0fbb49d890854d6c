"""Reference-shaped inline fixtures (FIXTURES.md §1-3).

The driver's DuckDB oracle only pre-registers the ten driver tables,
so reference-shaped operators (transform, hierarchy, CDC, upsert)
are oracle-checked by inlining the SAME fixture rows on both sides:

- Spark gets ``createDataFrame(rows, schema)``;
- the oracle SQL gets a generated ``WITH <name> AS (SELECT ... FROM
  (VALUES ...))`` CTE built from the same Python constants.

Fixture content mirrors the reference's own test fixtures
(reference tests/test_transform_load.py:29-137 archetypes: valid
nested, valid flat, missing id/name/url, non-digit id, negative
price, current>original, rating>5, junk seller names, duplicate ids)
and the category integrity rules (reference tests/verify.py:87-274:
roots, orphans, a 2-node cycle, placeholder names, duplicate
category_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------
# SQL literal / CTE generation


def sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(sql_literal(x) for x in v) + "]"
    return "'" + str(v).replace("'", "''") + "'"


def jvm_values_df(
    spark: "SparkSession", columns: list[tuple[str, str]], rows: list[tuple]
) -> "DataFrame":
    """Build a fixture DataFrame as a JVM-side VALUES relation.

    ``createDataFrame(local_rows)`` parallelizes into
    defaultParallelism pickled Python partitions; every job that scans
    the fixture (each broadcast hop of an iterative join, every
    action) then pays Python-worker deserialization — seconds of
    overhead for rows that are pure literals. A ``spark.sql`` VALUES
    relation is one local JVM relation: no Python tasks, constant-
    folded by Catalyst. ``columns`` is [(name, SPARK type)].
    """
    def lit(v) -> str:
        if isinstance(v, (list, tuple)):  # Spark array literal syntax
            return "array(" + ", ".join(lit(x) for x in v) + ")"
        if isinstance(v, str):
            # Spark SQL string literals process backslash ESCAPES
            # (unlike DuckDB's SQL-standard literals) — escape them,
            # or '\n' in fixture data silently becomes a newline
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return sql_literal(v)

    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in columns)
    names = ", ".join(c for c, _ in columns)
    vals = ",\n".join("(" + ", ".join(lit(v) for v in row) + ")" for row in rows)
    return spark.sql(f"SELECT {casts} FROM (VALUES {vals}) AS _t({names})")


def values_cte(name: str, columns: list[tuple[str, str]], rows: list[tuple]) -> str:
    """Build ``name AS (SELECT CAST(..) ... FROM (VALUES ...))`` SQL.

    ``columns`` is [(col_name, duckdb_type)]; explicit CASTs pin the
    inferred types so all-NULL or mixed-width columns stay stable.
    """
    col_names = [c for c, _ in columns]
    casts = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in columns)
    vals = ",\n    ".join(
        "(" + ", ".join(sql_literal(v) for v in row) + ")" for row in rows
    )
    return (
        f"{name} AS (\n  SELECT {casts}\n  FROM (VALUES\n    {vals}\n  )"
        f" AS _t({', '.join(col_names)})\n)"
    )


# --------------------------------------------------------------------------
# raw_products — dirty, pre-transform (flattened columns; the Spark
# side rebuilds the reference's nested shape from the same rows).

RAW_PRODUCT_COLUMNS: list[tuple[str, str]] = [
    ("ingest_order", "INTEGER"),
    ("product_id", "VARCHAR"),
    ("name", "VARCHAR"),
    ("url", "VARCHAR"),
    ("category_url", "VARCHAR"),
    ("category_id", "VARCHAR"),
    ("category_path", "VARCHAR[]"),
    ("sales_count_raw", "VARCHAR"),
    ("price_current", "VARCHAR"),
    ("price_original", "VARCHAR"),
    ("discount_percent", "DOUBLE"),
    ("rating_avg", "VARCHAR"),
    ("rating_count", "VARCHAR"),
    ("seller_name", "VARCHAR"),
    ("seller_id", "VARCHAR"),
    ("seller_official", "BOOLEAN"),
    ("brand", "VARCHAR"),
    ("stock_available", "BOOLEAN"),
    ("stock_status", "VARCHAR"),
    ("crawled_at", "VARCHAR"),
]

RAW_PRODUCT_ROWS: list[tuple] = [
    # 1: valid, nested-dirty: whitespace name, branded prefix, ₫ price, "2k" sales
    (1, "100001", " Tai nghe   Bluetooth XYZ ", "https://tiki.vn/tai-nghe-p100001",
     "https://tiki.vn/dien-tu/c1000", "c1000", ["Điện Tử", "Tai nghe"],
     "2k", "389.000₫", "500.000₫", None, "4.5", "120",
     "Shop Chính Hãng", "S1", True, "Thương hiệu: Sony", True, "in_stock",
     "2025-01-15 14:00:00"),
    # 2: valid, flat-typed
    (2, "100002", "Áo thun nam", "https://tiki.vn/ao-thun-p100002",
     "https://tiki.vn/thoi-trang/c2000", "2000", ["Thời Trang"],
     "500", "150000", "150000", 0.0, "3.8", "45",
     "ABC Store", "S2", False, "Samsung", True, "in_stock",
     "2025-01-15T14:30:00"),
    # 3: "đã bán 1.2k" sales, dotted price
    (3, "100003", "Nồi chiên không dầu", "https://tiki.vn/noi-chien-p100003",
     "https://tiki.vn/nha-cua/c3000", "c3000", ["Nhà Cửa", "Bếp"],
     "đã bán 1.2k", "1.250.000₫", "1.500.000₫", None, "4.9", "2000",
     "Kitchen Pro", "S3", True, "Philips", True, "limited",
     "2025-01-16 09:00:00"),
    # 4: "1.5k" sales
    (4, "100004", "Sách lập trình", "https://tiki.vn/sach-p100004",
     "https://tiki.vn/sach/c4000", "c4000", ["Sách"],
     "1.5k", "95000", "120000", None, "4.7", "310",
     "BookStore VN", "S4", False, "NXB Trẻ", True, "in_stock",
     "2025-01-16 10:00:00"),
    # 5: duplicate of 100001, later crawl — dedup drops it (first wins)
    (5, "100001", "Tai nghe Bluetooth XYZ (dup)", "https://tiki.vn/tai-nghe-p100001",
     "https://tiki.vn/dien-tu/c1000", "c1000", ["Điện Tử", "Tai nghe"],
     "2.1k", "379.000₫", "500.000₫", None, "4.5", "125",
     "Shop Chính Hãng", "S1", True, "Sony", True, "in_stock",
     "2025-01-17 14:00:00"),
    # 6: invalid — non-digit product_id
    (6, "invalid", "Sản phẩm lỗi", "https://tiki.vn/p-invalid",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "5000", "5000", 0.0, "4.0", "3",
     "Seller X", "S6", False, "BrandX", True, "in_stock",
     "2025-01-17 15:00:00"),
    # 7: invalid — empty name
    (7, "100007", "   ", "https://tiki.vn/p100007",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "5000", "6000", None, "4.0", "3",
     "Seller Y", "S7", False, "BrandY", True, "in_stock",
     "2025-01-17 16:00:00"),
    # 8: dash-in-price parity quirk: the reference strips ALL
    # non-digits (utils.py [^\d], transformer [^\d.]), so "-5000"
    # parses to 5000 and the row is VALID — negative prices can only
    # arrive as raw numbers, which the string fixtures cannot model
    (8, "100008", "Giá âm", "https://tiki.vn/p100008",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "-5000", "6000", None, "4.0", "3",
     "Seller Z", "S8", False, "BrandZ", True, "in_stock",
     "2025-01-17 17:00:00"),
    # 9: invalid — current > original
    (9, "100009", "Giá ngược", "https://tiki.vn/p100009",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "200000", "100000", None, "4.0", "3",
     "Seller W", "S9", False, "BrandW", True, "in_stock",
     "2025-01-17 18:00:00"),
    # 10: invalid — rating out of [0,5]
    (10, "100010", "Rating lỗi", "https://tiki.vn/p100010",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "50000", "60000", None, "7.5", "3",
     "Seller V", "S10", False, "BrandV", True, "in_stock",
     "2025-01-17 19:00:00"),
    # 11: valid — junk seller (digits-only) nulled, empty brand → null
    (11, "100011", "Bàn phím cơ", "https://tiki.vn/ban-phim-p100011",
     "https://tiki.vn/dien-tu/c1000", "c1000", ["Điện Tử", "Phụ kiện"],
     "85", "990000", "1200000", None, "4.2", "18",
     "123", "S11", False, "", True, "pre_order",
     "2025-01-18 08:00:00"),
    # 12: invalid — bad URL (no scheme)
    (12, "100012", "URL hỏng", "tiki.vn/p100012",
     "https://tiki.vn/dien-tu/c1000", "c1000", [],
     "10", "50000", "60000", None, "4.0", "3",
     "Seller U", "S12", False, "BrandU", True, "in_stock",
     "2025-01-18 09:00:00"),
    # 13: "3m" sales suffix
    (13, "100013", "Hit quốc dân", "https://tiki.vn/hit-p100013",
     "https://tiki.vn/thoi-trang/c2000", "c2000", ["Thời Trang"],
     "3m", "45000", "90000", None, "4.8", "99999",
     "Mega Shop", "S13", True, "Local Brand", True, "in_stock",
     "2025-01-18 10:00:00"),
    # 14: null sales, null original price (discount stays null)
    (14, "100014", "Hàng mới", "https://tiki.vn/moi-p100014",
     "https://tiki.vn/nha-cua/c3000", "c3000", ["Nhà Cửa"],
     None, "75000", None, None, "0", "0",
     "New Seller", "S14", False, "NoName", False, "out_of_stock",
     "2025-01-18 11:00:00"),
]

# Spark-side nested schema mirroring the reference's scraped shape
# (reference crawl_products_detail.py:835-862).
RAW_PRODUCT_NESTED_SCHEMA = (
    "ingest_order int, product_id string, name string, url string,"
    " category_url string, category_id string, category_path array<string>,"
    " sales_count string,"
    " price struct<current_price:string, original_price:string, discount_percent:double>,"
    " rating struct<average:string, total_reviews:string>,"
    " seller struct<name:string, seller_id:string, is_official:boolean>,"
    " brand string,"
    " stock struct<available:boolean, stock_status:string>,"
    " crawled_at string"
)


_RAW_FLAT_SPARK_COLUMNS = [
    ("ingest_order", "INT"),
    ("product_id", "STRING"),
    ("name", "STRING"),
    ("url", "STRING"),
    ("category_url", "STRING"),
    ("category_id", "STRING"),
    ("category_path", "ARRAY<STRING>"),
    ("sales_count_raw", "STRING"),
    ("price_current", "STRING"),
    ("price_original", "STRING"),
    ("discount_percent", "DOUBLE"),
    ("rating_avg", "STRING"),
    ("rating_count", "STRING"),
    ("seller_name", "STRING"),
    ("seller_id", "STRING"),
    ("seller_official", "BOOLEAN"),
    ("brand", "STRING"),
    ("stock_available", "BOOLEAN"),
    ("stock_status", "STRING"),
    ("crawled_at", "STRING"),
]


def raw_products_df(spark: SparkSession) -> DataFrame:
    """Fixture rows in the reference's NESTED shape (pre-flatten),
    built as a JVM VALUES relation + struct() projection (no
    Python-RDD partitions for literal fixture data)."""
    from pyspark.sql import functions as F

    flat = jvm_values_df(spark, _RAW_FLAT_SPARK_COLUMNS, RAW_PRODUCT_ROWS)
    return flat.select(
        "ingest_order",
        "product_id",
        "name",
        "url",
        "category_url",
        "category_id",
        "category_path",
        F.col("sales_count_raw").alias("sales_count"),
        F.struct(
            F.col("price_current").alias("current_price"),
            F.col("price_original").alias("original_price"),
            F.col("discount_percent").alias("discount_percent"),
        ).alias("price"),
        F.struct(
            F.col("rating_avg").alias("average"),
            F.col("rating_count").alias("total_reviews"),
        ).alias("rating"),
        F.struct(
            F.col("seller_name").alias("name"),
            F.col("seller_id").alias("seller_id"),
            F.col("seller_official").alias("is_official"),
        ).alias("seller"),
        "brand",
        F.struct(
            F.col("stock_available").alias("available"),
            F.col("stock_status").alias("stock_status"),
        ).alias("stock"),
        "crawled_at",
    )


def raw_products_cte() -> str:
    return values_cte("raw_products", RAW_PRODUCT_COLUMNS, RAW_PRODUCT_ROWS)


# --------------------------------------------------------------------------
# categories — flat hierarchy with roots/orphans/cycle/placeholder/dups
# (FIXTURES.md §2; reference verify.py:87-274 integrity rules).

CATEGORY_COLUMNS: list[tuple[str, str]] = [
    ("category_id", "VARCHAR"),
    ("name", "VARCHAR"),
    ("url", "VARCHAR"),
    ("image_url", "VARCHAR"),
    ("parent_url", "VARCHAR"),
    ("level", "INTEGER"),
    ("product_count", "INTEGER"),
]

_T = "https://tiki.vn"

CATEGORY_ROWS: list[tuple] = [
    # three roots
    ("c1000", "Điện Tử", f"{_T}/dien-tu/c1000", f"{_T}/img/c1000.png", None, 0, 120),
    ("c2000", "Thời Trang", f"{_T}/thoi-trang/c2000", f"{_T}/img/c2000.png", None, 0, 95),
    ("c3000", "Nhà Cửa", f"{_T}/nha-cua/c3000", "", None, 0, 60),
    # electronics subtree, depth 4
    ("c1100", "Âm Thanh", f"{_T}/am-thanh/c1100", f"{_T}/img/c1100.png",
     f"{_T}/dien-tu/c1000", 1, 45),
    ("c1110", "Tai Nghe", f"{_T}/tai-nghe/c1110", f"{_T}/img/c1110.png",
     f"{_T}/am-thanh/c1100", 2, 30),
    ("c1111", "Tai Nghe Bluetooth", f"{_T}/tai-nghe-bluetooth/c1111", "",
     f"{_T}/tai-nghe/c1110", 3, 18),
    ("c1112", "Tai Nghe Có Dây", f"{_T}/tai-nghe-co-day/c1112", f"{_T}/img/c1112.png",
     f"{_T}/tai-nghe/c1110", 3, 12),
    # fashion subtree
    ("c2100", "Áo Nam", f"{_T}/ao-nam/c2100", f"{_T}/img/c2100.png",
     f"{_T}/thoi-trang/c2000", 1, 40),
    ("c2110", "Áo Thun", f"{_T}/ao-thun/c2110", f"{_T}/img/c2110.png",
     f"{_T}/ao-nam/c2100", 2, 25),
    # placeholder name == category_id (reconciliation target M9)
    ("c2200", "c2200", f"{_T}/quan-nam/c2200", "", f"{_T}/thoi-trang/c2000", 1, 15),
    # home subtree (leaf directly under root)
    ("c3100", "Nhà Bếp", f"{_T}/nha-bep/c3100", f"{_T}/img/c3100.png",
     f"{_T}/nha-cua/c3000", 1, 22),
    # orphan: parent url not present in the table
    ("c9100", "Mồ Côi", f"{_T}/mo-coi/c9100", "", f"{_T}/unknown/c9000", 1, 5),
    # 2-node cycle (guard test)
    ("c8001", "Vòng A", f"{_T}/vong-a/c8001", "", f"{_T}/vong-b/c8002", 1, 1),
    ("c8002", "Vòng B", f"{_T}/vong-b/c8002", "", f"{_T}/vong-a/c8001", 1, 1),
    # duplicate category_id, different urls (dedup-keep-best: shortest url,
    # tie → longest name)
    ("c4000", "Sách", f"{_T}/sach/c4000", f"{_T}/img/c4000.png", None, 0, 33),
    ("c4000", "Sách Tiếng Việt", f"{_T}/sach-tieng-viet/c4000", "", None, 0, 31),
    # null category_id (normalization target: derived from url)
    (None, "Không ID", f"{_T}/khong-id/c5000", "", None, 0, 2),
]

CATEGORY_SPARK_SCHEMA = (
    "category_id string, name string, url string, image_url string,"
    " parent_url string, level int, product_count int"
)


_CATEGORY_SPARK_COLUMNS = [
    ("category_id", "STRING"),
    ("name", "STRING"),
    ("url", "STRING"),
    ("image_url", "STRING"),
    ("parent_url", "STRING"),
    ("level", "INT"),
    ("product_count", "INT"),
]


def categories_df(spark: SparkSession) -> DataFrame:
    return jvm_values_df(spark, _CATEGORY_SPARK_COLUMNS, CATEGORY_ROWS)


def categories_cte() -> str:
    return values_cte("categories", CATEGORY_COLUMNS, CATEGORY_ROWS)


# --------------------------------------------------------------------------
# crawl_history — append-only CDC snapshots (FIXTURES.md §3).
# ≥3 snapshots for some products (hot-product detection), rows 6-12
# months old (archival) and >12 months (deletion) relative to the
# fixed "now" used by retention queries: 2025-01-20 00:00:00.

HISTORY_COLUMNS: list[tuple[str, str]] = [
    ("history_id", "INTEGER"),
    ("product_id", "VARCHAR"),
    ("price", "DOUBLE"),
    ("original_price", "DOUBLE"),
    ("discount_percent", "INTEGER"),
    ("sales_count", "INTEGER"),
    ("crawled_at", "TIMESTAMP"),
]

HISTORY_NOW = "2025-01-20 00:00:00"

HISTORY_ROWS: list[tuple] = [
    # product 100001: 5 price changes in the last 30d → "hot"
    (1, "100001", 500000.0, 500000.0, 0, 100, "2024-12-28 08:00:00"),
    (2, "100001", 450000.0, 500000.0, 10, 150, "2025-01-02 08:00:00"),
    (3, "100001", 430000.0, 500000.0, 14, 180, "2025-01-06 08:00:00"),
    (4, "100001", 410000.0, 500000.0, 18, 240, "2025-01-10 08:00:00"),
    (5, "100001", 389000.0, 500000.0, 22, 320, "2025-01-15 08:00:00"),
    (6, "100001", 399000.0, 500000.0, 20, 380, "2025-01-18 08:00:00"),
    (18, "100001", 395000.0, 500000.0, 21, 400, "2025-01-19 08:00:00"),
    # product 100002: stable price, sales drift
    (7, "100002", 150000.0, 150000.0, 0, 400, "2025-01-05 09:00:00"),
    (8, "100002", 150000.0, 150000.0, 0, 450, "2025-01-12 09:00:00"),
    (9, "100002", 150000.0, 150000.0, 0, 500, "2025-01-19 09:00:00"),
    # product 100003: two snapshots, big flash-sale discount
    (10, "100003", 1500000.0, 1500000.0, 0, 900, "2025-01-10 10:00:00"),
    (11, "100003", 1250000.0, 1500000.0, 17, 1200, "2025-01-16 10:00:00"),
    # product 100004: archival-age rows (6-12 months old) + one recent
    (12, "100004", 120000.0, 120000.0, 0, 200, "2024-05-15 10:00:00"),
    (13, "100004", 110000.0, 120000.0, 8, 260, "2024-07-01 10:00:00"),
    (14, "100004", 95000.0, 120000.0, 21, 310, "2025-01-16 10:00:00"),
    # product 100013: ancient rows (>12 months → retention delete)
    (15, "100013", 90000.0, 90000.0, 0, 10, "2023-06-01 10:00:00"),
    (16, "100013", 80000.0, 90000.0, 11, 2000000, "2023-12-01 10:00:00"),
    # product never seen in products fixture (referential edge)
    (17, "999999", 10000.0, 10000.0, 0, 5, "2025-01-15 11:00:00"),
]

HISTORY_SPARK_SCHEMA = (
    "history_id int, product_id string, price double, original_price double,"
    " discount_percent int, sales_count int, crawled_at string"
)


_HISTORY_SPARK_COLUMNS = [
    ("history_id", "INT"),
    ("product_id", "STRING"),
    ("price", "DOUBLE"),
    ("original_price", "DOUBLE"),
    ("discount_percent", "INT"),
    ("sales_count", "INT"),
    ("crawled_at", "STRING"),
]


def crawl_history_df(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F

    df = jvm_values_df(spark, _HISTORY_SPARK_COLUMNS, HISTORY_ROWS)
    return df.withColumn("crawled_at", F.to_timestamp("crawled_at"))


def crawl_history_cte() -> str:
    return values_cte("crawl_history", HISTORY_COLUMNS, HISTORY_ROWS)


# --------------------------------------------------------------------------
# __NEXT_DATA__ envelopes — S3 recursive product-list search fixtures
# (reference crawl_products.py:424-560). Shapes chosen to exercise every
# branch of the traversal: top-level products, 3-deep descent, the
# items[0]-heuristic, a failing-heuristic decoy, the props-before-
# initialState priority, list-in-list traversal, and a no-product payload.

import json as _json

NEXTDATA_PAYLOADS: list[tuple[int, dict]] = [
    # E1: products at the top level; field fallbacks per item
    (1, {"products": [
        {"id": 1, "name": "Áo thun nam", "url": "https://tiki.vn/p/1",
         "sales_count": "1.2k", "images": [{"url": "http://img.tiki.vn/1.jpg"}]},
        {"id": 2, "name": "Quần jean", "price": 99000},
        {"id": 3, "price": 5},            # no name → skipped
        {"name": "NoId", "price": 1},      # no id → skipped
    ]}),
    # E2: 3-deep descent props → pageProps → data
    (2, {"props": {"pageProps": {"data": {"products": [
        {"product_id": "P3", "title": "Nồi cơm điện", "quantity_sold": 350},
    ]}}}}),
    # E3: items under data, heuristic satisfied by "name"
    (3, {"data": {"items": [
        {"sku": "SKU9", "name": "Bàn phím cơ", "sold": 77,
         "link": "https://tiki.vn/p/sku9"},
    ]}}),
    # E4: top-level items FAILS the heuristic (no product-like key in
    # items[0]); initialState descent finds the real list
    (4, {"items": [{"foo": 1}], "initialState": {"products": [
        {"id": 7, "name": "Tủ lạnh", "total_sold": "2,5k"},
    ]}}),
    # E5: priority — props is descended before initialState
    (5, {"props": {"products": [{"id": 10, "name": "Ghế xoay"}]},
         "initialState": {"products": [{"id": 11, "name": "decoy"}]}}),
    # E6: product list nested inside a list inside an arbitrary key;
    # images is NOT a list → image_url '' despite the image_url key
    # (reference precedence quirk, crawl_products.py:520-526)
    (6, {"foo": {"bar": [[
        {"id": 20, "name": "Đèn bàn", "order_count": 5,
         "images": "not-a-list", "image_url": "http://img.tiki.vn/x.jpg"},
    ]]}}),
    # E7: nothing product-like anywhere
    (7, {"meta": {"count": 3}, "items": "not-a-list"}),
]

NEXTDATA_COLUMNS = [("envelope_id", "INTEGER"), ("next_data", "VARCHAR")]

NEXTDATA_ROWS: list[tuple] = [
    (i, _json.dumps(payload, ensure_ascii=False)) for i, payload in NEXTDATA_PAYLOADS
]


def nextdata_df(spark: SparkSession) -> DataFrame:
    return jvm_values_df(
        spark, [("envelope_id", "INT"), ("next_data", "STRING")], NEXTDATA_ROWS
    )


def nextdata_cte() -> str:
    return values_cte("envelopes", NEXTDATA_COLUMNS, NEXTDATA_ROWS)


# --------------------------------------------------------------------------
# PII documents — redaction fixtures (synthetic documents carry no PII,
# so the pii query unions these rows in; same VALUES on both sides).

PII_DOC_COLUMNS = [("doc_id", "BIGINT"), ("text", "VARCHAR")]

PII_DOC_ROWS: list[tuple] = [
    (9001, "Liên hệ nguyen.van@example.com hoặc gọi 0912 345 678 nhé"),
    (9002, "Xem https://shop.example.vn/p/100?ref=abc và email ho-tro@tiki.vn"),
    (9003, "Số điện thoại +84 28 3812 3456, fax 028.3812.3456"),
    (9004, "không có thông tin cá nhân nào ở đây"),
]


def pii_docs_df(spark: SparkSession) -> DataFrame:
    return jvm_values_df(
        spark, [("doc_id", "BIGINT"), ("text", "STRING")], PII_DOC_ROWS
    )


def pii_docs_cte() -> str:
    return values_cte("pii_docs", PII_DOC_COLUMNS, PII_DOC_ROWS)


# --------------------------------------------------------------------------
# Multi-line documents — line-dedup fixtures (synthetic documents are
# single-line, so the line-removal query unions these in; boilerplate
# lines repeat across docs, one has a trim-variant spelling, one doc
# is pure boilerplate, one keeps a blank line).

LINE_DOC_COLUMNS = [("doc_id", "BIGINT"), ("text", "VARCHAR")]

LINE_DOC_ROWS: list[tuple] = [
    (9101, "subscribe to our newsletter\nproduct one is great\nall rights reserved"),
    (9102, "subscribe to our newsletter\nsecond doc body line\nall rights reserved"),
    (9103, "unique opening line\n subscribe to our newsletter \nclosing thoughts here"),
    (9104, "totally unique document\n\nwith a blank line kept"),
    (9105, "all rights reserved"),
]


def line_docs_df(spark: SparkSession) -> DataFrame:
    return jvm_values_df(
        spark, [("doc_id", "BIGINT"), ("text", "STRING")], LINE_DOC_ROWS
    )


def line_docs_cte() -> str:
    return values_cte("line_docs", LINE_DOC_COLUMNS, LINE_DOC_ROWS)
