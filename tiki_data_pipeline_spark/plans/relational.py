"""Relational core queries (SURVEY.md §2.2-2.6).

Each query re-expresses one reference operator (cited by SURVEY id,
e.g. W4 = latest-per-key `DISTINCT ON` from
reference `src/pipelines/crawl/storage/postgres_storage.py:1283-1305`)
as an idiomatic Spark DataFrame plan over the driver's TPC-H-ish
tables, with a DuckDB oracle for the correctness gate.

Scale notes (100 TB design intent) are inline per query: which side
broadcasts, where the shuffle lands, why partial aggregation keeps
the shuffle small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators.rangejoin import (
    range_bucket_attach,
    range_join_expanded,
)
from tiki_data_pipeline_spark.plans import exactmath as X
from tiki_data_pipeline_spark.plans.registry import query


# --------------------------------------------------------------------------
# A1/A6-style full-table aggregation — TPC-H Q1 shape. Flagship query.
# Partial (map-side) aggregation means the shuffle carries only
# n_groups × n_partitions rows regardless of input size: scales to 100 TB.
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({X.o_ints('l_quantity')}) AS DOUBLE)          AS sum_qty,
           CAST(SUM({X.o_cents('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base_price,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}))", "100", 100)} AS sum_disc_price,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}) * (100 + {X.o_hundredths('l_tax')}))", "10000", 100)} AS sum_charge,
           {X.o_avg_int_2dp('l_quantity')}                        AS avg_qty,
           {X.o_avg_money_2dp('l_extendedprice')}                 AS avg_price,
           {X.o_avg_rate_4dp('l_discount')}                       AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape; reference A1/A6 stats
    blocks). Money math runs in exact integer cents (see exactmath)."""
    li = load_table(spark, sf_dir, "lineitem")
    ext_c = X.cents(F.col("l_extendedprice"))
    d_h = X.hundredths(F.col("l_discount"))
    t_h = X.hundredths(F.col("l_tax"))
    q_i = X.ints(F.col("l_quantity"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q_i).alias("_sq"),
            F.sum(ext_c).alias("_sbp"),
            F.sum(ext_c * (100 - d_h)).alias("_sdp"),
            F.sum(ext_c * (100 - d_h) * (100 + t_h)).alias("_sch"),
            F.sum(d_h).alias("_sdh"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "CAST(_sq AS DOUBLE) AS sum_qty",
            "CAST(_sbp AS DOUBLE) / 100.0 AS sum_base_price",
            X.div_round_expr("_sdp", "100", 100) + " AS sum_disc_price",
            X.div_round_expr("_sch", "10000", 100) + " AS sum_charge",
            X.div_round_expr("_sq * 100", "count_order", 100) + " AS avg_qty",
            X.div_round_expr("_sbp", "count_order", 100) + " AS avg_price",
            X.div_round_expr("_sdh * 100", "count_order", 10000) + " AS avg_disc",
            "count_order",
        )
    )


# --------------------------------------------------------------------------
# J2/J7-style multi-join + aggregation — TPC-H Q5 shape.
# region/nation are broadcast (bounded dims at any SF); the big
# lineitem⋈orders join shuffles on orderkey, which both sides already
# key on — at scale, bucketing both by orderkey removes that shuffle.
@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}))", "100", 100)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation for one region (TPC-H Q5 shape; reference J2+A2)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")

    return (
        customer.join(orders_f, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # unhinted: supplier scales with SF (broadcast would cap at
            # ~10M rows); AQE still broadcasts it at small factors
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                X.cents(F.col("l_extendedprice"))
                * (100 - X.hundredths(F.col("l_discount")))
            ).alias("_sdp")
        )
        .selectExpr("n_name", X.div_round_expr("_sdp", "100", 100) + " AS revenue")
    )


# --------------------------------------------------------------------------
# W1 top-k by count (reference aggregator.py:179-193, top-10 categories/
# sellers). Tie-broken on the group key so LIMIT is deterministic.
@query(
    "topk_brands",
    oracle="""
    SELECT p_brand, COUNT(*) AS product_count
    FROM part
    GROUP BY p_brand
    ORDER BY product_count DESC, p_brand
    LIMIT 10
    """,
)
def topk_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 brands by product count (reference W1)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("product_count"))
        .orderBy(F.col("product_count").desc(), F.col("p_brand"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# W2 multi-key sort with explicit NULL placement + limit (reference
# postgres_storage.py:1601-1619). A global top-N is a TakeOrdered —
# no full sort materialization even at 100 TB.
@query(
    "orders_top_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderdate DESC, o_orderkey
    LIMIT 25
    """,
)
def orders_top_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top orders by price, nulls-last multi-key ordering (reference W2)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderdate").desc(),
            F.col("o_orderkey"),
        )
        .limit(25)
    )


# --------------------------------------------------------------------------
# W4 latest-per-key (reference `DISTINCT ON (product_id) ... ORDER BY
# crawled_at DESC`, postgres_storage.py:1283-1305). row_number over a
# key-partitioned window shuffles once on the key; deterministic
# tie-break on orderkey (risk register §7.3(2)).
@query(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) t
    WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer (reference W4 / J8 as-of state read)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# --------------------------------------------------------------------------
# W5 dedup-keep-best (reference postgres_storage.py:772-800: per
# category keep shortest URL, tie longest name).
@query(
    "dedup_keep_best_part",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_size
    FROM (
      SELECT p_brand, p_partkey, p_name, p_size,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY p_size ASC, LENGTH(p_name) DESC, p_partkey ASC
             ) AS rn
      FROM part
    ) t
    WHERE rn = 1
    """,
)
def dedup_keep_best_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per brand keep smallest-size part, tie → longest name (reference W5)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_size").asc(), F.length("p_name").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", "p_partkey", "p_name", "p_size")
    )


# --------------------------------------------------------------------------
# J3 semi-join (reference chunked IN-list existence probe,
# postgres_storage.py:910-933). left_semi never duplicates rows and
# only ships the join key — the IN-list chunking hack disappears.
@query(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that have ≥1 order — semi-join (reference J3)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J4/J5 anti-join (reference NOT EXISTS orphan deletes,
# postgres_storage.py:1884-1891).
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — anti-join (reference J4/J5/J6)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J1 OR-predicate join, decomposed into two equi-joins + distinct
# (reference postgres_storage.py:1514-1540). The naive OR-join is a
# nested-loop (cartesian) plan; the union-of-equi-joins form keeps
# both probes hash-joinable — at 100 TB that is the difference
# between feasible and not.
@query(
    "or_join_part_lineitem",
    oracle="""
    SELECT p_brand, COUNT(DISTINCT l_orderkey) AS order_count
    FROM (
      SELECT p.p_brand, l.l_orderkey
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      UNION
      SELECT p.p_brand, l.l_orderkey
      FROM part p JOIN lineitem l
        ON l.l_suppkey = p.p_partkey AND l.l_partkey <> p.p_partkey
    ) t
    GROUP BY p_brand
    """,
)
def or_join_part_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-join decomposition: equi-join union instead of nested loop (J1).

    (r14 probe note: a single-fact-scan variant — two chained LEFT
    broadcast lookups + explode of the ≤2 matched brands — produces
    the identical pair set with half the lineitem scans, but LOST the
    interleaved same-session A/B 1.457 → 2.093 s at sf0.1: the wide
    two-join intermediate plus the Generate row doubling costs more
    than the second columnar scan saves. Recorded so it is not
    retried; the union form's scans are embarrassingly parallel and
    its joins stay AQE-broadcast.)
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    branch1 = part.join(li, li.l_partkey == part.p_partkey).select(
        "p_brand", "l_orderkey"
    )
    # second disjunct minus the first (classic OR-decomposition: avoid
    # double-counting rows matching both predicates)
    branch2 = part.join(
        li, (li.l_suppkey == part.p_partkey) & (li.l_partkey != part.p_partkey)
    ).select("p_brand", "l_orderkey")
    return (
        branch1.unionByName(branch2)
        .distinct()
        .groupBy("p_brand")
        .agg(F.countDistinct("l_orderkey").alias("order_count"))
    )


# --------------------------------------------------------------------------
# A3 count-distinct per group (reference COUNT(DISTINCT ...) calls,
# postgres_storage.py:1631 etc.). Exact distinct = extra shuffle on
# (group, value); at 100 TB prefer approx_count_distinct (HLL sketch,
# single pass) — exposed in operators.relational.
@query(
    "distinct_suppliers_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS supplier_count,
           COUNT(DISTINCT l_orderkey) AS order_count
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (reference A3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("supplier_count"),
        F.countDistinct("l_orderkey").alias("order_count"),
    )


# --------------------------------------------------------------------------
# A4/A5 conditional aggregation (reference FILTER/CASE breakdowns,
# postgres_storage.py:1716-1732, incremental_crawler.py:113-124).
@query(
    "order_status_breakdown",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*)                                            AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')         AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 50000)        AS n_large,
           {X.o_avg_money_2dp('o_totalprice')}                 AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def order_status_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation breakdown (reference A4/A5)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_totalprice") > 50000, 1)).alias("n_large"),
            F.sum(X.cents(F.col("o_totalprice"))).alias("_sc"),
        )
        .selectExpr(
            "o_orderpriority",
            "n_orders",
            "n_finished",
            "n_large",
            X.div_round_expr("_sc", "n_orders", 100) + " AS avg_price",
        )
    )


# --------------------------------------------------------------------------
# A6 scalar stat block in one row (reference postgres_storage.py:1621-1642).
@query(
    "lineitem_stats_block",
    oracle=f"""
    SELECT COUNT(*)                        AS total_rows,
           COUNT(DISTINCT l_partkey)       AS distinct_parts,
           COUNT(DISTINCT l_suppkey)       AS distinct_suppliers,
           {X.o_avg_money_2dp('l_extendedprice')}  AS avg_price,
           MIN(l_shipdate)                 AS first_ship,
           MAX(l_shipdate)                 AS last_ship
    FROM lineitem
    """,
)
def lineitem_stats_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row stats block (reference A6 get_category_stats)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.sum(X.cents(F.col("l_extendedprice"))).alias("_sc"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    ).selectExpr(
        "total_rows",
        "distinct_parts",
        "distinct_suppliers",
        X.div_round_expr("_sc", "total_rows", 100) + " AS avg_price",
        "first_ship",
        "last_ship",
    )


# --------------------------------------------------------------------------
# A7 group-by on computed key (reference GROUP BY
# jsonb_array_length(category_path), fix_category_paths.py:246-251).
@query(
    "groupby_computed_key",
    oracle=f"""
    SELECT CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INTEGER) AS n_words,
           COUNT(*) AS n_parts,
           {X.o_avg_money_2dp('p_retailprice')} AS avg_price
    FROM part
    GROUP BY 1
    """,
)
def groupby_computed_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by a computed key (reference A7)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(F.size(F.split(F.col("p_name"), " ")).alias("n_words"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(X.cents(F.col("p_retailprice"))).alias("_sc"),
        )
        .selectExpr(
            "n_words",
            "n_parts",
            X.div_round_expr("_sc", "n_parts", 100) + " AS avg_price",
        )
    )


# --------------------------------------------------------------------------
# A8 HAVING (reference per-brand stats with HAVING COUNT>=5,
# TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1149-1162).
@query(
    "brand_stats_having",
    oracle=f"""
    SELECT p_brand,
           COUNT(*)                      AS n_parts,
           {X.o_avg_money_2dp('p_retailprice')}  AS avg_price,
           ROUND(MAX(p_retailprice), 2)  AS max_price,
           ROUND(MIN(p_retailprice), 2)  AS min_price
    FROM part
    GROUP BY p_brand
    HAVING COUNT(*) >= 5
    """,
)
def brand_stats_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand stats with HAVING (reference A8). MIN/MAX round raw
    2-decimal values (safe); only the AVG needs exact-integer math."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(X.cents(F.col("p_retailprice"))).alias("_sc"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
        )
        .filter(F.col("n_parts") >= 5)
        .selectExpr(
            "p_brand",
            "n_parts",
            X.div_round_expr("_sc", "n_parts", 100) + " AS avg_price",
            "max_price",
            "min_price",
        )
    )


# --------------------------------------------------------------------------
# A9 histogram bucketing (reference discount-range histogram,
# TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1127-1143) — a when-chain, not
# a join: stays inside whole-stage codegen.
@query(
    "discount_histogram",
    oracle="""
    SELECT CASE
             WHEN l_discount < 0.02 THEN '0-2%'
             WHEN l_discount < 0.05 THEN '2-5%'
             WHEN l_discount < 0.08 THEN '5-8%'
             ELSE '8%+'
           END AS discount_bucket,
           COUNT(*) AS n_items,
           {AVG_QTY} AS avg_qty,
           CAST(SUM({CENTS}) AS DOUBLE) / 100.0 AS total_price
    FROM lineitem
    GROUP BY 1
    """.replace("{AVG_QTY}", X.o_avg_int_2dp("l_quantity")).replace(
        "{CENTS}", X.o_cents("l_extendedprice")
    ),
)
def discount_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-range histogram (reference A9)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_discount") < 0.02, "0-2%")
        .when(F.col("l_discount") < 0.05, "2-5%")
        .when(F.col("l_discount") < 0.08, "5-8%")
        .otherwise("8%+")
    )
    return (
        li.groupBy(bucket.alias("discount_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(X.ints(F.col("l_quantity"))).alias("_sq"),
            F.sum(X.cents(F.col("l_extendedprice"))).alias("_sc"),
        )
        .selectExpr(
            "discount_bucket",
            "n_items",
            X.div_round_expr("_sq * 100", "n_items", 100) + " AS avg_qty",
            "CAST(_sc AS DOUBLE) / 100.0 AS total_price",
        )
    )


# --------------------------------------------------------------------------
# J11 range/bucket join (reference price→price_segment fixed buckets,
# TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1180-1187). Implemented as a
# broadcast non-equi join against the tiny segments dim — the
# broadcast turns a O(n·m) nested loop into a per-row scan of 6
# in-memory rows, fine at any scale.
_PRICE_SEGMENTS = [
    ("S1_budget", 0.0, 25000.0),
    ("S2_low", 25000.0, 50000.0),
    ("S3_mid", 50000.0, 100000.0),
    ("S4_high", 100000.0, 200000.0),
    ("S5_premium", 200000.0, 400000.0),
    ("S6_luxury", 400000.0, 1e18),
]


@query(
    "price_segment_join",
    oracle="""
    WITH segments(segment, lo, hi) AS (
      VALUES ('S1_budget', 0.0, 25000.0),
             ('S2_low', 25000.0, 50000.0),
             ('S3_mid', 50000.0, 100000.0),
             ('S4_high', 100000.0, 200000.0),
             ('S5_premium', 200000.0, 400000.0),
             ('S6_luxury', 400000.0, 1e18)
    )
    SELECT segment,
           COUNT(*) AS n_orders,
           {AVG_PRICE} AS avg_price
    FROM orders JOIN segments
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY segment
    """.replace("{AVG_PRICE}", X.o_avg_money_2dp("o_totalprice")),
)
def price_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-bucket join against a bounded segment dim (reference J11),
    compiled to a codegen'd CASE chain — the fact side never enters an
    interpreted BroadcastNestedLoopJoin (sf1 plan audit, r9)."""
    orders = load_table(spark, sf_dir, "orders")
    segments = spark.createDataFrame(
        _PRICE_SEGMENTS, schema="segment string, lo double, hi double"
    )
    return (
        range_bucket_attach(orders, segments, "o_totalprice")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(X.cents(F.col("o_totalprice"))).alias("_sc"),
        )
        .selectExpr(
            "segment",
            "n_orders",
            X.div_round_expr("_sc", "n_orders", 100) + " AS avg_price",
        )
    )


# Overlapping marketing bands: a fact row can fall in MORE than one
# band, so the compiled CASE-chain rewrite (range_bucket_attach)
# correctly refuses and the bucket-expansion equi-join is the scale
# path — this is the J11 range join in its general form.
_PROMO_BANDS = [
    ("B1_entry", 0.0, 60000.0),
    ("B2_core", 40000.0, 160000.0),
    ("B3_plus", 120000.0, 320000.0),
    ("B4_vip", 250000.0, 600000.0),
]


@query(
    "orders_overlapping_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('B1_entry', 0.0, 60000.0),
             ('B2_core', 40000.0, 160000.0),
             ('B3_plus', 120000.0, 320000.0),
             ('B4_vip', 250000.0, 600000.0)
    )
    SELECT band,
           COUNT(*) AS n_orders,
           {AVG_PRICE} AS avg_price
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """.replace("{AVG_PRICE}", X.o_avg_money_2dp("o_totalprice")),
)
def orders_overlapping_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against OVERLAPPING bands (reference J11, general
    case) via bucket expansion: each band explodes into its covering
    20k-wide buckets, orders equi-join on their single bucket, and the
    residual predicate filters — a hash join at any dim size, never a
    BroadcastNestedLoopJoin (operators/rangejoin.py)."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        _PROMO_BANDS, schema="band string, lo double, hi double"
    )
    return (
        range_join_expanded(orders, bands, "o_totalprice", bucket_width=20000.0)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(X.cents(F.col("o_totalprice"))).alias("_sc"),
        )
        .selectExpr(
            "band",
            "n_orders",
            X.div_round_expr("_sc", "n_orders", 100) + " AS avg_price",
        )
    )


# --------------------------------------------------------------------------
# D4 set difference (reference missing_parents = needed - present,
# postgres_storage.py:832-854).
@query(
    "parts_never_shipped",
    oracle="""
    SELECT p_partkey FROM part
    EXCEPT
    SELECT l_partkey AS p_partkey FROM lineitem
    """,
)
def parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: parts that never appear in lineitem (reference D4)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return part.select("p_partkey").exceptAll(
        li.select(F.col("l_partkey").alias("p_partkey"))
    ).distinct()


# --------------------------------------------------------------------------
# D1/D2 union + dedup-by-key (reference fan-in concat + seen-set,
# tasks/product.py:56-148, crawl_products.py:896-902).
@query(
    "union_dedup_keys",
    oracle="""
    SELECT DISTINCT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer
    ) t
    """,
)
def union_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of two sources then dedup by key (reference D1+D2)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.select(F.col("o_custkey").alias("custkey"))
        .unionByName(customer.select(F.col("c_custkey").alias("custkey")))
        .dropDuplicates(["custkey"])
    )


# --------------------------------------------------------------------------
# W8/P9 lag-based change detection (reference change columns vs previous
# snapshot, postgres_storage.py:1317-1380). One shuffle on user_id;
# the window sort is per-partition.
@query(
    "event_value_changes",
    oracle="""
    SELECT user_id, event_id, ts, event_type,
           ROUND(value, 2) AS value,
           ROUND(value - LAG(value) OVER w, 2) AS value_change,
           CASE
             WHEN LAG(value) OVER w IS NULL THEN 'first_seen'
             WHEN value > LAG(value) OVER w THEN 'increase'
             WHEN value < LAG(value) OVER w THEN 'decrease'
             ELSE 'no_change'
           END AS change_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def event_value_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-based change detection (reference W8/P9/M8 classify)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value"), 2).alias("value"),
        F.round(F.col("value") - prev, 2).alias("value_change"),
        F.when(prev.isNull(), "first_seen")
        .when(F.col("value") > prev, "increase")
        .when(F.col("value") < prev, "decrease")
        .otherwise("no_change")
        .alias("change_type"),
    )
