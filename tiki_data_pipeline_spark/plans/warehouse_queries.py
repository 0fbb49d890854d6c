"""Star-schema warehouse queries (SURVEY.md §1.1 star schema,
§3.3 warehouse views, §2.2 P10 analytics columns).

The reference maintains a Kimball star (fact_product_sales + 6 dims,
reference docs/04-CONFIGURATION/TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:
1173-1387) with views vw_top_products_revenue / vw_category_performance
/ vw_daily_sales / vw_price_segment_analysis. Re-expressed on the
driver's TPC-H-ish tables: part≈product dim, p_type≈category,
orders/lineitem≈fact.

Surrogate keys are DENSE_RANK over the natural key's stable order —
deterministic and shuffle-minimal (one window); at 100 TB prefer
monotonically_increasing_id + a broadcast remap only when rank's
single-reduce would bottleneck (dims are small by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators.rangejoin import range_bucket_attach
from tiki_data_pipeline_spark.plans import exactmath as X
from tiki_data_pipeline_spark.plans.registry import query


@query(
    "dim_date_build",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY d) AS date_sk,
           d AS full_date,
           CAST(EXTRACT(year FROM d) AS INTEGER) AS year,
           CAST(EXTRACT(month FROM d) AS INTEGER) AS month,
           CAST(EXTRACT(day FROM d) AS INTEGER) AS day,
           CAST(EXTRACT(quarter FROM d) AS INTEGER) AS quarter
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) t
    """,
)
def dim_date_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_date with surrogate keys from the fact's distinct dates."""
    orders = load_table(spark, sf_dir, "orders")
    dates = orders.select(
        F.col("o_orderdate").cast("date").alias("full_date")
    ).distinct()
    w = W.orderBy("full_date")
    return dates.select(
        # bigint: Spark ranks are INT but ANSI rank functions (and the
        # oracle) are BIGINT
        F.dense_rank().over(w).cast("bigint").alias("date_sk"),
        "full_date",
        F.year("full_date").alias("year"),
        F.month("full_date").alias("month"),
        F.dayofmonth("full_date").alias("day"),
        F.quarter("full_date").alias("quarter"),
    )


@query(
    "vw_daily_sales",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE) AS sale_date,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM({X.o_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue,
           {X.o_avg_money_2dp('o_totalprice')} AS avg_order_value
    FROM orders
    GROUP BY 1
    """,
)
def vw_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sales view (reference vw_daily_sales)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("sale_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(X.cents(F.col("o_totalprice"))).alias("_sc"),
        )
        .selectExpr(
            "sale_date",
            "n_orders",
            "n_customers",
            "CAST(_sc AS DOUBLE) / 100.0 AS revenue",
            X.div_round_expr("_sc", "n_orders", 100) + " AS avg_order_value",
        )
    )


@query(
    "vw_top_products_revenue",
    oracle=f"""
    SELECT p_partkey, p_name, p_brand,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}))", "100", 100)} AS revenue,
           CAST(SUM({X.o_ints('l_quantity')}) AS BIGINT) AS units_sold
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, p_partkey
    LIMIT 20
    """,
)
def vw_top_products_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 products by revenue (reference vw_top_products_revenue;
    P10 estimated_revenue column)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)  # part scales with SF; AQE decides
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(
            F.sum(
                X.cents(F.col("l_extendedprice"))
                * (100 - X.hundredths(F.col("l_discount")))
            ).alias("_sdp"),
            F.sum(X.ints(F.col("l_quantity"))).alias("units_sold"),
        )
        .selectExpr(
            "p_partkey",
            "p_name",
            "p_brand",
            X.div_round_expr("_sdp", "100", 100) + " AS revenue",
            "units_sold",
        )
        .orderBy(F.col("revenue").desc(), F.col("p_partkey"))
        .limit(20)
    )


@query(
    "vw_category_performance",
    oracle=f"""
    SELECT p_type AS category,
           COUNT(DISTINCT p_partkey) AS n_products,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}))", "100", 100)} AS revenue,
           {X.o_div_round(f"SUM({X.o_hundredths('l_discount')}) * 100", "COUNT(*)", 100)} AS avg_discount_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def vw_category_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category performance (reference vw_category_performance;
    p_type standing in for the category dim). avg_discount_pct =
    ROUND(AVG(discount)·100, 2): discount hundredths ARE percent, so
    the exact form is half-up(sum(d_h)·100 / n) / 100."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)  # part scales with SF; AQE decides
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            F.countDistinct("p_partkey").alias("n_products"),
            F.sum(
                X.cents(F.col("l_extendedprice"))
                * (100 - X.hundredths(F.col("l_discount")))
            ).alias("_sdp"),
            F.sum(X.hundredths(F.col("l_discount"))).alias("_sdh"),
            F.count(F.lit(1)).alias("_n"),
        )
        .selectExpr(
            "category",
            "n_products",
            X.div_round_expr("_sdp", "100", 100) + " AS revenue",
            X.div_round_expr("_sdh * 100", "_n", 100) + " AS avg_discount_pct",
        )
    )


@query(
    "warehouse_kpi_block",
    oracle=f"""
    SELECT (SELECT COUNT(*) FROM orders) AS total_orders,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS active_customers,
           (SELECT CAST(SUM({X.o_cents('o_totalprice')}) AS DOUBLE) / 100.0
            FROM orders) AS gross_revenue,
           (SELECT COUNT(*) FROM lineitem) AS total_line_items,
           (SELECT {X.o_div_round(f"SUM({X.o_hundredths('l_discount')}) * 10000", "COUNT(*)", 10000)}
            FROM lineitem) AS avg_discount_pct
    """,
)
def warehouse_kpi_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row KPI block (reference KPI queries,
    TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1112-1121)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # ONE aggregation over a tagged union of the two facts — joining
    # two 1-row aggregates plans a nested-loop/cartesian (Catalyst
    # folds any constant join key back to a trivially-true condition),
    # and a single map-side-combined agg is the cleaner scale shape
    # anyway (sf1 plan audit, r9).
    o = orders.select(
        F.lit(True).alias("_is_order"),
        F.col("o_custkey"),
        X.cents(F.col("o_totalprice")).alias("_oc"),
        F.lit(None).cast("long").alias("_dh"),
    )
    l = li.select(
        F.lit(False).alias("_is_order"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("long").alias("_oc"),
        X.hundredths(F.col("l_discount")).alias("_dh"),
    )
    return (
        o.unionByName(l)
        .agg(
            F.count(F.when(F.col("_is_order"), 1)).alias("total_orders"),
            F.countDistinct("o_custkey").alias("active_customers"),
            F.sum("_oc").alias("_sc"),
            F.count(F.when(~F.col("_is_order"), 1)).alias("total_line_items"),
            F.sum("_dh").alias("_sdh"),
        )
        .selectExpr(
            "total_orders",
            "active_customers",
            "CAST(_sc AS DOUBLE) / 100.0 AS gross_revenue",
            "total_line_items",
            X.div_round_expr("_sdh * 10000", "total_line_items", 10000)
            + " AS avg_discount_pct",
        )
    )


# ---------------------------------------------------------------- dims
# Reference star schema: dim_product / dim_category / dim_seller /
# dim_brand / dim_date / dim_price_segment, each with a SERIAL
# surrogate key (TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1173-1320).
# Surrogate keys here are DENSE_RANK over the natural key's stable
# order — deterministic, and dims are small by definition so the
# single-partition window is not a scale concern (at 100 TB dims are
# still ≪ executor memory; facts never get a window).


@query(
    "dim_product_build",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY p_partkey) AS product_sk,
           p_partkey AS product_id, p_name AS product_name,
           p_brand AS brand, p_type AS category_id
    FROM part
    """,
)
def dim_product_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_product with surrogate keys (reference dim_product:
    TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1259-1272).

    dim_product is the one SF-SCALED dim, so the SK comes from the
    distributed two-phase rank — never a single-partition window."""
    from tiki_data_pipeline_spark.operators.ranking import dense_sk_by_unique_key

    part = load_table(spark, sf_dir, "part")
    return dense_sk_by_unique_key(part, "p_partkey", "product_sk").select(
        "product_sk",
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("category_id"),
    )


@query(
    "dim_brand_build",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY brand_name) AS brand_sk, brand_name
    FROM (SELECT DISTINCT p_brand AS brand_name FROM part) t
    """,
)
def dim_brand_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_brand: distinct natural keys + surrogate keys (reference
    dim_brand: TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1207-1215)."""
    part = load_table(spark, sf_dir, "part")
    brands = part.select(F.col("p_brand").alias("brand_name")).distinct()
    return brands.select(
        F.dense_rank().over(W.orderBy("brand_name")).cast("bigint").alias("brand_sk"),
        "brand_name",
    )


@query(
    "dim_seller_build",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY s_suppkey) AS seller_sk,
           s_suppkey AS seller_id, s_name AS seller_name,
           n_name AS seller_nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def dim_seller_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_seller enriched with the nation name via a broadcast join
    (reference dim_seller: TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1221-1231).

    supplier scales with SF, so the SK uses the distributed two-phase
    rank like dim_product."""
    from tiki_data_pipeline_spark.operators.ranking import dense_sk_by_unique_key

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    enriched = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    return dense_sk_by_unique_key(enriched, "s_suppkey", "seller_sk").select(
        "seller_sk",
        F.col("s_suppkey").alias("seller_id"),
        F.col("s_name").alias("seller_name"),
        F.col("n_name").alias("seller_nation"),
    )


@query(
    "dim_category_build",
    oracle="""
    SELECT DENSE_RANK() OVER (ORDER BY category_id) AS category_sk,
           category_id,
           STRING_SPLIT(category_id, '/')[1] AS level_1,
           STRING_SPLIT(category_id, '/')[2] AS level_2,
           STRING_SPLIT(category_id, '/')[3] AS level_3
    FROM (SELECT DISTINCT p_type || '/' || p_brand AS category_id FROM part) t
    """,
)
def dim_category_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_category: a path id split into level_1..level_N columns,
    mirroring the reference's level_1..level_5 denormalized path
    (TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1237-1253). The two-level
    p_type/p_brand taxonomy stands in for the category path; level_3
    is NULL via null-tolerant indexing, exactly like the reference's
    sparse deeper levels."""
    part = load_table(spark, sf_dir, "part")
    cats = part.select(
        F.concat_ws("/", "p_type", "p_brand").alias("category_id")
    ).distinct()
    parts = F.split(F.col("category_id"), "/")
    return cats.select(
        F.dense_rank().over(W.orderBy("category_id")).cast("bigint").alias("category_sk"),
        "category_id",
        F.get(parts, 0).alias("level_1"),
        F.get(parts, 1).alias("level_2"),
        F.get(parts, 2).alias("level_3"),
    )


# Part-retail-price segments (testdata p_retailprice spans 900-1000);
# the reference's six fixed VND bands map to five fixed bands here.
_PART_SEGMENTS = [
    ("P1_entry", 0.0, 920.0),
    ("P2_value", 920.0, 940.0),
    ("P3_core", 940.0, 960.0),
    ("P4_plus", 960.0, 980.0),
    ("P5_premium", 980.0, 1e18),
]

_PART_SEGMENT_COLS = [
    ("segment_name", "VARCHAR"), ("min_price", "DOUBLE"), ("max_price", "DOUBLE"),
]


@query(
    "dim_price_segment_build",
    oracle=f"""
    WITH {FX.values_cte('seg', _PART_SEGMENT_COLS, _PART_SEGMENTS)}
    SELECT DENSE_RANK() OVER (ORDER BY segment_name) AS price_segment_sk,
           segment_name, min_price, max_price
    FROM seg
    """,
)
def dim_price_segment_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_price_segment: the fixed band table with surrogate keys
    (reference dim_price_segment with its six static bands,
    TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1173-1188)."""
    seg = spark.createDataFrame(
        _PART_SEGMENTS, schema="segment_name string, min_price double, max_price double"
    )
    return seg.select(
        F.dense_rank()
        .over(W.orderBy("segment_name"))
        .cast("bigint")
        .alias("price_segment_sk"),
        "segment_name",
        "min_price",
        "max_price",
    )


@query(
    "vw_price_segment_analysis",
    oracle=f"""
    WITH {FX.values_cte('seg', _PART_SEGMENT_COLS, _PART_SEGMENTS)}
    SELECT segment_name,
           COUNT(DISTINCT p_partkey) AS product_count,
           {X.o_avg_money_2dp('p_retailprice')} AS avg_price,
           {X.o_div_round(f"SUM({X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}))", "100", 100)} AS total_revenue,
           {X.o_div_round(f"SUM({X.o_hundredths('l_discount')}) * 100", "COUNT(*)", 100)} AS avg_discount_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN seg ON p_retailprice >= min_price AND p_retailprice < max_price
    GROUP BY segment_name
    """,
)
def vw_price_segment_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-price-segment rollup (reference vw_price_segment_analysis:
    TIKI_WAREHOUSE_DATABASE_SCHEMA_VI.md:1374-1387): product count,
    average price, revenue and average discount per fixed band. The
    segment dim is broadcast; the fact side aggregates in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    seg = spark.createDataFrame(
        _PART_SEGMENTS, schema="segment_name string, min_price double, max_price double"
    )
    # the range join runs on the PART side (price is a part attribute)
    # and is compiled to a codegen'd CASE chain — no interpreted
    # nested loop anywhere (r9; ranging the fact measured 22 s vs 2 s
    # at 10x sf0.1 even as a BNLJ) — then the segmented dim
    # hash-equi-joins into lineitem.
    part_seg = range_bucket_attach(
        part, seg, "p_retailprice", lo_col="min_price", hi_col="max_price"
    ).select("p_partkey", "p_retailprice", "segment_name")
    return (
        li.join(part_seg, li.l_partkey == F.col("p_partkey"))  # part-sized; AQE decides
        .groupBy("segment_name")
        .agg(
            F.countDistinct("p_partkey").alias("product_count"),
            F.sum(X.cents(F.col("p_retailprice"))).alias("_spc"),
            F.sum(
                X.cents(F.col("l_extendedprice"))
                * (100 - X.hundredths(F.col("l_discount")))
            ).alias("_sdp"),
            F.sum(X.hundredths(F.col("l_discount"))).alias("_sdh"),
            F.count(F.lit(1)).alias("_n"),
        )
        .selectExpr(
            "segment_name",
            "product_count",
            X.div_round_expr("_spc", "_n", 100) + " AS avg_price",
            X.div_round_expr("_sdp", "100", 100) + " AS total_revenue",
            X.div_round_expr("_sdh * 100", "_n", 100) + " AS avg_discount_pct",
        )
    )


_SCD_EFFECTIVE = "2025-01-20 00:00:00"

_SCD_DIM_ROWS = [
    # key, name, price, valid_from, valid_to, is_current
    ("100001", "Tai nghe Bluetooth XYZ", 500000, "2024-12-01 00:00:00",
     "2025-01-01 00:00:00", False),
    ("100001", "Tai nghe Bluetooth XYZ", 389000, "2025-01-01 00:00:00", None, True),
    ("100002", "Áo thun nam", 150000, "2024-12-15 00:00:00", None, True),
    ("100004", "Sách lập trình", 95000, "2025-01-05 00:00:00", None, True),
]

_SCD_INCOMING_ROWS = [
    ("100001", "Tai nghe Bluetooth XYZ", 379000),   # price change → new version
    ("100002", "Áo thun nam", 150000),              # unchanged
    ("200001", "Sản phẩm mới", 99000),              # new key
]

_SCD_DIM_COLS = [
    ("product_id", "VARCHAR"), ("name", "VARCHAR"), ("price", "BIGINT"),
    ("valid_from", "TIMESTAMP"), ("valid_to", "TIMESTAMP"), ("is_current", "BOOLEAN"),
]
_SCD_INC_COLS = [("product_id", "VARCHAR"), ("name", "VARCHAR"), ("price", "BIGINT")]


@query(
    "scd2_dimension_apply",
    oracle=f"""
    WITH {FX.values_cte('dim', _SCD_DIM_COLS, _SCD_DIM_ROWS)},
    {FX.values_cte('incoming', _SCD_INC_COLS, _SCD_INCOMING_ROWS)},
    cur AS (SELECT * FROM dim WHERE is_current),
    hist AS (SELECT * FROM dim WHERE NOT is_current),
    j AS (
      SELECT c.product_id AS cur_id, c.name AS old_name, c.price AS old_price,
             c.valid_from, c.valid_to,
             i.product_id AS inc_id, i.name AS new_name, i.price AS new_price
      FROM cur c FULL OUTER JOIN incoming i ON c.product_id = i.product_id
    ),
    changed AS (
      SELECT * FROM j WHERE inc_id IS NOT NULL AND cur_id IS NOT NULL
        AND (new_name IS DISTINCT FROM old_name OR new_price IS DISTINCT FROM old_price)
    )
    SELECT product_id, name, price, valid_from, valid_to, is_current FROM hist
    UNION ALL
    SELECT cur_id, old_name, old_price, valid_from,
           TIMESTAMP '{_SCD_EFFECTIVE}', FALSE FROM changed
    UNION ALL
    SELECT cur_id, old_name, old_price, valid_from, valid_to, TRUE
    FROM j WHERE cur_id IS NOT NULL
      AND NOT (inc_id IS NOT NULL
               AND (new_name IS DISTINCT FROM old_name
                    OR new_price IS DISTINCT FROM old_price))
    UNION ALL
    SELECT inc_id, new_name, new_price, TIMESTAMP '{_SCD_EFFECTIVE}',
           CAST(NULL AS TIMESTAMP), TRUE
    FROM j WHERE inc_id IS NOT NULL
      AND (cur_id IS NULL OR new_name IS DISTINCT FROM old_name
           OR new_price IS DISTINCT FROM old_price)
    """,
)
def scd2_dimension_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versioning: close changed versions, open new ones, pass
    history and unchanged rows through (operators/scd.py)."""
    from tiki_data_pipeline_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            (r[0], r[1], r[2],) + tuple(r[3:5]) + (r[5],)
            for r in _SCD_DIM_ROWS
        ],
        schema="product_id string, name string, price bigint, valid_from string,"
        " valid_to string, is_current boolean",
    ).select(
        "product_id",
        "name",
        "price",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
        "is_current",
    )
    incoming = spark.createDataFrame(
        _SCD_INCOMING_ROWS, schema="product_id string, name string, price bigint"
    )
    return scd2_apply(
        dim, incoming, "product_id", ["name", "price"], _SCD_EFFECTIVE
    )


@query(
    "fact_sales_build",
    oracle=f"""
    WITH dim_date AS (
      SELECT DENSE_RANK() OVER (ORDER BY d) AS date_sk, d
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) t
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           d.date_sk,
           {X.o_div_round(f"{X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')})", "100", 100)} AS net_price,
           {X.o_div_round(f"{X.o_cents('l_extendedprice')} * (100 - {X.o_hundredths('l_discount')}) * (100 + {X.o_hundredths('l_tax')})", "10000", 100)} AS charged
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN dim_date d ON CAST(o_orderdate AS DATE) = d.d
    """,
)
def fact_sales_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact build: lineitem grain with the date surrogate key joined
    in (broadcast — dims are bounded)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dim_date = (
        orders.select(F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
        .select(
            F.dense_rank().over(W.orderBy("d")).cast("bigint").alias("date_sk"), "d"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim_date), F.col("o_orderdate").cast("date") == F.col("d"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            "date_sk",
            X.cents(F.col("l_extendedprice")).alias("_ec"),
            X.hundredths(F.col("l_discount")).alias("_dh"),
            X.hundredths(F.col("l_tax")).alias("_th"),
        )
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            "date_sk",
            X.div_round_expr("_ec * (100 - _dh)", "100", 100) + " AS net_price",
            X.div_round_expr("_ec * (100 - _dh) * (100 + _th)", "10000", 100)
            + " AS charged",
        )
    )


@query(
    "daily_revenue_7d_ma",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS sale_date,
             DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
             SUM({X.o_cents('o_totalprice')}) AS day_cents
      FROM orders GROUP BY 1, 2
    ),
    win AS (
      SELECT sale_date, day_cents,
             SUM(day_cents) OVER w AS win_cents,
             COUNT(*) OVER w AS n_days_in_window
      FROM daily
      WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT sale_date,
           CAST(day_cents AS DOUBLE) / 100.0 AS revenue,
           {X.o_div_round('win_cents', 'n_days_in_window', 100)} AS revenue_7d_ma,
           CAST(n_days_in_window AS INTEGER) AS n_days_in_window
    FROM win
    """,
)
def daily_revenue_7d_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily revenue via a RANGE
    window frame over integer day indexes (calendar-gap-aware: days
    with no orders shrink the window rather than silently widening
    it, unlike a 7-ROW frame). Exact integer-cents math with half-up
    division so the oracle agrees bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("sale_date")
    ).agg(F.sum(X.cents(F.col("o_totalprice"))).alias("day_cents"))
    daily = daily.withColumn(
        "day_idx", F.datediff(F.col("sale_date"), F.lit("1970-01-01").cast("date"))
    )
    w = W.orderBy("day_idx").rangeBetween(-6, 0)
    win = daily.select(
        "sale_date",
        "day_cents",
        F.sum("day_cents").over(w).alias("win_cents"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"),
    )
    return win.selectExpr(
        "sale_date",
        "CAST(day_cents AS DOUBLE) / 100.0 AS revenue",
        X.div_round_expr("win_cents", "n_days_in_window", 100)
        + " AS revenue_7d_ma",
        "CAST(n_days_in_window AS INT) AS n_days_in_window",
    )
