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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
    o = orders.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.countDistinct("o_custkey").alias("active_customers"),
        F.sum(X.cents(F.col("o_totalprice"))).alias("_sc"),
    ).selectExpr(
        "total_orders",
        "active_customers",
        "CAST(_sc AS DOUBLE) / 100.0 AS gross_revenue",
    )
    l = li.agg(
        F.count(F.lit(1)).alias("total_line_items"),
        F.sum(X.hundredths(F.col("l_discount"))).alias("_sdh"),
    ).selectExpr(
        "total_line_items",
        X.div_round_expr("_sdh * 10000", "total_line_items", 10000)
        + " AS avg_discount_pct",
    )
    return o.crossJoin(l)


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
