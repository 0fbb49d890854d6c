"""Additional analytics shapes: pivot, rollup, running windows,
dataset-verification report (reference tests/verify.py port), and the
LLM corpus-filter pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.operators import textstats as TS
from tiki_data_pipeline_spark.plans import exactmath as X
from tiki_data_pipeline_spark.plans.registry import query


@query(
    "orders_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_count,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_count,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_count
    FROM orders GROUP BY 1
    """,
)
def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: priority × status count matrix (groupBy().pivot())."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_count"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_count"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_count"),
    )


@query(
    "lineitem_rollup_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({X.o_cents('l_extendedprice')}) AS DOUBLE) / 100.0 AS base_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def lineitem_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: revenue at (flag, status), (flag), and grand-total
    grouping levels in one pass (partial-agg friendly)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(X.cents(F.col("l_extendedprice"))).alias("_sc"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "CAST(_sc AS DOUBLE) / 100.0 AS base_revenue",
            "n_items",
        )
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: per-status, per-priority, and grand
    total in one pass (SQL form — the DataFrame API only exposes
    rollup/cube)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "lineitem_cube_quantity",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({X.o_ints('l_quantity')}) AS BIGINT) AS total_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def lineitem_cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(X.ints(F.col("l_quantity"))).alias("total_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "customer_running_revenue",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM({X.o_cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_revenue,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) revenue per customer — frame-bounded
    window aggregation in exact cents."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(X.cents(F.col("o_totalprice")))
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("double")
            / 100.0
        ).alias("running_revenue"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@query(
    "dataset_verification_report",
    oracle="""
    SELECT 'orders_rows' AS metric, (SELECT COUNT(*) FROM orders) AS value
    UNION ALL
    SELECT 'orders_dup_keys',
           (SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1) t)
    UNION ALL
    SELECT 'orders_null_custkey',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_rows', (SELECT COUNT(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem_bad_discount',
           (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    """,
)
def dataset_verification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset integrity report (port of reference tests/verify.py:
    8-411: required fields, duplicate keys, referential integrity,
    range checks) as one tall (metric, value) DataFrame."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(metric: str, value_df: DataFrame) -> DataFrame:
        return value_df.select(
            F.lit(metric).alias("metric"), F.col("value").cast("bigint")
        )

    def tagged(df: DataFrame, metrics: list[str]) -> DataFrame:
        """Explode a single-row multi-metric aggregate into tall rows."""
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("metric"),
                            F.col(m).cast("bigint").alias("value"),
                        )
                        for m in metrics
                    ]
                )
            ).alias("kv")
        ).select("kv.metric", "kv.value")

    # same-table counts share ONE pass as conditional aggregates (r14:
    # each metric previously ran its own full-table aggregate — the
    # report scanned orders 5× and lineitem 3×; guide §1.2 fewer
    # passes). The key-cardinality and referential checks keep their
    # own shapes: a groupBy and two anti-joins are not expressible as
    # row-local conditions.
    ord_stats = tagged(
        orders.agg(
            F.count(F.lit(1)).alias("orders_rows"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias(
                "orders_null_custkey"
            ),
        ),
        ["orders_rows", "orders_null_custkey"],
    )
    li_stats = tagged(
        li.agg(
            F.count(F.lit(1)).alias("lineitem_rows"),
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            ).alias("lineitem_bad_discount"),
        ),
        ["lineitem_rows", "lineitem_bad_discount"],
    )
    checks = [
        ord_stats,
        one(
            "orders_dup_keys",
            orders.groupBy("o_orderkey")
            .count()
            .filter(F.col("count") > 1)
            .agg(F.count(F.lit(1)).alias("value")),
        ),
        one(
            "orders_orphan_custkey",
            orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti").agg(
                F.count(F.lit(1)).alias("value")
            ),
        ),
        li_stats,
        one(
            "lineitem_orphan_orderkey",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").agg(
                F.count(F.lit(1)).alias("value")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@query(
    "embedding_label_centroids",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT label, CAST(b AS INTEGER) AS dim, v[CAST(b AS INTEGER)] AS x
             FROM e, range(1, 65) t(b))
    SELECT label, dim, ROUND(AVG(x), 6) AS centroid
    FROM dims GROUP BY 1, 2
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension) — the
    training step of IVF-style ANN. posexplode keeps it JVM-side; the
    shuffle carries (label, dim) partial sums only."""
    from tiki_data_pipeline_spark.operators.similarity import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
        )
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("centroid"))
    )


@query(
    "median_order_value",
    oracle=f"""
    SELECT o_orderpriority,
           quantile_cont({X.o_cents('o_totalprice')}, 0.5) / 100.0 AS median_value,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated) per priority — computed over
    integer cents so even-count midpoints are exact halves in both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderpriority", X.cents(F.col("o_totalprice")).alias("_c"))
        .groupBy("o_orderpriority")
        .agg(
            (F.expr("percentile(_c, 0.5)") / 100.0).alias("median_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "corpus_quality_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, n_chars, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    stats AS (
      SELECT doc_id, lang, n_chars,
             CAST(LEN(toks) AS INTEGER) AS n_tokens,
             CAST(LEN(list_filter(toks,
               t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t)))
               AS INTEGER) AS n_stopwords
      FROM toks
    )
    SELECT doc_id, lang, n_tokens
    FROM stats
    WHERE n_tokens >= 20 AND n_stopwords >= 2 AND n_chars >= 100
    """,
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM pre-training corpus filter: keep documents with ≥20 tokens,
    ≥2 stopword hits, ≥100 chars — the composed text-stats pipeline
    as a single pushdown-friendly filter."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.withColumn("n_tokens", TS.token_count(t))
        .withColumn("n_stopwords", TS.stopword_count(t))
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_stopwords") >= 2)
            & (F.col("n_chars") >= 100)
        )
        .select("doc_id", "lang", "n_tokens")
    )
