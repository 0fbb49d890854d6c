"""End-to-end pipeline (SURVEY.md §3.1 — the reference's main DAG
``tiki_crawl_products_v2`` re-expressed as one Spark driver program).

Airflow stages become DataFrame transformations; XCom/JSON hand-offs
become parquet checkpoints in the warehouse directory; Dynamic Task
Mapping becomes partition parallelism. Stage boundaries are kept as
real parquet writes (not just lazy plans) because that is the
reference's semantic: each stage is restartable from the previous
artifact.

Stages (reference main_dag.py:39-324):
1. ingest        — raw nested records → warehouse/raw (S5/S7)
2. transform     — flatten/normalize/validate/dedup → products (P1-P3, D2)
3. quality       — score + route: accepted / quarantine (P11-P13, M5, T5)
4. load          — upsert into the products table (M2/F21)
5. history       — CDC append of change rows (W8/M8)
6. categories    — path closure + level pivot + leaf flags +
                   product-count refresh (G1/G5/J6/M4)
7. report        — aggregate stats + top-k (A1/A2/W1, the
                   aggregate_and_notify payload)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import transform as TR
from tiki_data_pipeline_spark.operators import hierarchy as H
from tiki_data_pipeline_spark.operators import history as HI
from tiki_data_pipeline_spark.operators import merge as ME


class Pipeline:
    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _write(self, df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(self._path(name))
        return self.spark.read.parquet(self._path(name))

    def run(self, raw_products: DataFrame, categories: DataFrame) -> dict:
        """Run all stages; returns the report dict (the reference's
        notify payload)."""
        raw = self._write(raw_products, "raw_products")

        transformed = self._write(TR.transform_products(raw), "products_transformed")

        scored = TR.with_quality_score(
            TR.normalize_products(TR.flatten_raw_products(raw))
        )
        self._write(scored.filter(F.col("action") == "skip"), "quarantine")

        # upsert into the (possibly pre-existing) products table
        table_path = self._path("products")
        if os.path.isdir(table_path):
            current = self.spark.read.parquet(table_path)
            merged = ME.upsert_preserve_nonnull(
                current.drop("is_new") if "is_new" in current.columns else current,
                transformed,
                "product_id",
                string_cols=["name", "seller_name", "brand"],
            )
        else:
            merged = transformed.withColumn("is_new", F.lit(True))
        # write-read through a temp name: overwriting the parquet dir
        # we are lazily reading from would race the scan
        merged.write.mode("overwrite").parquet(table_path + ".staging")
        staged = self.spark.read.parquet(table_path + ".staging")
        staged.write.mode("overwrite").parquet(table_path)
        products = self.spark.read.parquet(table_path)

        history_rows = transformed.select(
            F.monotonically_increasing_id().alias("history_id"),
            "product_id",
            F.col("price").cast("double").alias("price"),
            F.col("original_price").cast("double").alias("original_price"),
            F.col("discount_percent").cast("int").alias("discount_percent"),
            F.col("sales_count").cast("int").alias("sales_count"),
            "crawled_at",
        )
        self._write(HI.cdc_append_rows(history_rows), "crawl_history_append")

        paths = H.with_level_pivot(H.ancestor_paths(categories))
        cats = H.with_leaf_flag(categories).join(
            # the source table carries its own (claimed) `level`; the
            # computed depth joins in under a distinct name
            paths.select(
                "url",
                "path",
                F.col("level").alias("computed_level"),
                "root_category_name",
            ),
            "url",
        )
        counts = (
            products.groupBy("category_url")
            .agg(F.countDistinct("product_id").alias("product_count_new"))
        )
        cats = (
            cats.join(counts, cats.url == counts.category_url, "left")
            .withColumn(
                "product_count", F.coalesce(F.col("product_count_new"), F.lit(0))
            )
            .drop("category_url", "product_count_new")
        )
        categories_out = self._write(cats, "categories_enriched")

        report_stats = products.agg(
            F.count(F.lit(1)).alias("total_products"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
            F.round(F.avg("price"), 2).alias("avg_price"),
            F.round(F.avg("rating_average"), 2).alias("avg_rating"),
        ).collect()[0]
        top_sellers = (
            products.filter(F.col("seller_name").isNotNull())
            .groupBy("seller_name")
            .count()
            .orderBy(F.col("count").desc(), "seller_name")
            .limit(10)
            .collect()
        )
        return {
            "stats": report_stats.asDict(),
            "top_sellers": [(r["seller_name"], r["count"]) for r in top_sellers],
            "n_categories": categories_out.count(),
            "quarantined": self.spark.read.parquet(self._path("quarantine")).count(),
        }
