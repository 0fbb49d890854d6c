"""End-to-end pipeline run on the reference-shaped fixtures:
ingest → transform → quality → upsert → CDC → categories → report,
twice (idempotent re-run exercises the upsert path on an existing
table)."""

from __future__ import annotations

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.pipeline import Pipeline


def test_pipeline_end_to_end(spark, tmp_path):
    pipe = Pipeline(spark, str(tmp_path / "warehouse"))
    raw = FX.raw_products_df(spark)
    cats = FX.categories_df(spark)

    report = pipe.run(raw, cats)
    assert report["stats"]["total_products"] == 8  # valid+deduped fixture rows
    assert report["stats"]["min_price"] > 0
    assert report["n_categories"] == 17
    assert report["quarantined"] >= 1  # rows with missing critical fields
    assert any(name == "Shop Chính Hãng" for name, _ in report["top_sellers"])

    products = spark.read.parquet(str(tmp_path / "warehouse" / "products"))
    row = {r["product_id"]: r for r in products.collect()}
    assert row["100001"]["brand"] == "Sony"  # prefix stripped
    assert row["100001"]["sales_count"] == 2000  # "2k" parsed

    # second run: same input upserts into the existing table (M2),
    # preserving non-null values and not duplicating keys
    report2 = pipe.run(raw, cats)
    assert report2["stats"]["total_products"] == 8
    products2 = spark.read.parquet(str(tmp_path / "warehouse" / "products"))
    assert products2.select("product_id").distinct().count() == 8
