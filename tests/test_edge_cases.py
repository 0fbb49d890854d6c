"""Empty-input robustness: every operator family must return an
empty (but correctly-schemed) result on empty input, not throw —
at scale, empty partitions and empty incremental batches are the
common case, not the exception."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark import transform as TR
from tiki_data_pipeline_spark.operators import dedup as DD
from tiki_data_pipeline_spark.operators import hierarchy as H
from tiki_data_pipeline_spark.operators import history as HI
from tiki_data_pipeline_spark.operators import merge as ME
from tiki_data_pipeline_spark.operators.graph import connected_components, dedup_survivors


def _empty_like(spark, df):
    return spark.createDataFrame([], df.schema)


def test_transform_empty(spark):
    raw = _empty_like(spark, FX.raw_products_df(spark))
    out = TR.transform_products(raw)
    assert out.count() == 0
    assert "product_id" in out.columns


def test_hierarchy_empty(spark):
    cats = _empty_like(spark, FX.categories_df(spark))
    assert H.ancestor_paths(cats).count() == 0
    assert H.with_leaf_flag(cats).count() == 0
    assert H.missing_parents(cats).count() == 0


def test_dedup_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert DD.shingles(docs).count() == 0
    assert DD.exact_dedup(docs).count() == 0
    assert DD.minhash_lsh_near_dups(docs).count() == 0
    assert DD.simhash_signatures(docs).count() == 0


def test_graph_empty(spark):
    pairs = spark.createDataFrame([], "i bigint, j bigint")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    result = dedup_survivors(docs, pairs)
    assert result.filter(F.col("survivor")).count() == 2


def test_history_empty(spark):
    hist = _empty_like(spark, FX.crawl_history_df(spark))
    assert HI.latest_per_product(hist).count() == 0
    assert HI.with_change_columns(hist).count() == 0
    assert HI.cdc_append_rows(hist).count() == 0


def test_upsert_empty_sides(spark):
    cur = spark.createDataFrame(
        [("1", "a", 10)], "product_id string, name string, price bigint"
    )
    empty = _empty_like(spark, cur)
    # empty incoming: everything preserved, nothing new
    merged = ME.upsert_preserve_nonnull(cur, empty, "product_id", ["name"])
    rows = merged.collect()
    assert len(rows) == 1 and not rows[0]["is_new"]
    # empty current: everything inserted as new
    merged2 = ME.upsert_preserve_nonnull(empty, cur, "product_id", ["name"])
    rows2 = merged2.collect()
    assert len(rows2) == 1 and rows2[0]["is_new"]


def test_scd2_duplicate_incoming_keys_yield_one_current_version(spark):
    from tiki_data_pipeline_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [("1", "a", 10, "2024-01-01 00:00:00", None, True)],
        "product_id string, name string, price bigint, valid_from string,"
        " valid_to string, is_current boolean",
    ).selectExpr(
        "product_id", "name", "price",
        "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "CAST(valid_to AS TIMESTAMP) AS valid_to", "is_current",
    )
    incoming = spark.createDataFrame(
        [("1", "a", 20), ("1", "a", 30), ("2", "b", 5), ("2", "b", 5)],
        "product_id string, name string, price bigint",
    )
    out = scd2_apply(
        dim, incoming, "product_id", ["name", "price"], "2024-06-01 00:00:00"
    ).collect()
    current = [r for r in out if r["is_current"]]
    # exactly one open version per key, deterministic winner (lowest
    # tracked tuple: price 20 for key 1)
    assert sorted((r["product_id"], r["price"]) for r in current) == [
        ("1", 20), ("2", 5),
    ]
    closed = [r for r in out if not r["is_current"]]
    assert len(closed) == 1 and closed[0]["price"] == 10


def test_bfs_descendants_empty_roots_and_no_children(spark):
    cats = FX.categories_df(spark)
    # no roots at all -> empty result with the right schema
    out = H.bfs_descendants(cats, [], max_level=3)
    assert out.count() == 0
    assert set(out.columns) == {"url", "name", "level"}
    # a leaf as the root -> just the root at level 0
    leaf = [r["url"] for r in H.with_leaf_flag(cats).filter("is_leaf").limit(1).collect()]
    only = H.bfs_descendants(cats, leaf, max_level=3).collect()
    assert len(only) == 1 and only[0]["level"] == 0


def test_bfs_eager_lazy_identity(spark):
    """The lazy (join-chain + min-level groupBy) and eager (visited-set
    anti-join loop) strategies must produce the identical node set and
    first-discovery levels — including through the cyclic fixture edge."""
    cats = FX.categories_df(spark)
    lazy = {
        (r["url"], r["level"])
        for r in H.bfs_descendants(cats, None, max_level=3, eager=False).collect()
    }
    eager = {
        (r["url"], r["level"])
        for r in H.bfs_descendants(cats, None, max_level=3, eager=True).collect()
    }
    assert lazy == eager and lazy


def test_simhash_near_dups_empty(spark):
    docs = _empty_like(
        spark, spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    assert DD.simhash_near_dups(docs).count() == 0


def test_rolling_fingerprint_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "one two")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in DD.rolling_fingerprint(docs).collect()}
    # <3 tokens -> no shingles -> NULL sketch; content_fp still defined
    assert rows[2]["sketch"] is None
    assert rows[1]["content_fp"] is not None
    empty = _empty_like(spark, docs)
    assert DD.rolling_fingerprint(empty).count() == 0


def test_merge_into_sql_rendering():
    """The lakehouse swap-in point renders executable MERGE INTO for
    each upsert mode, matching the join-rewrite semantics 1:1."""
    from tiki_data_pipeline_spark.operators.merge import merge_into_sql

    ow = merge_into_sql("products", "staged", "product_id", ["product_id", "name", "price"])
    assert (
        "WHEN MATCHED THEN UPDATE SET t.`name` = s.`name`, t.`price` = s.`price`"
        in ow
    )
    assert "WHEN NOT MATCHED THEN INSERT (`product_id`, `name`, `price`)" in ow

    pn = merge_into_sql(
        "products", "staged", "product_id",
        ["product_id", "name", "price"], mode="preserve_nonnull",
        string_cols=["name"],
    )
    assert "t.`name` = COALESCE(NULLIF(s.`name`, ''), t.`name`)" in pn
    assert "t.`price` = COALESCE(s.`price`, t.`price`)" in pn

    ia = merge_into_sql(
        "products", "staged", "product_id", ["product_id", "name"],
        mode="insert_if_absent",
    )
    assert "WHEN MATCHED" not in ia
    assert "WHEN NOT MATCHED THEN INSERT" in ia

    # db-qualified targets quote each dotted part; hostile identifiers
    # (backticks) are rejected instead of escaped
    qualified = merge_into_sql("lake.products", "staged", "k", ["k", "v"])
    assert "MERGE INTO `lake`.`products` t" in qualified

    import pytest
    with pytest.raises(ValueError):
        merge_into_sql("t", "s", "k", ["k"], mode="bogus")
    with pytest.raises(ValueError, match="backtick"):
        merge_into_sql("t`; DROP TABLE x; --", "s", "k", ["k"])
    with pytest.raises(ValueError, match="backtick"):
        merge_into_sql("t", "s", "k", ["k", "evil`col"])


def test_jvm_values_df_preserves_backslashes_and_quotes(spark):
    """Spark SQL literals process backslash escapes; the VALUES
    builder must escape them so fixture strings round-trip verbatim
    (a JSON fixture with embedded quotes serializes to backslashes)."""
    from tiki_data_pipeline_spark.fixtures import jvm_values_df

    rows = [
        (1, r'back\slash "quote" \n \t \\double'),
        (2, "it's quoted"),
        (3, "unicode ₫ Đẹp 中文"),
        (4, None),
    ]
    df = jvm_values_df(spark, [("i", "INT"), ("s", "STRING")], rows)
    got = {r["i"]: r["s"] for r in df.collect()}
    assert got == dict(rows)


def test_upsert_duplicate_incoming_keys_no_fanout(spark):
    """A duplicate key in incoming must not multiply output rows
    quadratically through the presence join (review r5 finding)."""
    from tiki_data_pipeline_spark.operators.merge import (
        upsert_overwrite,
        upsert_preserve_nonnull,
    )

    cur = spark.createDataFrame([(1, "a")], "k int, v string")
    inc = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    # full-outer fan-out on the key itself is inherent (2 incoming
    # rows for one current row -> 2 joined rows), but the old extra
    # presence join SQUARED it to 4
    assert upsert_overwrite(cur, inc, "k").count() == 2
    assert upsert_preserve_nonnull(cur, inc, "k", ["v"]).count() == 2


def test_scd2_null_valid_from_row_not_destroyed(spark):
    """An existing current row with NULL valid_from must be treated as
    EXISTING (closed + new version on change), not as a brand-new key
    whose old values vanish (review r5 finding)."""
    from tiki_data_pipeline_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [("K", "old-name", None, None, True)],
        "key string, name string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    inc = spark.createDataFrame([("K", "new-name")], "key string, name string")
    out = scd2_apply(dim, inc, "key", ["name"], "2025-01-20 00:00:00")
    rows = {(r["name"], r["is_current"]) for r in out.collect()}
    assert ("old-name", False) in rows, rows  # closed, not destroyed
    assert ("new-name", True) in rows, rows


def test_ann_zero_norm_vector_never_ranks(spark):
    """A zero vector has no defined cosine; it must not surface as a
    NaN-scored rank-1 neighbor (review r5 finding)."""
    from tiki_data_pipeline_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = SIM.brute_force_topk(emb, [0], k=3).collect()
    assert all(r["neighbor_id"] != 2 for r in got), got
    assert all(r["cosine_sim"] == r["cosine_sim"] for r in got)  # no NaN


def test_history_null_price_change_classification(spark):
    """NULL-price transitions follow the reference's null-safe compare:
    value->NULL and NULL->value are price_change; only the first ROW
    is first_seen (review r5 finding)."""
    from tiki_data_pipeline_spark.operators.history import with_change_columns

    hist = spark.createDataFrame(
        [
            (1, "P", None, None, None, 5, "2025-01-01 00:00:00"),
            (2, "P", 100.0, 100.0, 0, 5, "2025-01-02 00:00:00"),
            (3, "P", None, None, None, 5, "2025-01-03 00:00:00"),
            (4, "P", None, None, None, 5, "2025-01-04 00:00:00"),
        ],
        "history_id long, product_id string, price double,"
        " original_price double, discount_percent int, sales_count long,"
        " crawled_at string",
    ).withColumn("crawled_at", F.to_timestamp("crawled_at"))
    got = {
        r["history_id"]: r["crawl_type"]
        for r in with_change_columns(hist).collect()
    }
    assert got == {
        1: "first_seen",     # first ROW, even with NULL price
        2: "price_change",   # NULL -> 100
        3: "price_change",   # 100 -> NULL
        4: "no_change",      # NULL -> NULL, sales equal
    }, got


def test_corpus_dedup_pipeline_null_text_survives(spark, tmp_path):
    """md5(NULL) is NULL: the oracle's fingerprint self-join uses
    equality (NULL never matches → every NULL-text doc survives), but
    a window PARTITION BY fingerprint groups all NULLs together — the
    r14 rewrite must filter NULL fingerprints before the window or
    NULL-text docs beyond the first would be dropped as exact dups
    (latent at sf0.1, which has zero NULL texts)."""
    from tiki_data_pipeline_spark.plans.llm_queries import (
        corpus_dedup_pipeline,
    )

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en"),
            (2, "alpha beta gamma delta", "en"),  # exact dup of 1
            (3, None, "en"),  # NULL text — must survive
            (4, None, "vi"),  # second NULL text — must ALSO survive
            (5, "totally different words here", "en"),
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["survivor"]
        for r in corpus_dedup_pipeline(spark, sf_dir).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}
