"""G3/G4: tree flatten ↔ build round-trip, and exactmath properties."""

from __future__ import annotations

import json
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.operators import hierarchy as H

TREE = [
    {
        "name": "Điện Tử",
        "url": "https://t/c1",
        "children": [
            {
                "name": "Âm Thanh",
                "url": "https://t/c11",
                "children": [
                    {"name": "Tai Nghe", "url": "https://t/c111"},
                    {"name": "Loa", "url": "https://t/c112"},
                ],
            },
            {"name": "Phụ Kiện", "url": "https://t/c12"},
        ],
    },
    {"name": "Sách", "url": "https://t/c2"},
]


def test_flatten_tree(spark):
    flat = H.flatten_tree(spark, json.dumps(TREE))
    rows = {r["url"]: (r["name"], r["parent_url"], r["level"]) for r in flat.collect()}
    assert rows["https://t/c1"] == ("Điện Tử", None, 0)
    assert rows["https://t/c11"] == ("Âm Thanh", "https://t/c1", 1)
    assert rows["https://t/c111"] == ("Tai Nghe", "https://t/c11", 2)
    assert rows["https://t/c12"] == ("Phụ Kiện", "https://t/c1", 1)
    assert rows["https://t/c2"] == ("Sách", None, 0)
    assert len(rows) == 6


def test_tree_roundtrip(spark):
    flat = H.flatten_tree(spark, json.dumps(TREE))
    rebuilt = H.build_tree(flat)
    # build_tree sorts children by name; normalize the input the same way
    def norm(nodes):
        out = []
        for n in sorted(nodes, key=lambda x: x["name"]):
            m = {"name": n["name"], "url": n["url"]}
            if n.get("children"):
                m["children"] = norm(n["children"])
            out.append(m)
        return out

    assert rebuilt == norm(TREE)


def test_build_tree_from_fixture(spark):
    cats = FX.categories_df(spark)
    tree = H.build_tree(cats)
    names = {n["name"] for n in tree}
    # roots = parent_url IS NULL rows (incl. the duplicate-id pair)
    assert "Điện Tử" in names and "Thời Trang" in names and "Nhà Cửa" in names
    dien_tu = next(n for n in tree if n["name"] == "Điện Tử")
    assert dien_tu["children"][0]["name"] == "Âm Thanh"


# ---------------------------------------------------------------- exactmath

@settings(max_examples=300)
@given(
    num=st.integers(min_value=0, max_value=10**15),
    den=st.integers(min_value=1, max_value=10**9),
)
def test_div_round_matches_decimal_half_up(num, den):
    """(2·num + den) div (2·den) == Decimal ROUND_HALF_UP of num/den."""
    got = (2 * num + den) // (2 * den)
    want = int(
        (Decimal(num) / Decimal(den)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    assert got == want


def test_cents_roundtrip_through_double(spark):
    """cents(x·0.01 as double) recovers the integer exactly (the
    assumption the whole exactmath layer rests on) — one Spark job
    over edge cases + a deterministic pseudo-random sweep."""
    import random

    from tiki_data_pipeline_spark.plans import exactmath as X

    rng = random.Random(42)
    values = [0, 1, 5, 99, 100, 101, 2**31, 10**13] + [
        rng.randrange(0, 10**13) for _ in range(500)
    ]
    df = spark.createDataFrame([(c, c / 100.0) for c in values], "c long, money double")
    bad = df.select("c", X.cents(F.col("money")).alias("got")).filter(
        F.col("c") != F.col("got")
    )
    assert bad.count() == 0
