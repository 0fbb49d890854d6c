"""S3 recursive JSON product search — traversal-priority and
field-extraction semantics vs reference crawl_products.py:424-560."""

from __future__ import annotations

from tiki_data_pipeline_spark import fixtures as FX
from tiki_data_pipeline_spark.operators.json_search import (
    extract_products,
    find_product_list,
    search_products,
)


def test_products_key_wins_over_everything():
    obj = {
        "items": [{"id": 1}],
        "products": [{"id": 2, "name": "x"}],
        "data": {"products": [{"id": 3, "name": "y"}]},
    }
    assert find_product_list(obj) == [{"id": 2, "name": "x"}]


def test_items_heuristic_requires_product_like_first_element():
    assert find_product_list({"items": [{"foo": 1}]}) is None
    assert find_product_list({"items": [{"price": 9}]}) == [{"price": 9}]
    assert find_product_list({"items": []}) is None
    assert find_product_list({"items": "not-a-list"}) is None


def test_descend_priority_data_props_pageprops_initialstate():
    obj = {
        "initialState": {"products": [{"id": "late", "name": "n"}]},
        "data": {"products": [{"id": "early", "name": "n"}]},
    }
    # dict insertion order puts initialState first, but the reference
    # probes data → props → pageProps → initialState by key name
    assert find_product_list(obj)[0]["id"] == "early"


def test_list_in_list_traversal():
    obj = {"foo": [[{"id": 5, "name": "n"}]]}
    assert find_product_list(obj)[0]["id"] == 5


def test_extraction_field_fallbacks_and_skips():
    payload = FX.NEXTDATA_ROWS[0][1]  # E1
    recs = extract_products(payload)
    assert [r["product_id"] for r in recs] == ["1", "2"]  # 2 of 4 survive
    assert recs[0]["image_url"] == "http://img.tiki.vn/1.jpg"
    assert recs[1]["url"] == "https://tiki.vn/p/2"  # fallback URL
    assert recs[1]["image_url"] == ""  # images key absent → not a list


def test_image_url_quirk_images_not_a_list():
    recs = extract_products(FX.NEXTDATA_ROWS[5][1])  # E6
    assert recs[0]["image_url"] == ""  # image_url key present but ignored


def test_no_products_anywhere():
    assert extract_products(FX.NEXTDATA_ROWS[6][1]) == []
    assert extract_products("not json at all") == []


def test_search_products_dataframe(spark):
    out = search_products(FX.nextdata_df(spark)).collect()
    by_env: dict[int, list] = {}
    for r in out:
        by_env.setdefault(r["envelope_id"], []).append(r)
    assert sorted(by_env) == [1, 2, 3, 4, 5, 6]
    assert by_env[5][0]["product_id"] == "10"  # props beat initialState
    assert by_env[4][0]["name"] == "Tủ lạnh"


def test_pathologically_deep_payload_yields_no_products():
    # deep nesting overflows Python recursion in the descent; the
    # operator must yield no products, never a crashed task
    payload = '{"data":' * 10000 + "{}" + "}" * 10000
    assert extract_products(payload) == []
