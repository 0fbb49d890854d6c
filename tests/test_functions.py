"""Unit tests for the scalar function library against the reference's
documented cases (reference tests/test_utils.py:28-142,
tests/test_cache_hit_rate_fix.py:42-79, FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiki_data_pipeline_spark.functions import scalars as S
from tiki_data_pipeline_spark.functions.text import clean_name, short_name, shorten_name_ai
from tiki_data_pipeline_spark.functions.urls import cache_key, canonicalize_url


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_parse_price_cases(spark):
    cases = {
        "389.000₫": 389000,
        "1.250.000₫": 1250000,
        "150000": 150000,
        # reference strips ALL non-digits (utils.py re.sub [^\d]):
        # dashes vanish, so signs don't survive and a range string
        # concatenates — quirk preserved for parity
        "-5000": 5000,
        "389.000₫ - 459.000₫": 389000459000,
        "0₫": 0,
        "": None,
    }
    for raw, want in cases.items():
        assert _one(spark, S.parse_price(F.lit(raw))) == want, raw


def test_parse_sales_count_cases(spark):
    cases = {
        "2k": 2000,
        "1.5k": 1500,
        "đã bán 1.2k": 1200,
        "3m": 3000000,
        "500": 500,
        "1,5k": 1500,
        "no digits": None,
    }
    for raw, want in cases.items():
        assert _one(spark, S.parse_sales_count(F.lit(raw))) == want, raw


def test_extract_ids(spark):
    assert _one(
        spark, S.extract_product_id_from_url(F.lit("https://tiki.vn/tai-nghe-p123456"))
    ) == "123456"
    assert _one(
        spark, S.extract_product_id_from_url(F.lit("https://tiki.vn/p/777"))
    ) == "777"
    assert _one(
        spark,
        S.normalize_category_id(F.lit("4160"), F.lit(None).cast("string")),
    ) == "c4160"
    assert _one(
        spark,
        S.normalize_category_id(F.lit("junk"), F.lit("https://tiki.vn/sach/c999")),
    ) == "c999"


def test_clean_seller_and_brand(spark):
    assert _one(spark, S.clean_seller_name(F.lit("123"))) is None
    assert _one(spark, S.clean_seller_name(F.lit("x"))) is None
    assert _one(spark, S.clean_seller_name(F.lit("Xem Thêm"))) is None
    # CONTAINS semantics (reference transformer.py:526-530), not equality
    assert _one(spark, S.clean_seller_name(F.lit("Shop ABC đã bán 500"))) is None
    assert _one(spark, S.clean_seller_name(F.lit("loading..."))) is None
    # digits-then-text ("1234 đã mua" shape)
    assert _one(spark, S.clean_seller_name(F.lit("1234 người mua"))) is None
    # special-characters-only
    assert _one(spark, S.clean_seller_name(F.lit("***"))) is None
    # Vietnamese-only names survive the special-chars rule (unicode \\w)
    assert _one(spark, S.clean_seller_name(F.lit("Đồ Gỗ Đẹp"))) == "Đồ Gỗ Đẹp"
    assert _one(spark, S.clean_seller_name(F.lit("  Shop   ABC "))) == "Shop ABC"
    assert _one(spark, S.strip_brand_prefix(F.lit("Thương hiệu: Sony"))) == "Sony"
    assert _one(spark, S.strip_brand_prefix(F.lit(""))) is None


def test_slug_to_name(spark):
    assert _one(spark, S.slug_to_name(F.lit("tai-nghe-bluetooth"))) == "Tai Nghe Bluetooth"


def test_canonicalize_url_reference_cases():
    # tracking params dropped, params sorted, https forced, host lowered,
    # trailing slash stripped (reference test_cache_hit_rate_fix.py:42-79)
    assert (
        canonicalize_url("http://TIKI.VN/dien-tu/c1000?utm_source=x&b=2&a=1&ref=y")
        == "https://tiki.vn/dien-tu/c1000?a=1&b=2"
    )
    assert canonicalize_url("https://tiki.vn/path/") == "https://tiki.vn/path"
    assert canonicalize_url("//tiki.vn/x?spm=z") == "https://tiki.vn/x"
    assert canonicalize_url("https://tiki.vn/x?empty=&keep=1") == "https://tiki.vn/x?keep=1"
    assert canonicalize_url(None) is None
    # determinism: same params in any order → same key
    a = canonicalize_url("https://tiki.vn/x?b=2&a=1")
    b = canonicalize_url("https://tiki.vn/x?a=1&b=2")
    assert a == b


def test_cache_key_is_md5_of_canonical_url(spark):
    """F10 — the cache key must be param-order-insensitive because it
    hashes the CANONICAL url (reference redis_cache.py:187-203; the
    cache-hit-rate fix depended on exactly this)."""
    import hashlib

    df = spark.createDataFrame(
        [("https://tiki.vn/x?b=2&a=1",), ("https://tiki.vn/x?a=1&b=2",)],
        schema="url string",
    )
    keys = [r.k for r in df.select(cache_key(F.col("url")).alias("k")).collect()]
    want = "detail:" + hashlib.md5(b"https://tiki.vn/x?a=1&b=2").hexdigest()
    assert keys == [want, want]


def test_clean_name_heuristics():
    # goldens verified bit-identical against the reference's
    # _clean_name_heuristics (transformer.py:600-753) run standalone
    assert (
        clean_name("#hot Tai nghe Bluetooth ABC-1234 Chính Hãng 2024")
        == "Tai nghe bluetooth"  # sentence case: reference lowercases the rest
    )
    assert clean_name("Nồi chiên không dầu 20x30cm sale") == "Nồi chiên không dầu sale"
    assert clean_name("   ") is None
    assert clean_name("áo thun nam")[0] == "Á"
    # full-vocabulary fluff stripping + SKU/spec/year patterns
    assert (
        clean_name("[HOT] Áo khoác jean nam CV0016 sang chảnh trẻ trung #jean")
        == "] áo khoác jean nam"  # reference's bracket-strip quirk preserved
    )
    assert (
        clean_name("Kệ gỗ để bàn W76xD30.5xH11.5Cm lắp ráp tiện lợi MS 123")
        == "Kệ gỗ để bàn lắp ráp"
    )
    assert (
        clean_name("iPhone 15 Pro Max 256GB VN/A mới nhất fullbox nguyên seal")
        == "Iphone 15 pro max 256gb vn/a"
    )
    # alternation order: "chất lượng" strips before "chất lượng cao"
    assert clean_name("Vải đẹp chất lượng cao thật") == "Vải đẹp cao thật"


def test_short_name():
    s = short_name("Tai nghe Bluetooth XYZ - Hàng chất lượng dành cho game thủ")
    assert s == "Tai nghe bluetooth xyz"
    long = short_name(
        "Bộ nồi inox cao cấp ba đáy dùng cho mọi loại bếp từ bếp ga bếp hồng ngoại siêu bền"
    )
    assert long == "Bộ nồi inox ba đáy"
    # acceptance gate fails (1 word) → falls back to heuristic result
    assert short_name("Áo thun") == "Áo thun"
    # >80 chars with no word boundary → hard ellipsis cut at 77
    # (sentence case capitalizes the first char first)
    raw = "x" * 100
    assert short_name(raw) == "X" + "x" * 76 + "..."


def test_shorten_name_ai_interface():
    assert shorten_name_ai("Ngắn gọn") == "Ngắn gọn"  # <15 chars passthrough
    import pytest

    with pytest.raises(NotImplementedError):
        shorten_name_ai("x" * 50, use_ai=True)


def test_udf_wrappers(spark):
    from tiki_data_pipeline_spark.functions.text import clean_name_udf, short_name_udf
    from tiki_data_pipeline_spark.functions.urls import canonicalize_url_udf

    df = spark.createDataFrame(
        [("https://TIKI.vn/a?utm_x=1&b=2", "#sale Tai nghe XYZ 2024")],
        schema="url string, name string",
    )
    row = df.select(
        canonicalize_url_udf(F.col("url")).alias("u"),
        clean_name_udf(F.col("name")).alias("c"),
        short_name_udf(F.col("name")).alias("s"),
    ).collect()[0]
    assert row["u"] == "https://tiki.vn/a?b=2"
    assert row["c"] == "Tai nghe xyz"
    assert row["s"] == "Tai nghe xyz"
