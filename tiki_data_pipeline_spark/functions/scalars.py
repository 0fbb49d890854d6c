"""Scalar column functions F1-F21 (SURVEY.md §2.8).

Each function returns a Column expression — no Python UDFs — so the
whole transform stays inside whole-stage codegen. Every function
documents the reference behavior it reproduces (file:line into
/root/reference).

ANSI note: Spark 4 runs with ANSI SQL on, so all dirty-input casts
use try_cast/try_to_timestamp (parse failure → NULL, like the
reference's lenient ``_parse_int``/``_parse_float``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Junk seller-name SUBSTRING patterns (reference INVALID_SELLER_PATTERNS,
# src/pipelines/crawl/config.py:88-102; applied with CONTAINS semantics
# per transformer.py:526-530). The reference list's final entry
# "Đã mua hàng" is dead code there (compared non-lowercased against a
# lowercased string) and is subsumed by "đã mua", so it is omitted.
SELLER_JUNK_PATTERNS = [
    "đã mua",
    "đã bán",
    "sold",
    "bought",
    "xem thêm",
    "more info",
    "chi tiết",
    "loading",
    "đang tải",
]


def parse_price(col: Column) -> Column:
    """F1 — lenient price parse: strip every non-digit, cast to long
    ('389.000₫' → 389000). Exact port of reference utils.py:417-434
    (re.sub(r'[^\\d]')) — including its quirk that a range string
    '389.000 - 459.000' concatenates to one number; prices are never
    negative so no sign survives."""
    cleaned = F.nullif(F.regexp_replace(col, r"[^0-9]", ""), F.lit(""))
    return cleaned.try_cast("bigint")


def parse_sales_count(col: Column) -> Column:
    """F2 — mixed sales count: int, '2k'→2000, '1.5k'→1500, '3m'→3e6,
    'đã bán 1.2k'→1200. Reference utils.py:365-411."""
    s = F.lower(F.trim(col))
    num_str = F.nullif(
        F.regexp_replace(F.regexp_extract(s, r"([0-9]+(?:[.,][0-9]+)?)\s*([km]?)", 1), ",", "."),
        F.lit(""),
    )
    suffix = F.regexp_extract(s, r"([0-9]+(?:[.,][0-9]+)?)\s*([km]?)", 2)
    mult = (
        F.when(suffix == "k", F.lit(1000.0))
        .when(suffix == "m", F.lit(1000000.0))
        .otherwise(F.lit(1.0))
    )
    # Round before the integer cast: Spark cast(double→long) truncates
    # ('1.2k' → 1199.999… → 1199) while the reference and DuckDB round.
    return F.round(num_str.try_cast("double") * mult, 0).try_cast("bigint")


def parse_datetime(col: Column) -> Column:
    """F4 — multi-format timestamp parse (space and 'T' separators).
    Reference transformer.py:576-598."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        # fractional-second variants (reference formats list includes
        # %f twice); .SSSSSS parses 1-6 fraction digits
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
    )


def extract_product_id_from_url(col: Column) -> Column:
    """F5 — regex ``[\\/-]p[/-]?(\\d+)``. Reference utils.py:554-567."""
    return F.nullif(F.regexp_extract(col, r"[/-]p[/-]?([0-9]+)", 1), F.lit(""))


def extract_category_id_from_url(col: Column) -> Column:
    """F6 — ``/c(\\d+)`` → ``c{id}``. Reference utils.py:570-585."""
    digits = F.nullif(F.regexp_extract(col, r"/c([0-9]+)", 1), F.lit(""))
    return F.when(digits.isNotNull(), F.concat(F.lit("c"), digits))


def normalize_category_id(id_col: Column, url_col: Column) -> Column:
    """F7 — any format → ``c{digits}``, falling back to the URL.
    Reference postgres_storage.py:23-54."""
    from_id = F.nullif(F.regexp_extract(id_col, r"^c?([0-9]+)$", 1), F.lit(""))
    return F.when(from_id.isNotNull(), F.concat(F.lit("c"), from_id)).otherwise(
        extract_category_id_from_url(url_col)
    )


def normalize_text(col: Column) -> Column:
    """F11 — collapse internal whitespace + trim.
    Reference transformer.py:453-461."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def strip_brand_prefix(col: Column) -> Column:
    """F12 — remove the 'Thương hiệu: ' prefix; empty → NULL.
    Reference transformer.py:234-241."""
    return F.nullif(F.trim(F.regexp_replace(col, r"^Thương hiệu:\s*", "")), F.lit(""))


def clean_seller_name(col: Column) -> Column:
    """F13 — seller-name validity (reference ``_validate_seller_name``,
    transformer.py:474-544 + config.py:88-116): length 2..100, not
    digits-only, no junk UI SUBSTRING (contains, not equality), not
    special-characters-only, not digits-then-text ("1234 đã mua");
    invalid → NULL.

    ``\\p{L}\\p{N}_`` stands in for Python's unicode ``\\w`` so the
    special-chars-only rule doesn't nuke Vietnamese names under Java's
    ASCII-only ``\\w``."""
    t = normalize_text(col)
    low = F.lower(t)
    has_junk = F.lit(False)
    for p in SELLER_JUNK_PATTERNS:
        has_junk = has_junk | low.contains(p)
    is_junk = (
        t.isNull()
        | (F.length(t) < 2)
        | (F.length(t) > 100)
        | has_junk
        | t.rlike(r"^[0-9]+$")
        | t.rlike(r"^[^\p{L}\p{N}_]+$")
        | t.rlike(r"^[0-9]+\s")
    )
    return F.when(~is_junk, t)


def slug_to_name(col: Column) -> Column:
    """F17 — 'tai-nghe-bluetooth' → 'Tai Nghe Bluetooth'.
    Reference crawl_categories_optimized.py:361-365."""
    return F.initcap(F.regexp_replace(col, "-", " "))


def recompute_discount(price: Column, original: Column, existing: Column) -> Column:
    """F20/P3 — ``round((orig-cur)/orig*100, 2)`` only when both present
    (and, matching the reference's Python truthiness, NONZERO — a
    zero/free price keeps the stored discount) and orig > 0, else keep
    the existing value. Reference transformer.py:264-274."""
    return F.when(
        price.isNotNull() & (price != 0)
        & original.isNotNull() & (original > 0),
        F.round((original - price) / original * 100, 2),
    ).otherwise(existing)


def coalesce_nullif(new: Column, old: Column) -> Column:
    """F21 — ``COALESCE(NULLIF(new, ''), old)``: empty-string-aware
    preserve-on-upsert. Reference postgres_storage.py:992-1008."""
    return F.coalesce(F.nullif(new, F.lit("")), old)
