"""Name-cleaning heuristics (SURVEY.md F14/F15/F16).

Verbatim ports of the reference's marketing-fluff stripper and
short-name extractor (reference src/pipelines/transform/
transformer.py:600-932): the FULL fluff vocabulary, SKU/spec regex
families, split-separator order, and stop-phrase list, in the
reference's exact application order (list order matters — regex
alternation picks the leftmost alternative, so e.g. "chất lượng"
strips before "chất lượng cao" can match, exactly as the reference
behaves). Too branchy for column expressions (SURVEY §2.11 U5), so
the pure cores are plain Python (unit-testable) wrapped in
Arrow-batched pandas UDFs.

The one deliberate deviation: where the reference returns "" for
empty results, these return None so Spark gets SQL NULL semantics.

F16 (AI name shortening, reference src/common/ai/summarizer.py:
190-264) ships as the deterministic heuristic by default; the LLM
path stays behind an interface and is OFF in tests, mirroring the
reference's ``SHORT_NAME_CONFIG["use_ai"]`` toggle
(reference src/common/config.py:52-54).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Marketing fluff and subjective adjectives — reference
# transformer.py:628-717, full list in the reference's order
# (duplicates included: alternation order is semantics).
FLUFF_KEYWORDS = [
    "sang chảnh",
    "siêu xinh",
    "trẻ trung",
    "thoáng mát",
    "cực đẹp",
    "chất lượng",
    "cao cấp",
    "gợi cảm",
    "quyến rũ",
    "sexy",
    "hot hot",
    "mẫu mới nhất",
    "new design",
    "hot trend",
    "giá rẻ",
    "siêu rẻ",
    "vải mềm",
    "co giãn",
    "thiết kế",
    "chất mềm",
    "mới nhất",
    "siêu đẹp",
    "hot",
    "giá sốc",
    "giá tốt",
    "flash sale",
    "siêu sale",
    "sale sốc",
    "khuyến mãi",
    "quà tặng",
    "combo",
    "set",
    "uy tín",
    "nhập khẩu",
    "xuất khẩu",
    "hàng hiệu",
    "bền đẹp",
    "siêu bền",
    "chống nước",
    "xịn",
    "vip",
    "luxury",
    "limited",
    "bản giới hạn",
    "đa năng",
    "tiện lợi",
    "tiện dụng",
    "thông minh",
    "tự động",
    "chính hãng",
    "hàng công ty",
    "fullbox",
    "nguyên seal",
    "giá sỉ",
    "giá tận gốc",
    "mẫu mới",
    "mẫu hot",
    "hàng nội địa",
    "nhập khẩu",
    "chất lượng cao",
    "siêu cấp",
    "siêu sạch",
    "siêu gọn",
    "nhỏ gọn",
    "cầm tay",
    "mini",
    "loại 1",
    "bản cao cấp",
    "chống trầy",
    "chống xước",
    "kháng khuẩn",
    "khử mùi",
    "tiết kiệm",
    "hiệu quả",
    "bảo hành",
    "đổi trả",
    "tặng kèm",
    "quà tặng",
    "freeship",
    "miễn phí",
    "chăm sóc",
    "vệ sinh",
    "làm sạch",
    "giúp",
    "giảm",
    "tăng",
    "hỗ trợ",
    "công nghệ",
    "phong cách",
    "thiết kế mới",
    "mẫu mã đẹp",
]

# SKU / code patterns — reference transformer.py:619-626
_SKU_PATTERNS = [
    re.compile(r"\b[A-Za-z]{2,}\d{3,}\b", re.IGNORECASE),  # CV0016, SP1234
    re.compile(r"\b[A-Za-z]+\-\d+\b", re.IGNORECASE),  # SKU-123, MS-001
    re.compile(r"\bMS\s*\d+\b", re.IGNORECASE),  # MS 123
    re.compile(r"\bMã\s*(?:số)?\s*\d+\b", re.IGNORECASE),  # Mã số 123
]

_FLUFF_RE = re.compile(
    r"\b(" + "|".join(re.escape(k) for k in FLUFF_KEYWORDS) + r")\b",
    re.IGNORECASE,
)

# Dimension / technical-spec patterns — reference transformer.py:723-731
_SPEC_PATTERNS = [
    re.compile(
        r"\b[A-Za-z]?\d+[\.,]?\d*\s*[xX]\s*[A-Za-z]?\d+[\.,]?\d*"
        r"(?:\s*[xX]\s*[A-Za-z]?\d+[\.,]?\d*)?[^ ]*\b",
        re.IGNORECASE,
    ),  # W76xD30.5xH11.5Cm
    re.compile(
        r"\b\d+[\.,]?\d*\s*(?:m|cm|mm|kg|g|l|ml|w|v|kw|ah|ma|mah)\b",
        re.IGNORECASE,
    ),  # 5m, 10kg, 100w, 2000mah
    re.compile(
        r"\b\d+\s*(?:chế độ|đầu|món|chi tiết|cái|nấc|vị|mùi|lít|hũ|gói|viên)\b",
        re.IGNORECASE,
    ),  # 5 chế độ, 4 đầu
    re.compile(r"\b\d+[-/]\d+\b"),  # 2/3, 2-1
]

_LEAD_NOISE_RE = re.compile(r"^[\[\(\-\s]+")
_TRAIL_NOISE_RE = re.compile(r"[\]\)\-\s]+$")
_HASHTAG_RE = re.compile(r"#\w+\b")
_YEAR_RE = re.compile(r"\b202\d\b")
_SYMBOL_RE = re.compile(r"[\!\*\+\=~…\.]")

# Short-name split separators, in priority order — reference
# transformer.py:771-786
_SEPARATORS = [r"\|", r"\s-\s", r"\s–\s", r"\(", r"\[", r",", r"\s\/\s"]

# Attribute stop-phrases — reference transformer.py:799-860, full list
STOP_PHRASES = [
    "chính hãng",
    "cao cấp",
    "nhập khẩu",
    "giá rẻ",
    "uy tín",
    "chất lượng",
    "bảo hành",
    "xuất xứ",
    "thương hiệu",
    "dành cho",
    "phù hợp",
    "kích thước",
    "size",
    "màu sắc",
    "màu",
    "bộ nhớ",
    "ram",
    "dung lượng",
    "phiên bản",
    "model",
    "tặng kèm",
    "miễn phí",
    "freeship",
    "fullbox",
    "nguyên seal",
    "hàng mới",
    "new",
    "hot",
    "xả kho",
    "thanh lý",
    "chăm sóc",
    "công nghệ",
    "tự động",
    "đa năng",
    "tiện lợi",
    "tiện dụng",
    "hỗ trợ",
    "giải pháp",
    "giúp",
    "hiệu quả",
    "an toàn",
    "chống",
    "tặng",
    "kèm",
    "bộ",
    "set",
    "combo",
    "mẫu mã",
    "mẫu mới",
    "thiết kế",
    "phong cách",
    "không dây",
    "không dùng",
    "dùng cho",
]

_STOP_RES = [re.compile(r"\b" + re.escape(p) + r"\b") for p in STOP_PHRASES]
_EDGE_NOISE_TRAIL_RE = re.compile(r"[\s\-\+\&\,\/\|\(\)\[\]]+$")
_EDGE_NOISE_LEAD_RE = re.compile(r"^[\s\-\+\&\,\/\|\(\)\[\]]+")


def clean_name(name: str | None) -> str | None:
    """F14 — reference ``_clean_name_heuristics``
    (transformer.py:600-753), step for step: edge-noise strip,
    hashtags, SKU codes, fluff vocabulary, dimension/spec patterns,
    202x years, noisy symbols, whitespace collapse, sentence case."""
    if not name:
        return None
    name = _LEAD_NOISE_RE.sub("", name)
    name = _TRAIL_NOISE_RE.sub("", name)
    cleaned = _HASHTAG_RE.sub("", name)
    for pattern in _SKU_PATTERNS:
        cleaned = pattern.sub("", cleaned)
    cleaned = _FLUFF_RE.sub("", cleaned)
    for pattern in _SPEC_PATTERNS:
        cleaned = pattern.sub("", cleaned)
    cleaned = _YEAR_RE.sub("", cleaned)
    cleaned = _SYMBOL_RE.sub(" ", cleaned)
    cleaned = " ".join(cleaned.split())
    if not cleaned:
        return None
    cleaned = cleaned.lower()
    return cleaned[0].upper() + cleaned[1:] if len(cleaned) > 1 else cleaned.upper()


def extract_short_name(name: str | None) -> str | None:
    """F15 core — reference ``_extract_short_name_heuristics``
    (transformer.py:755-932): clean, then the structural split over
    each separator in order (first >5-char part wins and becomes the
    input to the next separator), then the earliest stop-phrase past
    index 5 cuts the tail, then edge-noise trim."""
    cleaned = clean_name(name)
    if not cleaned:
        return None
    for sep in _SEPARATORS:
        parts = re.split(sep, cleaned)
        for part in parts:
            candidate = part.strip()
            if len(candidate) > 5:
                cleaned = candidate
                break
    name_lower = cleaned.lower()
    earliest_idx = len(cleaned)
    for pattern in _STOP_RES:
        match = pattern.search(name_lower)
        if match and 5 < match.start() < earliest_idx:
            earliest_idx = match.start()
    if earliest_idx < len(cleaned):
        cleaned = cleaned[:earliest_idx].strip()
    cleaned = _EDGE_NOISE_TRAIL_RE.sub("", cleaned)
    cleaned = _EDGE_NOISE_LEAD_RE.sub("", cleaned)
    return cleaned or None


def short_name(name: str | None) -> str | None:
    """F15 — reference ``_get_short_name`` (transformer.py:869-932)
    without the AI middle step: heuristic extraction, acceptance gate
    (2-7 words and ≤45 chars), then the hard fallback (heuristic
    result if any, else the raw name, word-boundary-truncated past 80
    chars with an ellipsis)."""
    if not name:
        return None
    heuristic_name = extract_short_name(name)
    if heuristic_name:
        word_count = len(heuristic_name.split())
        if 2 <= word_count <= 7 and len(heuristic_name) <= 45:
            return heuristic_name
    final_candidate = heuristic_name if heuristic_name else name
    if len(final_candidate) > 80:
        truncated = final_candidate[:77]
        last_space = truncated.rfind(" ")
        if last_space > 40:
            truncated = final_candidate[:last_space]
        return truncated + "..."
    return final_candidate


def shorten_name_ai(name: str | None, use_ai: bool = False) -> str | None:
    """F16 — AI name shortening interface. Deterministic heuristic by
    default; ``use_ai=True`` is where an external LLM call would go
    (not available in this environment, and intentionally NOT used in
    any correctness path)."""
    if use_ai:
        raise NotImplementedError("LLM path disabled: no external API access")
    if name is not None and len(name) < 15:  # passthrough rule
        return name
    return short_name(name)


@F.pandas_udf(T.StringType())
def clean_name_udf(names: pd.Series) -> pd.Series:
    return names.map(clean_name)


@F.pandas_udf(T.StringType())
def short_name_udf(names: pd.Series) -> pd.Series:
    return names.map(short_name)
