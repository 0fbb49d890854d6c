"""Name-cleaning heuristics (SURVEY.md F14/F15/F16).

Ports of the reference's marketing-fluff stripper and short-name
extractor (reference src/pipelines/transform/transformer.py:600-932)
— too branchy for column expressions (SURVEY §2.11 U5), so the pure
cores are plain Python (unit-testable) wrapped in Arrow-batched
pandas UDFs.

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

# Marketing-fluff vocabulary to strip (reference transformer.py:600-753
# keeps ~90 entries; a representative subset — same mechanism).
FLUFF_WORDS = [
    "chính hãng",
    "giá rẻ",
    "khuyến mãi",
    "freeship",
    "hot",
    "sale",
    "siêu sale",
    "giảm giá",
    "cao cấp",
    "chất lượng",
    "uy tín",
    "mới 2024",
    "mới 2025",
    "hàng có sẵn",
    "bảo hành",
    "chính hang",
    "100%",
]

_HASHTAG_RE = re.compile(r"#\w+")
_SKU_RE = re.compile(r"\b[A-Z]{2,}[-_]?\d{2,}\b")
_DIMENSION_RE = re.compile(r"\b\d+\s*[xX*]\s*\d+(\s*[xX*]\s*\d+)?\s*(cm|mm|m|inch)?\b")
_YEAR_RE = re.compile(r"\b(19|20)\d{2}\b")
_SYMBOL_RE = re.compile(r"[™®©•◆★☆✓✔➤�]+")
_WS_RE = re.compile(r"\s+")
# split delimiters for short-name chunking (reference transformer.py:755-932)
_DELIMS_RE = re.compile(r"\s*[-–—|,/]\s*")
STOP_PHRASES = ["dành cho", "thích hợp", "chuyên dụng", "phù hợp", "sử dụng"]


def clean_name(name: str | None) -> str | None:
    """F14 — strip hashtags, SKU codes, fluff keywords, dimension
    specs, years, symbols; collapse whitespace; sentence-case."""
    if name is None:
        return None
    s = name
    s = _HASHTAG_RE.sub(" ", s)
    s = _SKU_RE.sub(" ", s)
    s = _DIMENSION_RE.sub(" ", s)
    s = _YEAR_RE.sub(" ", s)
    s = _SYMBOL_RE.sub(" ", s)
    low = s.lower()
    for w in FLUFF_WORDS:
        idx = low.find(w)
        while idx >= 0:
            s = s[:idx] + " " * len(w) + s[idx + len(w):]
            low = s.lower()
            idx = low.find(w)
    s = _WS_RE.sub(" ", s).strip(" -–—|,/")
    if not s:
        return None
    return s[0].upper() + s[1:]


def short_name(name: str | None, max_chars: int = 45) -> str | None:
    """F15 — cleaned name → first meaningful chunk:

    split on delimiters, take the first chunk > 5 chars, cut at a
    stop-phrase past index 5, trim punctuation; accept only 2-7 words
    and ≤ max_chars, else fall back to a word-boundary truncation.
    """
    cleaned = clean_name(name)
    if cleaned is None:
        return None
    chunks = [c for c in _DELIMS_RE.split(cleaned) if len(c.strip()) > 5]
    candidate = (chunks[0] if chunks else cleaned).strip()
    low = candidate.lower()
    for phrase in STOP_PHRASES:
        idx = low.find(phrase)
        if idx > 5:
            candidate = candidate[:idx]
            low = candidate.lower()
    candidate = candidate.strip(" .,-–—|/")
    words = candidate.split()
    if 2 <= len(words) <= 7 and len(candidate) <= max_chars:
        return candidate
    # fallback: word-boundary truncate (reference summarizer length fallback)
    out = ""
    for w in words:
        if len(out) + len(w) + (1 if out else 0) > max_chars:
            break
        out = f"{out} {w}".strip()
    return out or candidate[:max_chars]


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
