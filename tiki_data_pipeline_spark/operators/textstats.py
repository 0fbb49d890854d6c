"""Text-analysis operators for LLM data pipelines (BASELINE.json
north-star: language-ID, quality scoring, token counting, document
fingerprinting) over the ``documents`` table.

All pure column expressions — at 100 TB these run inside whole-stage
codegen with no shuffle at all (per-row), except the aggregations the
caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lists for the n-gram/stopword heuristic
# language ID. Deterministic and fast — NOT a real langid model; the
# operator contract is "argmax of marker hits with lexicographic
# tie-break", which is what the oracle checks.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, r"[\w\s]", ""))


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    return F.size(F.filter(tokens(text), lambda t: t.isin(sw)))


def quality_numerator_denominator(text: Column) -> tuple[Column, Column]:
    """Exact-rational quality heuristic in [0,1]:

    0.4·min(tokens,100)/100 + 0.3·(1 − punct/chars)
    + 0.3·min(10·stopwords, tokens)/tokens

    as the integer fraction
    num = 4·L·c·t + 300·(c−p)·t + 300·m·c, denom = 1000·c·t
    with L = min(t,100), m = min(10·s, t), c/t clamped to ≥1.

    Kept in integer space because float ROUND of half-way values like
    0.84025 is engine-dependent (Spark BigDecimal-half-up vs DuckDB
    multiply-and-rint) — the oracle and the engine must round
    identically. Mirrors the reference's weighted completeness idea
    (data_validator.py:89-123) applied to free text.
    """
    t = token_count(text).cast("bigint")
    c = F.length(text).cast("bigint")
    p = punct_count(text).cast("bigint")
    s = stopword_count(text).cast("bigint")
    tt = F.greatest(t, F.lit(1))
    cc = F.greatest(c, F.lit(1))
    big_l = F.least(t, F.lit(100))
    m = F.least(10 * s, t)
    num = 4 * big_l * cc * tt + 300 * (cc - p) * tt + 300 * m * cc
    denom = 1000 * cc * tt
    return num, denom


def _marker_hits(toks: Column, words: list[str]) -> Column:
    # NB: the lambda must be unary — F.filter treats a second parameter
    # (even a defaulted one) as the element-index argument.
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_guess(text: Column) -> Column:
    """Marker-hit argmax language guess, lexicographic tie-break."""
    toks = tokens(text)
    best = F.lit(None).cast("string")
    best_hits = F.lit(-1)
    for lang in sorted(LANG_MARKERS):
        hits = _marker_hits(toks, LANG_MARKERS[lang])
        take = hits > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best


# GPT-2-style (simplified) token pattern: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. RE2 and
# Java regex agree on \p{L}/\p{N} here.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via the GPT-2-style pre-tokenizer regex —
    the cheap token estimator for training-data budgeting (the exact
    BPE merge table isn't needed to size a corpus)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (LLM pre-training prep):
    windows of ``chunk_size`` whitespace tokens every ``stride``
    tokens; the final windows may be shorter. One explode, no UDF."""
    with_toks = docs.select(
        id_col, F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks")
    ).filter(F.size("toks") > 0)
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
    exploded = with_toks.select(
        id_col, "toks", F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), chunk_size)
    return exploded.select(
        id_col,
        (((F.col("start") - 1) / stride).cast("int")).alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def fingerprint(text: Column) -> Column:
    """md5 of whitespace-normalized lowercase text (document identity
    for exact dedup; F10-style keying)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    num, denom = quality_numerator_denominator(t)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("n_punct", punct_count(t))
        .withColumn("n_stopwords", stopword_count(t))
        .withColumn("_qnum", num)
        .withColumn("_qden", denom)
        # integer `div` = exact half-up rounding to 4 decimals; the final
        # division by 10⁴ is exact enough (scaled value ≤ 10000).
        .withColumn(
            "quality_score",
            F.expr("CAST((_qnum * 20000 + _qden) div (2 * _qden) AS DOUBLE) / 10000.0"),
        )
        .drop("_qnum", "_qden")
        .withColumn("lang_guess", lang_guess(t))
        .withColumn("fingerprint", fingerprint(t))
    )


QUANTILE_POINTS = [0.25, 0.5, 0.75, 0.95]


def quantile_profile(
    docs: DataFrame,
    group_col: str = "lang",
    exact: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Per-group length-distribution profile of the corpus — the
    dataset card a curation run publishes before filtering: doc
    count plus interpolated p25/p50/p75/p95 of character and
    whitespace-token counts. Length quantiles drive truncation /
    min-length cutoffs (C4 drops <3-sentence pages; Gopher cuts on
    token-count bands), so they are computed FIRST, on the raw corpus.

    ``exact=True`` uses exact interpolated percentiles (one sort per
    group in a single aggregation — fine to ~billions of rows per
    group). At 100 TB set ``exact=False``: approx_percentile's
    mergeable KLL-ish sketch keeps the aggregation map-side
    combinable with bounded memory (±0.1% rank error), the standard
    profile-at-scale tradeoff. Both run as ONE groupBy over a narrow
    (group, n_chars, n_tokens) projection — text never shuffles.
    """
    pts = ", ".join(str(p) for p in QUANTILE_POINTS)
    fn = "percentile" if exact else "approx_percentile"
    base = docs.select(
        F.col(group_col),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
        token_count(F.col(text_col)).cast("long").alias("_nt"),
    )
    agg = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"{fn}(_nc, array({pts}))").alias("_qc"),
        F.expr(f"{fn}(_nt, array({pts}))").alias("_qt"),
    )
    cols = [F.col(group_col), F.col("n_docs")]
    for i, p in enumerate(QUANTILE_POINTS):
        tag = str(int(p * 100))
        cols.append(F.round(F.col("_qc")[i], 4).alias(f"chars_p{tag}"))
        cols.append(F.round(F.col("_qt")[i], 4).alias(f"tokens_p{tag}"))
    return agg.select(*cols)
