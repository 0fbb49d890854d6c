"""Failure routing / dead-letter semantics (SURVEY.md T5).

The reference classifies crawl failures into retryable vs permanent
and parks them in a dead-letter queue (reference
src/pipelines/crawl/resilience/dead_letter_queue.py:21-352, error
taxonomy resilience/exceptions.py). In the engine, failed rows are
DATA: a quarantine DataFrame with an error class and a retry
decision — never a silent drop. ``foreachBatch`` routes the same
classification in streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# error-pattern taxonomy (reference resilience/exceptions.py:208+):
# ordered — first match wins.
RETRYABLE_PATTERNS = [
    "(?i)timeout",
    "(?i)connection (reset|refused|aborted)",
    "(?i)temporarily unavailable",
    "(?i)rate limit|429",
    "(?i)50[234]",
]
PERMANENT_PATTERNS = [
    "(?i)404|not found",
    "(?i)410|gone",
    "(?i)parse error|invalid json|malformed",
    "(?i)403|forbidden",
]


def classify_error(err: Column) -> Column:
    """'retryable' | 'permanent' | 'unknown' from an error message.

    Built as ONE flat CASE chain (first match wins, permanent
    patterns first — the same priority the iterative form encoded).
    The previous build folded each rule as
    ``when(out.isNull() & m, x).otherwise(out)``, which embeds the
    prior tree TWICE per rule — 2^9 expression copies over the 9
    patterns, a ~100 kB physical plan for a 6-column project, every
    row re-evaluating the same regexes dozens of times (r14 plan
    capture). A chained ``when`` is linear: 9 rlikes, each evaluated
    at most once per row."""
    out = F.when(err.rlike(PERMANENT_PATTERNS[0]), "permanent")
    for pat in PERMANENT_PATTERNS[1:]:
        out = out.when(err.rlike(pat), "permanent")
    for pat in RETRYABLE_PATTERNS:
        out = out.when(err.rlike(pat), "retryable")
    return out.otherwise("unknown")


def route_failures(
    failures: DataFrame, max_retries: int = 3, error_col: str = "error"
) -> DataFrame:
    """DLQ routing: classify + decide. retryable under the retry cap →
    'retry'; permanent or exhausted → 'quarantine'; unknown → retry
    once then quarantine (the reference's conservative default)."""
    cls = classify_error(F.col(error_col))
    decision = (
        F.when((cls == "retryable") & (F.col("retry_count") < max_retries), "retry")
        .when((cls == "unknown") & (F.col("retry_count") < 1), "retry")
        .otherwise("quarantine")
    )
    return failures.withColumn("error_class", cls).withColumn("decision", decision)
