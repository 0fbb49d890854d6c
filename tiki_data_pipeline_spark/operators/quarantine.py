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
    """'retryable' | 'permanent' | 'unknown' from an error message."""
    out = F.lit(None).cast("string")
    for pat in PERMANENT_PATTERNS:
        out = F.when(out.isNull() & err.rlike(pat), "permanent").otherwise(out)
    for pat in RETRYABLE_PATTERNS:
        out = F.when(out.isNull() & err.rlike(pat), "retryable").otherwise(out)
    return F.coalesce(out, F.lit("unknown"))


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
