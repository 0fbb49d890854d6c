"""Windowed / incremental event queries (SURVEY.md §2.10 T2/T4/T7)
in BATCH mode with DuckDB oracles. The same transformations run as
Structured Streaming in ``tiki_data_pipeline_spark.streaming`` (tested
with the memory sink); batch/stream parity is Spark's unified
Dataset semantics — these oracles pin down the window math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tiki_data_pipeline_spark.io import load_table
from tiki_data_pipeline_spark.plans import exactmath as X
from tiki_data_pipeline_spark.plans.registry import query


@query(
    "events_tumbling_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — tumbling 1-hour windows per event type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH slid AS (
      SELECT e.*,
             time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes')
               AS window_start
      FROM events e, range(0, 2) t(k)
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           {AVG_VALUE} AS avg_value
    FROM slid
    WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
    GROUP BY 1, 2
    """.replace("{AVG_VALUE}", X.o_avg_money_2dp("value")),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 — sliding windows (1h size, 30min slide). event values are
    2-decimal, so the AVG uses exact integer-cent rounding."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(X.cents(F.col("value"))).alias("_sc"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "_sc",
        )
        .selectExpr(
            "window_start",
            "window_end",
            "n_events",
            X.div_round_expr("_sc", "n_events", 100) + " AS avg_value",
        )
    )


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY 1, 2
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    the batch twin of streaming ``session_window``."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # gap in MICROSECONDS: a seconds-truncated cast would call a
    # 30m00.4s gap between sub-second timestamps exactly 1800s (same
    # session) while the oracle's full-precision interval compare — and
    # the streaming session_window twin — would split it.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "events_asof_purchase_click",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           ROUND(value, 2) AS purchase_value, last_click_ts
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — as-of join: for each purchase, the same user's latest
    strictly-earlier click. One window over the interleaved stream —
    no range join, no cross product (the merge_asof pattern
    re-expressed as a running MAX)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = events.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return ordered.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round(F.col("value"), 2).alias("purchase_value"),
        "last_click_ts",
    )


@query(
    "events_purchase_click_interval_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id, c.event_id AS click_id,
           p.ts AS purchase_ts, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL '1 hour' AND c.ts < p.ts
    """,
)
def events_purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every click within the hour BEFORE a same-user
    purchase — the batch twin of the streaming stream-stream join
    (tested with watermarks in tests/test_streaming.py). The time
    bound is what makes the streaming state finite."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") < F.col("purchase_ts")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
    )


@query(
    "events_dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — exactly-once-style dedup: first event per (user, type);
    the batch twin of streaming dropDuplicatesWithinWatermark."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "events_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY window_start ORDER BY n_events DESC, event_type ASC) AS rn
      FROM counts
    ) t WHERE rn <= 3
    """,
)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-3 per tumbling hour by count, ties
    broken by type name — the per-window rank composition (T7 window ×
    W1 top-k). Hour buckets via date_trunc, identical to the 1-hour
    tumbling window's start at any timezone-free epoch alignment."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
    )


@query(
    "events_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.view_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(1 + (c.user_id IS NOT NULL)::INT
                  + (p.user_id IS NOT NULL)::INT AS INTEGER) AS funnel_depth
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user,
    the first view, the first click STRICTLY AFTER it, and the first
    purchase strictly after that, plus the reached depth. One scan of
    the (user, type, ts) projection and one user_id exchange, however
    many steps the funnel has — the chained window minima and the
    final same-key aggregate all reuse that partitioning."""
    from pyspark.sql import Window as W

    # r14 single-pass form: the aggregate-and-join cascade re-derived
    # each earlier step per consumer, scanning the events table 6× per
    # query (v feeds c and the final join; c feeds p and the final
    # join; subtrees are duplicated, not shared). Three per-user
    # window minima over ONE scan and ONE user_id exchange compute the
    # identical sequential funnel: each step's min is conditional on
    # the previous step's (partition-constant) timestamp, and a step
    # with no qualifying event yields NULL exactly like the inner
    # join+filter did. The same-key groupBy collapses to one row per
    # user with no further exchange.
    w = W.partitionBy("user_id")
    stepped = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        stepped.filter(F.col("view_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("view_ts").alias("view_ts"),
            F.max("click_ts").alias("click_ts"),
            F.max("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("int")
                + F.col("purchase_ts").isNotNull().cast("int")
            ).alias("funnel_depth"),
        )
    )
