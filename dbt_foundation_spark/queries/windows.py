"""Window functions + batch time windows (SURVEY §2.E, §2.J).

The reference is batch-only ELT (no streaming anywhere in
/root/reference — §2.J); tumbling/sliding/session windows here are the
batch analogs over the events table. The sessionization uses the
canonical lag+cumsum formulation (identical semantics in both engines);
the native session_window flavor is q_session_window_native at the
bottom of this file and is covered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import dsum, sql_dsum, t


@query(
    "q_window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey,
           rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    QUALIFY rnk <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5-family ranking: rank/dense_rank per partition, top-5 filter.

    Spark pushes the rank<=5 predicate into the window (WindowGroupLimit)
    — per-partition top-k, not a full sort of every partition."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (cumulative frame, decimal-exact)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,8)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS days_since_prev,
           lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS next_orderkey
    FROM orders
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-order gap days + next order key."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT c_mktsegment, quartile, COUNT(*) AS n FROM (
        SELECT c_mktsegment,
               ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
                   AS quartile
        FROM customer
    ) GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles (fully-deterministic order incl. key tiebreak)."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_mktsegment", F.ntile(4).over(w).alias("quartile"))
        .groupBy("c_mktsegment", "quartile")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "quartile")
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a 3-row frame (decimal-exact division)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,8)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@query(
    "q_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n, {sql_dsum("value", "sum_value")}
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J tumbling window (batch analog): hourly buckets per type.

    F.window(ts, '1 hour') — identical to the Structured Streaming op;
    the same expression works under readStream + watermark."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "q_sliding_window",
    oracle=f"""
    WITH exploded AS (
        SELECT make_timestamp(
                   (CAST(FLOOR((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off) * 1000000
               ) AS window_start,
               value
        FROM events, (SELECT unnest([0, 1800]) AS off)
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n, {sql_dsum("value", "sum_value")}
    FROM exploded
    GROUP BY 1 ORDER BY 1
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J sliding window: 1 h length, 30 min slide — each event lands
    in 2 overlapping windows (F.window explodes them JVM-side)."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_value",
        )
        .orderBy("window_start")
    )


@query(
    "q_session_window",
    oracle="""
    WITH flagged AS (
        -- interval comparison, not epoch() doubles: epoch seconds at
        -- ~1.7e9 have ~0.24 us ulp, so a gap of exactly the timeout
        -- can compare either way; timestamp+INTERVAL is exact integer
        -- time arithmetic in both engines (r7 sf0.1 sweep finding)
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.J sessionization (30-min gap), lag+cumsum formulation.

    Matches F.session_window's merge rule (a gap of exactly the timeout
    starts a new session) at FULL microsecond precision: the boundary
    test is ``ts >= prev + INTERVAL 30 MINUTES`` — exact integer time
    arithmetic. The unix_timestamp() diff this replaced truncates each
    stamp to whole seconds, which flips the verdict for gaps within a
    second of the timeout (one extra session at sf0.1; the r7 sweep
    caught it — sf0.01 never produced such a gap). One shuffle on
    user_id serves both windows and the final aggregation. The native
    session_window variant is q_session_window_native."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") >= prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sessions = events.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(cum)
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q_session_window_native",
    oracle="""
    WITH flagged AS (
        -- exact interval boundary, not epoch() doubles (see
        -- q_session_window — same r7 sf0.1 sweep finding)
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window (the Spark-native gap-session operator; verified
    present in 4.1.2 — same op drives streaming sessionization). The
    oracle is the lag+cumsum sessionization already proven equivalent
    for q_session_window — pinning the native operator's gap-merge
    boundary behavior (gap == timeout starts a new session)
    cross-engine (round-2 ask #6)."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "q_rollup_cascade",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(28,8))) AS sum_value
        FROM events GROUP BY 1, 2
    ), daily AS (
        SELECT time_bucket(INTERVAL '1 day', bucket_start) AS bucket_start,
               event_type,
               SUM(n_events) AS n_events,
               SUM(sum_value) AS sum_value
        FROM hourly GROUP BY 1, 2
    )
    SELECT '1 hour' AS level, bucket_start, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(CAST(sum_value AS VARCHAR) AS DOUBLE) AS sum_value
    FROM hourly
    UNION ALL
    SELECT '1 day' AS level, bucket_start, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(CAST(sum_value AS VARCHAR) AS DOUBLE) AS sum_value
    FROM daily
    """,
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: 1-hour buckets
    from raw events, 1-day buckets re-aggregated FROM the hourly rollup
    (operators/rollup.py) — the multi-resolution pattern that never
    rescans raw data for coarser levels."""
    from dbt_foundation_spark.operators.rollup import rollup_cascade

    events = t(spark, sf_dir, "events")
    out = rollup_cascade(
        events, "ts", "value", levels=("1 hour", "1 day"), group_cols=("event_type",)
    )
    return out.select(
        "level",
        "bucket_start",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_events_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,8))) OVER w AS DOUBLE) AS sum_value_1h
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E RANGE-interval frame: each event's trailing-1-hour count and
    value sum per user — the time-decayed feature shape (rate limiting,
    rolling exposure) that a ROWS frame cannot express. Ordering is
    microsecond epoch integers in BOTH engines, so the frame boundary is
    bit-exact cross-engine; the sum is decimal-routed. One keyed shuffle
    on user_id."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.sum(F.col("value").cast("decimal(18,8)")).over(w).cast("double").alias("sum_value_1h"),
    )


@query(
    "q_gap_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E fill-forward gap filling: null out sensor-dropout rows
    ('error' events stand in for gaps) and carry the last observed value
    forward per user — F.last(ignorenulls) over a cumulative frame, the
    canonical time-series imputation. Deterministic tiebreak (ts,
    event_id); one keyed shuffle."""
    ev = t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E frame navigation: each event tagged with its user's first,
    last and second observed value — the session-bracketing shape
    (entry/exit price, first-touch attribution). The UNBOUNDED-both
    frame makes last_value well-defined (the default frame would peg it
    to CURRENT ROW — the classic silent-wrong-answer); nth_value(2) is
    NULL for single-event users on both engines. Deterministic order
    (ts, event_id); one keyed shuffle."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.nth_value("value", 2).over(w).alias("second_v"),
    )


@query(
    "q_window_cume_dist",
    oracle="""
    SELECT event_id, user_id,
           round(cume_dist()    OVER w, 6) AS cd,
           round(percent_rank() OVER w, 6) AS pr
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E relative-standing functions: cume_dist and percent_rank of
    each event's value within its user — the per-entity percentile
    feature. Both are rank ratios (exact small-integer divisions —
    cross-engine identical before rounding; the round(6) only
    normalizes repr). event_id tiebreak makes ranks deterministic; one
    keyed shuffle, no extra exchange beyond the sort."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "q_sketch_rollup",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS b, COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    ), daily AS (
        SELECT date_trunc('day', ts) AS b, COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT '1 hour' AS level,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(n_exact AS BIGINT) AS n_exact,
           TRUE AS est_within_5pct
    FROM hourly
    UNION ALL
    SELECT '1 day' AS level,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(n_exact AS BIGINT) AS n_exact,
           TRUE AS est_within_5pct
    FROM daily
    ORDER BY level, bucket_start
    """,
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.E/§2.L mergeable distinct-count rollup: hourly HLL sketches of
    active users, day level built by UNIONING the hourly sketches
    (operators/rollup.sketch_rollup) — the pre-aggregation that makes
    COUNT DISTINCT re-aggregatable at 100 TB.

    The binary sketch has no DuckDB twin, so the driver-comparable
    output validates it in place: per bucket, the EXACT distinct count
    (hash-compared against DuckDB) plus a boolean asserting the sketch
    estimate landed within 5 % of it (lg_k=12 → rsd ≈1.6 %; hourly
    buckets sit in HLL sparse mode and are near-exact, the day level
    exercises dense estimation after sketch union). Deterministic for a
    fixed dataset. Union-consistency and error bounds additionally
    pinned in tests/test_scale_ops.py."""
    from dbt_foundation_spark.operators.rollup import sketch_rollup

    ev = t(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    est = sketch_rollup(ev, "ts", "user_id", levels=("1 hour", "1 day")).select(
        "level", "bucket_start", "n_distinct_est"
    )
    exact = None
    for lv in ("1 hour", "1 day"):
        e = (
            ev.groupBy(F.window("ts", lv).alias("w"))
            .agg(F.count_distinct("user_id").alias("n_exact"))
            .select(
                F.lit(lv).alias("level"),
                F.col("w.start").alias("bucket_start"),
                "n_exact",
            )
        )
        exact = e if exact is None else exact.unionByName(e)
    return (
        est.join(exact, ["level", "bucket_start"])
        .select(
            "level",
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "n_exact",
            (
                F.abs(F.col("n_distinct_est").cast("double") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("est_within_5pct"),
        )
        .orderBy("level", "bucket_start")
    )
