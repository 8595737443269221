"""Event-analytics marts (round-3 additions to the §2.D/§2.E surface).

Classic warehouse analytics the reference's users would build as dbt
models on the events table: statistical outlier detection and cohort
retention. Both oracles replay the exact arithmetic — variance is
computed from decimal-routed power sums (never the engine's stddev
builtin, whose streaming formulation differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import t


@query(
    "q_value_outliers",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,8))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value * value AS DECIMAL(18,8))) AS DOUBLE) AS s2
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round((e.value - s.s1 / s.n)
                 / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6) AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.n > 1
      AND (s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1) > 0
      AND abs((e.value - s.s1 / s.n)
              / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))) > 2.0
    """,
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers (|z| > 2): mean/variance derived from
    DECIMAL-routed power sums so both engines compute identical doubles
    — the engine's own stddev builtins use streaming (Welford-style)
    updates whose intermediate rounding is engine-specific and would
    hash-mismatch. The var > 0 predicate (same expression both engines)
    drops constant-valued users whose z would be NaN/Inf via 0/0 — NaN
    sorts above every double in both engines, so without the guard such
    garbage rows would pass |z| > 2. One map-side-combined aggregate +
    a stats join back onto the fact; the per-user stats table grows
    with user cardinality, so its join strategy is AQE's call (no
    forced broadcast — at 100 TB this is a shuffle join by size)."""
    ev = t(spark, sf_dir, "events")
    # square per-row in DOUBLE (identical IEEE op in both engines), then
    # decimal-route only the ACCUMULATION — a decimal×decimal product
    # would need DECIMAL(36,16) and overflows DuckDB's narrower type
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,8)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,8)"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        ev.join(stats, "user_id")
        .filter((F.col("n") > 1) & (var > 0) & (F.abs(z) > 2.0))
        .select("event_id", "user_id", F.round(z, 6).alias("zscore"))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS first_day FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id,
               CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7) AS INT)
                   AS week_offset,
               CAST(floor(date_diff('day', DATE '1992-01-06', f.first_day) / 7) AS INT)
                   AS cohort_week
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week (weeks
    since a fixed Monday epoch), counted per week-offset of later
    activity — the standard retention triangle. Pure integer date
    arithmetic (cross-engine exact); the firsts aggregate grows with
    distinct users so no forced broadcast (AQE decides — at 100 TB
    both sides shuffle on user_id), the distinct is the only other
    wide shuffle."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    joined = ev.join(firsts, "user_id")
    activity = joined.select(
        "user_id",
        F.floor(F.datediff(F.col("ts").cast("date"), F.col("first_day")) / 7)
        .cast("int")
        .alias("week_offset"),
        F.floor(F.datediff(F.col("first_day"), F.lit("1992-01-06").cast("date")) / 7)
        .cast("int")
        .alias("cohort_week"),
    ).distinct()
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
