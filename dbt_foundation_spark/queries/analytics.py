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
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS VARCHAR)
                    AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(value * value AS DECIMAL(18,8))) AS VARCHAR)
                    AS DOUBLE) AS s2
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


@query(
    "q_histogram_quantiles",
    oracle="""
    WITH h AS (
        SELECT event_type,
               least(99, greatest(0, CAST(floor((value - 0.0) / 5.0) AS INT))) AS bin,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, bin
    ), c AS (
        SELECT event_type, bin, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
        FROM h
    ), e AS (
        SELECT c.*, q FROM c CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS q)
    )
    SELECT event_type, q,
           round(0.0 + (bin + (q * total - (cum - cnt)) / cnt) * 5.0, 6) AS estimate
    FROM e
    WHERE cum >= q * total AND cum - cnt < q * total
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 from a mergeable fixed-bin histogram
    (operators/rollup.value_histogram → histogram_quantiles).

    Exact percentiles re-sort the full fact per question — at 100 TB
    that is a fresh global shuffle every time someone asks for a p99 —
    and percentile_approx's sketch state can't be re-aggregated across
    separately materialized rollups. The histogram can: the fact is
    touched ONCE by a map-side-combined count into ≤ types×100 bins,
    daily histograms merge by summing counts (pytest pins merged ≡
    direct), and the interpolation runs on aggregate rows only. Error
    is bounded by the 5.0 bin width; every arithmetic step is identical
    IEEE math in both engines, so the oracle hash-matches exactly."""
    from dbt_foundation_spark.operators.rollup import histogram_quantiles, value_histogram

    ev = t(spark, sf_dir, "events")
    hist = value_histogram(
        ev, "value", lo=0.0, hi=500.0, bins=100, group_cols=("event_type",)
    )
    est = histogram_quantiles(
        hist,
        (0.5, 0.95, 0.99),
        lo=0.0,
        hi=500.0,
        bins=100,
        group_cols=("event_type",),
    )
    return est.select("event_type", "q", F.round("estimate", 6).alias("estimate"))
