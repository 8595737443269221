"""Hypertable-style rollup cascade (continuous-aggregate pattern).

Multi-resolution time aggregates where each coarser level is computed
FROM the next finer level, not from raw data — at 100 TB the 1-day
rollup re-aggregates ~24 rows per key from the 1-hour rollup instead of
re-scanning billions of events. Works because the aggregates carried are
re-aggregatable (count/sum/min/max; avg = sum/count at read time) and
each coarser bucket width is a multiple of the finer one.

Batch twin of a streaming materialized view: run the finest level
incrementally (insert_overwrite by day partition), re-derive the
cascade from it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dur_seconds(d: str) -> int:
    n, unit = d.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    return int(n) * mult[unit.rstrip("s")]


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    levels: Sequence[str] = ("1 hour", "1 day"),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Stacked multi-resolution rollup: one output row per (level,
    bucket, group) with re-aggregatable measures (n_events, sum_value,
    min_value, max_value). ``levels`` must be increasing and each a
    multiple of the previous."""
    group_cols = list(group_cols)
    secs = [_dur_seconds(lv) for lv in levels]
    for a, b in zip(secs, secs[1:]):
        if b % a != 0:
            raise ValueError(f"levels must nest: {b}s not a multiple of {a}s")

    sum_t = "decimal(28,8)"  # exact, re-aggregatable, overflow headroom

    finest = (
        df.groupBy(F.window(ts_col, levels[0]).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(sum_t)).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.lit(levels[0]).alias("level"),
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            *group_cols,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )

    out = finest
    prev = finest
    for lv in levels[1:]:
        coarser = (
            prev.groupBy(F.window("bucket_start", lv).alias("w"), *group_cols)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(
                F.lit(lv).alias("level"),
                F.col("w.start").alias("bucket_start"),
                F.col("w.end").alias("bucket_end"),
                *group_cols,
                "n_events",
                "sum_value",
                "min_value",
                "max_value",
            )
        )
        out = out.unionByName(coarser)
        prev = coarser
    return out


def read_avg(sum_value: Column | str, n_events: Column | str) -> Column:
    """avg at read time from the carried re-aggregatables."""
    s = F.col(sum_value) if isinstance(sum_value, str) else sum_value
    n = F.col(n_events) if isinstance(n_events, str) else n_events
    return (s.cast("double") / n).alias("avg_value")


def sketch_rollup(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    levels: Sequence[str] = ("1 hour", "1 day"),
    group_cols: Sequence[str] = (),
    lg_k: int = 12,
) -> DataFrame:
    """Distinct-count rollup cascade via MERGEABLE HLL sketches (Spark
    4 native DataSketches: hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate).

    COUNT DISTINCT is the one common measure rollup_cascade cannot
    carry — distincts don't add across buckets. Sketches restore
    re-aggregatability: each finest bucket stores an HLL binary sketch
    of its keys, and every coarser level UNIONS the child sketches —
    never rescans raw data. At 100 TB this is the canonical
    pre-aggregation pattern (daily uniques from hourly sketches, 30-day
    uniques from daily ones, all from one raw scan), and the sketch
    column (~2^lg_k bytes) shuffles instead of the key set.

    Exactness contract (pinned in tests): sketch union is
    DETERMINISTIC — union-of-children equals a sketch built straight
    from the raw slice bit-for-bit in estimate terms — and the estimate
    error is bounded (~1.6%/sqrt(2^lg_k), ~2.5% at the default
    lg_k=12, tested against exact countDistinct). Output carries BOTH
    the sketch (for further rollups) and its estimate (for reads).
    """
    group_cols = list(group_cols)
    secs = [_dur_seconds(lv) for lv in levels]
    for a, b in zip(secs, secs[1:]):
        if b % a != 0:
            raise ValueError(f"levels must nest: {b}s not a multiple of {a}s")

    finest = (
        df.groupBy(F.window(ts_col, levels[0]).alias("w"), *group_cols)
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))
        .select(
            F.lit(levels[0]).alias("level"),
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            *group_cols,
            "sketch",
        )
    )
    out = finest
    prev = finest
    for lv in levels[1:]:
        coarser = (
            prev.groupBy(F.window("bucket_start", lv).alias("w"), *group_cols)
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .select(
                F.lit(lv).alias("level"),
                F.col("w.start").alias("bucket_start"),
                F.col("w.end").alias("bucket_end"),
                *group_cols,
                "sketch",
            )
        )
        out = out.unionByName(coarser)
        prev = coarser
    return out.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("sketch")
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 100,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-bin histogram: the MERGEABLE quantile state. One row per
    (group, bin) with a count — computed with a map-side-combined
    aggregate (the shuffle carries ≤ groups×bins rows, never events),
    and mergeable across partitions/days/tables by summing counts.

    This is the percentile analog of the sum/count rollup cascade
    above: exact quantiles need a global sort (a re-shuffle of the full
    fact at 100 TB per question asked), and the engine's
    percentile_approx sketch state isn't exposed for re-aggregation
    across separately-materialized rollups — a fixed-bin histogram is,
    with error bounded by the bin width, deterministic, and replayable
    in any SQL engine (the DuckDB oracle runs the identical binning).
    Out-of-range values clamp into the edge bins."""
    if bins < 1 or hi <= lo:
        raise ValueError(f"need hi > lo and bins >= 1: [{lo}, {hi}) / {bins}")
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    return df.groupBy(*group_cols, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: Sequence[float],
    *,
    lo: float,
    hi: float,
    bins: int = 100,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Linear-interpolated quantile estimates from a (possibly merged)
    :func:`value_histogram`. For each q: the first bin whose cumulative
    count reaches q·total, interpolated by where the target falls
    inside that bin's count mass — every step pure deterministic
    arithmetic, so two engines agree bit-for-bit.

    Runs on AGGREGATE rows only (≤ groups×bins): the cumulative window
    partitions by group over ~bins rows, metadata-scale no matter the
    fact size. Quantile targets fan out via a literal-array explode —
    one pass, no per-q jobs."""
    width = (hi - lo) / bins
    wc = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*[F.col(c) for c in group_cols])
    h = (
        hist.withColumn("_cum", F.sum("cnt").over(wc))
        .withColumn("_total", F.sum("cnt").over(wt))
        .withColumn("q", F.explode(F.array(*[F.lit(float(q)) for q in quantiles])))
    )
    target = F.col("q") * F.col("_total")
    before = F.col("_cum") - F.col("cnt")
    return h.filter((F.col("_cum") >= target) & (before < target)).select(
        *group_cols,
        "q",
        (
            F.lit(lo)
            + (F.col("bin") + (target - before) / F.col("cnt")) * F.lit(width)
        ).alias("estimate"),
    )
