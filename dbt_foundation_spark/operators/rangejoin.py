"""Binned range join — turn interval predicates into equi-joins.

Spark plans a pure inequality join (point-in-interval, interval-overlap)
as BroadcastNestedLoopJoin or a cartesian product: O(|L|·|R|) compares.
The binned rewrite quantizes the range dimension into fixed-width bins,
equi-joins on the bin id (keyed shuffle, AQE-friendly), and re-checks
the exact predicate — the standard optimization Databricks exposes as a
range-join hint, here as an explicit DataFrame rewrite that works on any
Spark.

Bin width is the knob: ~the median interval length is a good default —
too narrow multiplies the interval side's replication factor
(ceil(len/width)+1 bins per interval), too wide degrades to
few-buckets-many-rows. ``suggest_bin_width`` measures it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("bigint")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (plus optional equi-keys).

    Each interval replicates into its covered bins via an explode of a
    sequence — linear in total covered bins, then one keyed shuffle.
    Inner-only: the exact predicate is re-checked AFTER the bin join, so
    any outer variant would silently drop its null-extended rows.
    """
    if how != "inner":
        raise ValueError("point_in_interval_join supports how='inner' only")
    extra_on = list(extra_on or [])
    p = points.withColumn("_bin", _bin(F.col(point_col), bin_width))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin(F.col(start_col), bin_width), _bin(F.col(end_col), bin_width)
            )
        ),
    )
    joined = p.join(iv, extra_on + ["_bin"], how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join interval pairs that overlap: ``l.start < r.end AND
    r.start < l.end`` (half-open). Both sides replicate into covered
    bins; the bin equi-join produces each overlapping pair in every
    shared bin, so results are de-duplicated by keeping only the pair's
    first shared bin (no distinct shuffle needed — an arithmetic guard).
    """
    extra_on = list(extra_on or [])
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(_bin(F.col(left_start), bin_width), _bin(F.col(left_end), bin_width))
        ),
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(_bin(F.col(right_start), bin_width), _bin(F.col(right_end), bin_width))
        ),
    )
    first_shared = F.greatest(
        _bin(F.col(left_start), bin_width), _bin(F.col(right_start), bin_width)
    )
    return (
        lb.join(rb, extra_on + ["_bin"])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("_bin") == first_shared)  # emit each pair exactly once
        )
        .drop("_bin")
    )


def suggest_bin_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> float:
    """Median interval length — the usual sweet spot for bin width."""
    row = intervals.select(
        F.median(F.col(end_col) - F.col(start_col)).alias("m")
    ).first()
    return float(row["m"] or 1.0)
