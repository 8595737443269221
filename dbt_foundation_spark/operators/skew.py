"""Skew-handling toolkit for hot-key joins and aggregations.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) is the first
line of defense and is on by default in the engine session. These
helpers cover the cases AQE can't fix:

- ``salted_join``: a shuffle join where ONE side has pathological key
  skew (a handful of keys holding a large share of rows) and the other
  side is small-per-key but too big to broadcast. The skewed side gets a
  deterministic salt; the other side is replicated ``salt`` times. The
  hot key's rows then spread over ``salt`` reducers instead of one.
- ``two_phase_distinct``: exact COUNT(DISTINCT x) per key without
  funneling a hot key's values through one reducer — shuffle on
  (key, x) first (cardinality-spread), then count per key.

Both are pure DataFrame rewrites — deterministic results, Catalyst
still optimizes around them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    deterministically (hash of its full row spreads even a single
    all-identical key), replicate ``other`` across all salt values, and
    join on keys + salt. Result equals ``skewed.join(other, on, how)``.

    Replication multiplies the small side's shuffle volume by ``salt`` —
    use only when the skewed side's hot keys actually dominate a reducer
    (row-count × salt on the other side must stay far below the skewed
    side's hot-key row count for a net win).
    """
    on = list(on)
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    return salted.join(replicated, on + ["_salt"], how).drop("_salt")


def two_phase_distinct(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count, skew-resistant: phase 1 dedups on
    (keys, value) — the hot key's distinct values hash across reducers —
    phase 2 counts the (already small) distinct pairs per key.

    NULL values are excluded, matching ``COUNT(DISTINCT x)``; keys whose
    values are all NULL therefore don't appear (SQL would report 0)."""
    keys = list(keys)
    return (
        df.select(*keys, value)
        .filter(F.col(value).isNotNull())
        .dropDuplicates(keys + [value])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def key_skew_profile(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and their share of the total for
    the heaviest ``top`` keys — what to look at before reaching for
    salting."""
    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.count()
    return (
        counts.withColumn("share", F.col("n_rows") / F.lit(total))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )
