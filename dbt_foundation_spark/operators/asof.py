"""As-of (point-in-time) join — the canonical temporal operator Spark
has no built-in for (SURVEY §2.C note: the engine inherits Spark's join
suite; as-of is the Cat-D extension every market-data / feature-store
pipeline needs).

Implementation is the merge-sort formulation, not a range join:

    union(left ⊕ right) → window over (key ORDER BY ts, side) →
    last(right payload IGNORE NULLS) → keep left rows

One keyed shuffle + one sort — the same cost as a sort-merge join —
versus the range-join formulation (l.ts >= r.ts inequality join) which
explodes to O(|matches per key|²) pairs before aggregation. At 100 TB
the window shuffle is AQE-skew-splittable and the sort is the same sort
a SortMergeJoin would do anyway.

Semantics match DuckDB/kdb ASOF JOIN on non-NULL timestamps: for each
left row, the single most recent right row with r.ts <= l.ts
(backward; ties at equal ts match), or the earliest with r.ts >= l.ts
(forward). Unmatched left rows survive with NULLs (left-outer flavor).
NULL timestamps deliberately DIVERGE from DuckDB: comparison semantics
(a NULL ts never matches, either side) — see the NULL-timestamps
paragraph in :func:`asof_join`'s docstring.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the as-of matching right row's columns.

    on: equi-key columns (both sides). right_cols: right payload columns
    to attach (default: all non-key, non-ts). The matched right
    timestamp is attached as ``{right_ts}{suffix}``. tolerance: optional
    SQL interval string (e.g. ``'1 hour'``) bounding the time gap.

    Right rows sharing (key, ts) are nondeterministic under as-of
    semantics everywhere (DuckDB ASOF picks an arbitrary one too) —
    pre-aggregate to one row per (key, ts) if that matters (the catalog
    query does), or fold the right side through
    :func:`operators.cdc.cdc_snapshot`, whose duplicate-key keeper IS
    deterministic.

    NULL timestamps follow COMPARISON semantics: a NULL ts on either
    side never matches (``ts >= NULL`` is NULL), so NULL-ts left rows
    attach NULL payload and NULL-ts right rows are dropped up front.
    Deliberate corner divergence from DuckDB's ASOF JOIN, whose
    sort-based implementation pairs a NULL-ts left row with a NULL-ts
    right row (both sort NULLS LAST and its binary search treats them
    as one value class) while still refusing NULL-right for non-NULL
    left; pandas ``merge_asof`` rejects NaT outright.  Comparison
    semantics are the principled middle: no fabricated
    match-at-unknown-time, no hard error on dirty data.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)

    # internal plumbing columns: a left/right input already carrying one
    # of these would be silently overwritten by withColumn and the
    # corrupted value re-selected into the output — fail loudly instead
    reserved = {"_ts", "_side", "_m", "_r_payload"}
    clash = sorted(
        reserved & (set(left.columns) | set(on) | set(right_cols) | {right_ts})
    )
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)}; "
            f"rename input column(s) {clash} before joining"
        )

    ts_out = f"{right_ts}{suffix}"
    # The right row travels as ONE struct so the window attaches a row
    # ATOMICALLY: per-column last(ignorenulls) would skip a legit NULL
    # in the true as-of row's payload and splice in an OLDER row's
    # value next to the newer row's timestamp — a row that never
    # existed (review r9). The struct itself is non-NULL on every
    # right row (struct of nullable fields), so ignorenulls skips only
    # the interleaved left rows.
    payload = F.struct(
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r__ts"),
    )

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    # NULL-timestamp right rows can never satisfy the as-of comparison
    # (SQL: ts >= NULL is NULL) — drop them, matching DuckDB ASOF JOIN
    # and pandas merge_asof; without this they sorted nulls-first into
    # every lookback window and could be attached as "matches at
    # unknown time" (r9 edge-case probe).
    r_tagged = (
        right.filter(F.col(right_ts).isNotNull())
        .select(*on, F.col(right_ts).alias("_ts"), payload.alias("_r_payload"))
        .withColumn("_side", F.lit(0))
    )
    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # backward: right rows sort before left at equal ts (inclusive match)
    # and the window looks back; forward: reverse time order.  NULL-ts
    # LEFT rows sort explicitly FIRST in both directions so no right
    # row precedes them — they attach NULL payload, the SQL no-match.
    order = [F.col("_ts").asc_nulls_first(), F.col("_side").asc()] if direction == "backward" else [
        F.col("_ts").desc_nulls_first(),
        F.col("_side").asc(),
    ]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    matched = (
        both.withColumn("_m", F.last("_r_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )

    out = matched.select(
        *[c for c in left.columns],
        *[
            F.col("_m")[f"_r_{c}"].alias(c if c not in left.columns else f"{c}{suffix}")
            for c in right_cols
        ],
        F.col("_m")["_r__ts"].alias(ts_out),
    )
    if tolerance is not None:
        gap_ok = (
            F.col(ts_out) >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col(ts_out) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        )
        null_cols = [c if c not in left.columns else f"{c}{suffix}" for c in right_cols] + [ts_out]
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(gap_ok, F.col(c)).alias(c)
                for c in null_cols
            ],
        )
    return out
