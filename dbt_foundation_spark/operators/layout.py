"""Multi-dimensional data-clustering layout (Z-order).

``cluster_by`` (materialize.py) sorts files on ONE dimension so parquet
row-group min/max stats skip on that dimension. Filters on a *second*
column then skip nothing — the classic two-predicate dashboard query
reads the whole table. Z-ordering interleaves the bits of several
columns into one sort key so that sorting by it keeps rows that are
close in EVERY dimension inside the same row groups: each column's
min/max span per row group shrinks to roughly range/2^(bits_used/n_cols),
and point/range filters on ANY of the z-columns skip row groups. This
is the warehouse "CLUSTER BY (a, b)" / Delta ``OPTIMIZE ZORDER BY``
semantics, built from pure Column expressions — whole-stage codegen,
zero UDFs, no shuffle added (the sort is per-task, like cluster_by).

Scale notes: the key costs ~2·bits shift-and-mask expressions per row
(codegen'd straight-line JVM ops); coordinates come from equal-width
min/max bucketing, computed with ONE tiny agg at write time. Skewed
columns bucket unevenly under equal-width scaling — for heavy skew,
pre-transform the column (log, rank-bucket) before z-ordering, the
same advice every warehouse gives for clustering keys.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_interleave(cols: list[Column], bits: int = 16) -> Column:
    """Bit-interleave non-negative integer coordinates into one BIGINT
    Morton key: output bit ``i*len(cols)+j`` is bit ``i`` of column
    ``j``. Inputs must already lie in ``[0, 2^bits)``; total bits
    (``bits × len(cols)``) must fit a bigint (≤ 62)."""
    n = len(cols)
    if n < 1:
        raise ValueError("z_interleave needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits={bits} × {n} cols overflows a bigint")
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("bigint")
        for i in range(bits):
            # ((c >> i) & 1) << (i*n + j) — disjoint target bits, so
            # summing the terms is a bitwise OR the optimizer folds
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a + b, terms)


def _zorder_coords(
    df: DataFrame, cols: list[str], bits: int
) -> tuple[list[Column], int]:
    """Grid coordinates for each z-column (ONE small agg job for all
    the min/max stats) plus the count of DEGENERATE columns — constant
    or all-NULL, which map to a constant coordinate and contribute no
    ordering information."""
    numeric = {c: _numeric_col(df, c) for c in cols}
    stats = df.agg(
        *[F.min(numeric[c]).alias(f"_lo_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"_hi_{c}") for c in cols],
    ).first()
    cells = (1 << bits) - 1
    coords: list[Column] = []
    degenerate = 0
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        if lo is None or hi is None or lo == hi:
            coords.append(F.lit(0))
            degenerate += 1
            continue
        pos = (numeric[c] - F.lit(float(lo))) / F.lit(float(hi - lo))
        coords.append(
            F.coalesce(
                F.least(F.floor(pos * cells).cast("bigint"), F.lit(cells)),
                F.lit(0),
            )
        )
    return coords, degenerate


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton key over arbitrary orderable columns: each column is
    min/max-scaled to an integer grid of ``2^bits`` cells (ONE small
    agg job at plan-build — a write-time cost, like computing any
    clustering statistic), then bit-interleaved. NULLs map to cell 0,
    so they cluster together at the low end."""
    coords, _ = _zorder_coords(df, cols, bits)
    return z_interleave(coords, bits=bits)


def zorder_repartition(
    df: DataFrame, cols: list[str], n_out: int, bits: int = 12
) -> DataFrame:
    """Range-partition into ``n_out`` partitions on the Morton key and
    sort within each — the full-rewrite (Delta ``OPTIMIZE ZORDER BY``)
    shape, vs :func:`zorder_sort`'s shuffle-free in-place variant. The
    shared backend of ``compact_table``/``compact_parquet_path``'s
    ``zorder_by``.

    Robustness the raw key lacks: ``bits`` auto-shrinks so the key
    always fits a bigint (6+ columns would otherwise raise AFTER the
    stats scan; a coarser grid degrades clustering granularity, never
    correctness), and an all-degenerate key (every z-column constant or
    all-NULL) falls back to round-robin repartition — RangePartitioner
    on a constant collapses to ONE partition, which would silently
    defeat the compaction file-size target."""
    if len(cols) > 62:
        raise ValueError(f"cannot z-order {len(cols)} columns (max 62)")
    bits = min(bits, 62 // len(cols))
    coords, degenerate = _zorder_coords(df, cols, bits)
    if degenerate == len(cols):
        return df.repartition(n_out)
    key = z_interleave(coords, bits=bits)
    return df.repartitionByRange(n_out, key).sortWithinPartitions(key)


def _numeric_col(df: DataFrame, c: str) -> Column:
    """Order-preserving double view of a z-column (numerics directly,
    dates as days-since-epoch, timestamps as epoch seconds)."""
    dtype = dict(df.dtypes).get(c, "")
    col = F.col(c)
    if dtype == "date":
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Sort each output partition by the Morton key — the drop-in
    z-ordered variant of ``cluster_by``'s sortWithinPartitions. Adds no
    shuffle and no output column."""
    return df.sortWithinPartitions(zorder_key(df, cols, bits=bits))
