"""Vectorized UDAF surface (pandas grouped-aggregate UDFs).

The missing quadrant of §2.K next to Column helpers (scalar), UDTFs
(row→rows) and applyInPandas (group→rows): group→scalar aggregates with
no built-in form. Arrow ships each group's column as one pandas Series —
a single Python call per (group, column), not per row.

Scale note: a grouped-agg pandas UDF materializes the WHOLE group in
one worker (no partial aggregation/map-side combine), so it is for
moderate group cardinalities — never for a groupBy whose single group
can exceed executor memory. Prefer built-in aggregates when they exist;
these are the extension point for when they don't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """Mean of values between the group's 10th and 90th percentiles —
    the outlier-robust location estimate with no Spark built-in.
    NULL-safe (nulls dropped); empty/all-null groups return NaN → NULL."""
    x = v.dropna().to_numpy(dtype="float64")
    if x.size == 0:
        return float("nan")
    lo, hi = np.percentile(x, [10.0, 90.0])
    kept = x[(x >= lo) & (x <= hi)]
    return float(kept.mean()) if kept.size else float("nan")


@pandas_udf("double")
def gini_coefficient(v: pd.Series) -> float:
    """Gini concentration of non-negative values (0 = uniform, →1 = one
    row holds everything) — the domain-mix concentration probe for
    corpus audits. Sorts within the group (single worker, see module
    note)."""
    x = np.sort(v.dropna().to_numpy(dtype="float64"))
    if x.size == 0 or x.sum() == 0:
        return float("nan")
    n = x.size
    ranks = np.arange(1, n + 1)
    return float((2.0 * (ranks * x).sum() / (n * x.sum())) - (n + 1.0) / n)
