"""Deterministic sampling for training-data pipelines.

`df.sample`/`sampleBy` are seed-deterministic but partition-layout
dependent (a repartition changes the sample) and engine-specific. These
samplers decide membership from a content hash of the row's id, so the
sample is stable under repartitioning, incremental reprocessing (a doc
keeps its fate across runs), AND reproducible in any engine with md5 —
which is what makes the DuckDB oracle able to check them row-for-row.

Membership: md5(id || ':' || salt) taken as a 32-bit hex prefix,
compared against floor(fraction * 2^32) rendered in hex — lexicographic
compare of fixed-width lowercase hex equals numeric compare, so the
whole predicate stays a codegen'd string comparison (no bigint parsing,
which DuckDB's SQL surface lacks for hex).

NULL-id contract: a row with a NULL id has no stable identity, so it
can never be a sample MEMBER (its hash is NULL and every membership
predicate fails — hash_sample / stratified_sample / mixture_resample
exclude it, and mixture counts only identifiable rows so phantom rows
don't bias the clean domains' rates). :func:`train_test_split` is the
exception because its contract is exhaustive: NULL-id rows land in
TRAIN, deterministically — never silently in neither split, and never
in the eval set, whose members must be trackable across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f":{salt}"))), 1, 8)


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    v = int(fraction * (1 << 32))
    if v >= 1 << 32:
        # 9-char '100000000' would string-compare WRONG against 8-char
        # hashes ('f…' > '1…'); 'ffffffffff' is a strict upper bound for
        # every 8-char hex prefix, including 'ffffffff' itself.
        return "ffffffffff"
    return format(v, "08x")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, decided per-row by content hash.
    NULL-id rows are never members (module docstring)."""
    return df.filter(
        _hash_bucket(F.col(id_col), salt) < F.lit(_threshold_hex(fraction))
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample web text to 10%, keep
    100% of books). Strata not listed get default_fraction."""
    thresh = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thresh)
    return df.filter(_hash_bucket(F.col(id_col), salt) < thresh)


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, content-stable split — a row never migrates
    between train and test across runs or repartitions.

    NULL ids go to TRAIN (coalesce, not raw negation): the raw NULL
    hash fails BOTH filters, so NULL-id rows silently vanished from the
    corpus — an exhaustiveness violation (r10 probe). Train is the safe
    side: eval-set membership must be trackable across runs, which an
    id-less row is not (module docstring, NULL-id contract)."""
    test_pred = F.coalesce(
        _hash_bucket(F.col(id_col), salt) < F.lit(_threshold_hex(test_fraction)),
        F.lit(False),
    )
    return df.filter(~test_pred), df.filter(test_pred)


def mixture_resample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    target_weights: dict[str, float],
    salt: str = "mix",
    allow_missing: bool = False,
) -> DataFrame:
    """Resample a multi-domain corpus to a target mixture (e.g. 50% web,
    30% books, 20% code) by downsampling only — the output is the
    LARGEST sample achieving the target ratios without upsampling any
    domain: T = min_d(n_d / w_d) rows in expectation, acceptance rate
    r_d = T * w_d / n_d per domain. Domains not listed are dropped;
    only weight RATIOS matter (the formula is scale-invariant, no
    normalization step to drift cross-engine).

    A LISTED domain ABSENT from the corpus caps the mixture at zero:
    n_d = 0 ⇒ T = min(0 / w_d) = 0 ⇒ EMPTY output — the formula's own
    answer, since no non-empty sample can give an absent domain its
    target share. Empty-out is loud downstream; silently re-mixing the
    present domains would ship a 71/0/29 split to a caller who asked
    for 50/30/20 (r10 degenerate probe). Pass ``allow_missing=True``
    to opt into that re-mix explicitly (absent domains dropped from
    the cap, present ones mixed among themselves). Both paths stay
    fully lazy/declarative — the absent check is a left join +
    coalesce inside the plan, not a driver-side count.

    Fully declarative: one tiny groupBy for the domain counts, a 1-row
    min() for the cap, a broadcast join of per-domain rates, then the
    same content-hash membership predicate as :func:`hash_sample` — so
    membership is stable under repartitioning/reruns AND replayable in
    any engine with md5 (the rate→hex threshold is rendered with
    floor/hex/lpad, identical arithmetic both sides). At 100 TB the
    corpus is touched exactly twice (count pass + filter pass), never
    shuffled.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if any(d is None for d in target_weights):
        raise ValueError(
            "target_weights cannot key on None: NULL-domain rows are "
            "unsampleable (module docstring, NULL-id contract)"
        )
    if any(w <= 0 for w in target_weights.values()):
        raise ValueError(f"weights must be > 0: {target_weights}")
    spark = df.sparkSession
    from dbt_foundation_spark.local_data import local_frame

    wdf = local_frame(
        spark, sorted(target_weights.items()), f"{domain_col} string, _wt double"
    )
    # count only MEMBERSHIP-ELIGIBLE rows (non-NULL id): the hash filter
    # below can never admit a NULL-id row, so counting it would deflate
    # its domain's acceptance rate and skew the realized mixture of the
    # clean rows (r10 probe). NULL-domain rows drop out naturally — the
    # rate join is on the (never-NULL) weight-table domains.
    counts = (
        df.filter(F.col(id_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    sized = counts.join(F.broadcast(wdf), domain_col)
    if allow_missing:
        cap_over = sized
    else:
        # every REQUESTED domain contributes to the cap; absent ones
        # count 0 rows, driving the cap (and the whole sample) to zero
        cap_over = wdf.join(counts, domain_col, "left").select(
            "_wt", F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
        )
    cap = cap_over.agg(F.min(F.col("_n") / F.col("_wt")).alias("_cap"))
    rates = sized.crossJoin(F.broadcast(cap)).select(
        domain_col,
        (F.col("_cap") * F.col("_wt") / F.col("_n")).alias("_rate"),
    )
    thr = F.when(F.col("_rate") >= 1.0, F.lit("ffffffffff")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("_rate") * F.lit(4294967296.0)).cast("bigint"))),
            8,
            "0",
        )
    )
    return (
        df.join(F.broadcast(rates.withColumn("_thr", thr)), domain_col)
        .filter(_hash_bucket(F.col(id_col), salt) < F.col("_thr"))
        # restore the INPUT column order: the equi-join hoists the join
        # key to the front, so without this select the output schema
        # order would differ from the input's (and from the
        # empty-corpus path in temperature_resample, which returns
        # df.limit(0)) — positional consumers would silently misalign
        .select(*df.columns)
    )


def budget_select(
    df: DataFrame,
    *,
    id_col: str,
    score_col: str,
    cost_col: str,
    budget: int | DataFrame,
    bins: int = 1000,
) -> DataFrame:
    """Greedy budget-constrained selection without a global sort.

    Picks rows in (score desc, id asc) order while the running sum of
    ``cost_col`` stays within ``budget`` — the exact prefix a single
    global ``ORDER BY … ROWS UNBOUNDED PRECEDING`` running-sum window
    would select, but computed scalably:

    - **phase A** buckets rows into ``bins`` coarse score bins
      (``floor(score*bins)``, map-side) and aggregates per-bin cost
      totals — one tiny shuffle whose output is ≤ ``bins``+1 rows.
      The descending cumulative over those aggregate rows (the one
      unpartitioned window here, metadata-scale by construction)
      marks every bin whose cumulative fits as selected wholesale.
    - **phase B** runs the fine running-sum window ONLY over the single
      boundary bin the budget crosses, partitioned by bin — window
      state is bounded by one bin's rows, never the corpus.

    Equivalence to the naive plan: the global (score desc, id) order
    visits bins in descending order and rows of one bin contiguously
    (floor is monotone), and costs are ≥ 1, so "running ≤ budget" is a
    prefix — full bins plus the boundary bin's inner prefix IS that
    prefix. Exactly one bin can be partial: cumulative-before is
    monotone across bins, so only the crossing bin has
    ``before < budget < before + bin_cost``.

    A naive global-order window puts the whole corpus through one
    task; at 100 TB that is the difference between a 2-minute and a
    never-finishing stage. Raise ``bins`` if one bin's rows could
    outgrow an executor (narrower bins ⇒ smaller phase-B partition).

    ``budget`` is either a plain int or a 1-row DataFrame with a
    ``budget`` column (e.g. ``floor(0.4 * sum(cost))`` — a genuinely
    bounded scalar, so its broadcast is always correct).
    Scores must lie in [0, 1]; costs must be positive.
    """
    scalar = F.broadcast(budget) if isinstance(budget, DataFrame) else None
    scored = df.withColumn(
        "_bin", F.floor(F.col(score_col) * F.lit(bins)).cast("int")
    )
    bin_tot = scored.groupBy("_bin").agg(F.sum(cost_col).alias("_bin_cost"))
    wb = (
        Window.orderBy(F.col("_bin").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_cum = bin_tot.withColumn(
        "_before", F.coalesce(F.sum("_bin_cost").over(wb), F.lit(0).cast("bigint"))
    )
    if scalar is not None:
        bin_cum = bin_cum.crossJoin(scalar)
        budget_col = F.col("budget")
    else:
        budget_col = F.lit(int(budget)).cast("bigint")
    bin_cum = bin_cum.select(
        "_bin",
        (F.col("_before") + F.col("_bin_cost") <= budget_col).alias("_full"),
        (budget_col - F.col("_before")).alias("_remaining"),
    )
    # both join sides below are ≤ bins+1 rows — bounded, broadcast-safe
    full_bins = bin_cum.filter(F.col("_full")).select("_bin")
    boundary = bin_cum.filter(~F.col("_full") & (F.col("_remaining") > 0)).select(
        "_bin", "_remaining"
    )
    out_cols = [c for c in df.columns]
    sel_full = scored.join(F.broadcast(full_bins), "_bin").select(*out_cols)
    wfine = (
        Window.partitionBy("_bin")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sel_boundary = (
        scored.join(F.broadcast(boundary), "_bin")
        .withColumn("_run", F.sum(cost_col).over(wfine))
        .filter(F.col("_run") <= F.col("_remaining"))
        .select(*out_cols)
    )
    return sel_full.unionByName(sel_boundary)


def temperature_resample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    temperature: float,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual-LM
    standard: target share ∝ n_d^(1/T)): T=1 keeps the natural
    distribution, T→∞ flattens toward uniform (every domain downsampled
    to the smallest), intermediate T up-weights small domains without
    ever upsampling — exactly :func:`mixture_resample` with weights
    n_d^(1/T), so membership inherits its content-hash stability and
    cross-engine replayability.

    The per-domain counts are collected driver-side to build the weight
    table — bounded by domain cardinality (languages/sources: tens to
    thousands of rows), the same boundedness argument as the rate
    broadcast inside mixture_resample."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    # non-NULL domain AND id only: a NULL domain key would crash the
    # weight-table sort in mixture_resample (None < str), and NULL-id
    # rows can never be members so they must not inflate n_d (r10
    # probe; module docstring, NULL-id contract)
    counts = (
        df.filter(F.col(domain_col).isNotNull() & F.col(id_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    weights = {r[domain_col]: float(r["_n"]) ** (1.0 / temperature) for r in counts}
    if not weights:  # empty corpus (or nothing eligible): nothing to mix
        return df.limit(0)
    return mixture_resample(df, id_col, domain_col, weights, salt=salt)
