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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    """Keep ~fraction of rows, decided per-row by content hash."""
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
    between train and test across runs or repartitions."""
    test_pred = _hash_bucket(F.col(id_col), salt) < F.lit(_threshold_hex(test_fraction))
    return df.filter(~test_pred), df.filter(test_pred)


def mixture_resample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    target_weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Resample a multi-domain corpus to a target mixture (e.g. 50% web,
    30% books, 20% code) by downsampling only — the output is the
    LARGEST sample achieving the target ratios without upsampling any
    domain: T = min_d(n_d / w_d) rows in expectation, acceptance rate
    r_d = T * w_d / n_d per domain. Domains not listed are dropped;
    only weight RATIOS matter (the formula is scale-invariant, no
    normalization step to drift cross-engine).

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
    if any(w <= 0 for w in target_weights.values()):
        raise ValueError(f"weights must be > 0: {target_weights}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(target_weights.items()), f"{domain_col} string, _wt double"
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    sized = counts.join(F.broadcast(wdf), domain_col)
    cap = sized.agg(F.min(F.col("_n") / F.col("_wt")).alias("_cap"))
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
        .drop("_rate", "_thr")
    )
