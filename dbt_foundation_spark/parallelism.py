"""Scan-parallelism helper shared by queries and operators.

Moved out of ``queries._util`` (r13 optimization round) so the index
BUILD operators can use it too: an index build's input is typically a
filtered scan, and when that scan arrives as fewer splits than the
cluster has cores (single-row-group files at test scale; a handful of
giant files in the wild) every per-row stage of the build — shingling,
signature hashing, centroid distances — serializes on those few tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition an UNDERSIZED scan up to the cluster's
    default parallelism — identity when the scan already has enough
    splits.

    Why this exists: single-row-group/sub-megabyte parquet yields ONE
    input partition per file, and every CPU-heavy operator downstream
    (shingling explodes text into posting rows, hyperplane signatures
    run m dot products per vector) serializes on one core. At 100 TB
    the same scan arrives as thousands of splits and this helper is a
    no-op by its own guard; locally it is the difference between 1×
    and 32× parallelism on the dominant stage. The shuffle it adds
    moves only the raw scan bytes — strictly smaller than the
    expansion the downstream stages produce from them.

    Use it ONLY under compute-heavy pipelines (dedup, similarity,
    multimodal decode, index builds); plain filter/agg marts are
    cheaper unsharded than reshuffled.

    The undersized-scan probe is ``len(df.inputFiles())`` — a
    file-index listing on the already-analyzed plan (never a job).
    File count under-reads splits for multi-row-group files, but that
    error direction only triggers a repartition the downstream
    compute-bound stages amortize anyway; a 100 TB scan lists
    thousands of files and stays un-shuffled.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        return df.repartition(target)
    return df
