"""Benchmark-contamination detection — token n-gram overlap between a
training corpus and a benchmark/eval set.

Part of the mandated LLM-pipeline surface (BASELINE.json Cat D): before
training, every corpus document is scored by how many of its token
n-grams also occur anywhere in the benchmark set, so contaminated
documents can be dropped or flagged (the standard n-gram
decontamination used by public LLM data pipelines).

Shape at 100 TB: the benchmark side is eval sets — thousands of
documents, millions of distinct n-grams — while the corpus is the
100 TB. So the distinct benchmark-gram set is BROADCAST (one hash set
per executor, no shuffle of the corpus gram stream for the join); the
corpus side is one explode → per-doc distinct → map-side-combined
aggregate. Grams travel as fixed-width hashes, not strings, so shuffle
bytes are bounded per row. With ``portable=True`` the gram hash is md5
(reproducible in any engine — lets the DuckDB oracle replay the whole
pipeline); default is xxhash64, the cheap JVM-native path.

Deliberately NOT covered by the dedup paths' giant-document
``SIGNATURE_MAX_TOKENS`` cap: a benchmark quote deep inside a huge
document is exactly what decontamination exists to find, so truncation
here would be a correctness bug. The per-row gram-array
materialization hazard that implies (one multi-hundred-MB doc builds
its full gram array in one task) is accepted and documented in
SCALING.md — run decontamination after the quality/length gates, which
expose ``n_chars``/token counts to gate pathological documents on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_foundation_spark.functions import text as X


def _doc_grams(df: DataFrame, id_col: str, text_col: str, n: int, portable: bool) -> DataFrame:
    # r13: hash the grams with a map-side transform and array_distinct
    # INSIDE the array before exploding — repeated grams within a
    # document never reach the exchange. The global distinct stays: for
    # a DUPLICATED id (same text twice, or two texts under one id — the
    # README's dirty-data contract) the id's gram set is the UNION
    # across its rows, which only a cross-row dedup on (id, hash) can
    # produce; dropping it double-counted those ids' n_grams (caught by
    # the r13 review before it shipped). distinct-of-per-row-distinct
    # is the identical set for every input.
    hf = F.md5 if portable else F.xxhash64
    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.transform(X.token_ngrams(text_col, n), lambda g: hf(g)))
        ).alias("_g"),
    ).distinct()


def ngram_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    portable: bool = False,
    broadcast_bench: bool = True,
    include_nulls: bool = False,
) -> DataFrame:
    """Score each corpus document's n-gram overlap with the benchmark.

    Returns one row per corpus document WITH TOKENIZABLE TEXT:
    ``(id_col, n_grams, n_contaminated, contamination)`` where
    ``contamination`` is the fraction of the document's distinct
    n-grams that appear anywhere in the benchmark set (rounded to 6 —
    oracle-comparable). Documents shorter than ``n`` tokens contribute
    a single all-token shingle (``token_ngrams`` semantics), so
    ``n_grams >= 1`` for every emitted row; NULL-text documents
    produce no grams and are ABSENT from the output by default (r9
    NULL-shingle contract).  Callers that count or join on the output
    rowset and need every corpus document present pass
    ``include_nulls=True``: the scores are left-joined back onto the
    distinct corpus id set, so no-content docs appear with NULL
    metrics instead of vanishing — an explicit row, not a fabricated
    0.0 score (no grams means overlap is undefined, not zero).

    Set ``broadcast_bench=False`` only if the benchmark gram set is too
    big for executor memory — the join then falls back to a keyed
    shuffle on the gram hash.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = _doc_grams(corpus, id_col, text_col, n, portable)
    bgrams = _doc_grams(bench, id_col, text_col, n, portable).select("_g").distinct()
    if broadcast_bench:
        bgrams = F.broadcast(bgrams)
    hit = F.when(bgrams["_g"].isNotNull(), 1).otherwise(0)
    joined = grams.join(bgrams, grams["_g"] == bgrams["_g"], "left").select(
        F.col(id_col), hit.alias("_hit")
    )
    scores = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_hit").cast("bigint").alias("n_contaminated"),
        F.round(
            F.sum("_hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("contamination"),
    )
    if include_nulls:
        return corpus.select(id_col).distinct().join(scores, id_col, "left")
    return scores
