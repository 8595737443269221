"""Query catalog — every SURVEY §2 query name, wired to a DuckDB oracle.

``@query(name, oracle=...)`` registers a ``(spark, sf_dir) -> DataFrame``
callable plus (optionally) the ANSI-SQL oracle the driver runs in DuckDB.
Queries with no deterministic SQL twin (LSH, catalog introspection)
register with ``oracle=None`` → rows-only check.

Import side effects populate the registry; ``__spark_entry__.py`` is a
thin shim over :func:`all_queries` / :func:`all_oracles`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness only ingests the first 50 entries of
# ``queries()``.  Round-9 rotation (VERDICT r8 "Next round" #1; union
# r1–r8 recomputed at round start: 3×r5, 50×r6, 50×r7, 50×r8 full rows
# + the 3 rows-only-by-design catalog-state queries):
# (a) the 3 queries deferred from the r8 window, whose latest full row
# is r5 — now the oldest evidence in the catalog: q_dedup_exact,
# q_cosine_topk_lsh, q_window_rank. (b) 47 of the 50 queries whose
# latest green row is r6.  Three r6 queries are deferred to the r10
# window — q_dedup_minhash, q_dedup_simhash, q_cosine_topk_ivf —
# chosen because each one's family carries fresh r7/r8 evidence
# (q_dedup_minhash_portable r7, q_dedup_simhash_portable r7,
# q_cosine_topk r8 + q_cosine_topk_quantized r7), so no family's
# freshest row ages past 1 round.  3 + 47 = 50.
# r10 plan: those 3 deferred r6 queries + 47 of the 50 r7 rows — the
# steady-state cycle is ~3 rounds for 153 oracled queries at 50/round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) oldest evidence first — the 3 rows deferred from r8 (r5 age)
    "q_dedup_exact",
    "q_cosine_topk_lsh",
    "q_window_rank",
    # (b) r6-stale evidence refresh — dedup/ANN + LLM-text block first
    # (order mirrors the r6 window's own grouping)
    "q_dedup_components",
    "q_containment",
    "q_ngram_jaccard",
    "q_embedding_neardup",
    "q_embedding_quantize",
    "q_knn_join",
    "q_contamination",
    "q_repetition_signals",
    "q_doc_chunks",
    "q_vocab_encode",
    "q_sequence_pack",
    "q_pii_redact",
    "q_quality_quantile",
    "q_multimodal_features",
    "q_frame_sample",
    "q_array_ops",
    # sampling / mixtures
    "q_stratified_sample",
    "q_domain_mix",
    "q_epoch_shuffle",
    # relational / TPC-H-ish block
    "q_pricing_summary",
    "q_shipping_priority",
    "q_join_inner",
    "q_join_semi",
    "q_join_range",
    "q_range_bin_join",
    "q_asof_join",
    "q_fk_orphans",
    "q_except",
    "q_intersect",
    "q_literal_union",
    "q_group_by_all",
    "q_agg_cube",
    "q_agg_rollup",
    "q_star_except",
    "q_ref_filter",
    "q_source_scan",
    "q_notnull_filter",
    "q_recent_events",
    "q_json_extract_agg",
    "q_lateral_json",
    "q_crossdb_datemath",
    # framework sinks / time-series
    "q_table_rebuild",
    "q_incremental_append",
    "q_incremental_merge",
    "q_snapshot_scd2",
    "q_cdc_snapshot",
    "q_session_window_native",
)


def _ordered_names() -> list[str]:
    reg = list(_QUERIES)
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}

    def key(item: tuple[int, str]) -> tuple[int, int]:
        idx, name = item
        if name in prio:
            return (0, prio[name])
        if name in _ORACLES:
            return (1, idx)
        return (2, idx)

    return [n for _, n in sorted(enumerate(reg), key=key)]


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: _QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import side effects register every query.
    from dbt_foundation_spark.queries import (  # noqa: F401
        analytics,
        curation,
        framework,
        llm,
        reference,
        relational,
        utils_parity,
        windows,
    )

    _LOADED = True
