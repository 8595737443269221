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
# ``queries()``.  Round-3 rotation: (a) the 27 oracle-backed queries whose
# driver rows are stale from round 1 — q_vocab_encode first, its
# implementation changed AFTER its green row; (b) oracles that are new or
# whose implementation changed this round; (c) regression-prone dedup/
# similarity/text families for a fresh re-check. Everything else
# oracle-backed sorts next (cumulative green rows from r1/r2), rows-only
# checks go last.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) stale round-1 rows
    "q_vocab_encode",
    "q_pricing_summary",
    "q_shipping_priority",
    "q_literal_union",
    "q_ref_filter",
    "q_notnull_filter",
    "q_source_scan",
    "q_star_except",
    "q_recent_events",
    "q_json_extract_agg",
    "q_group_by_all",
    "q_join_inner",
    "q_join_semi",
    "q_join_range",
    "q_fk_orphans",
    "q_lateral_json",
    "q_except",
    "q_intersect",
    "q_agg_rollup",
    "q_agg_cube",
    "q_array_ops",
    "q_asof_join",
    "q_range_bin_join",
    "q_epoch_shuffle",
    "q_stratified_sample",
    "q_doc_chunks",
    "q_cdc_snapshot",
    # (b) new or changed oracles this round
    "q_dedup_simhash_portable",
    "q_incremental_merge",
    "q_incremental_append",
    "q_snapshot_scd2",
    "q_table_rebuild",
    "q_session_window_native",
    "q_embedding_neardup",
    "q_dedup_components",
    "q_dedup_corpus",
    "q_repetition_signals",
    "q_crossdb_datemath",
    # (b2) queries first added this round — no driver row exists yet
    "q_sequence_pack",
    "q_contamination",
    "q_knn_join",
    "q_domain_mix",
    "q_pii_redact",
    "q_quality_quantile",
    "q_embedding_quantize",
    "q_dedup_incremental",
    "q_cosine_topk_quantized",
    "q_containment",
    # (c) regression-prone re-checks (families whose r2-green rows are
    # simplest take the overflow seats; q_cosine_topk's exact-cosine
    # math is re-exercised by the quantized variant's re-score stage,
    # q_cosine_topk_lsh's r2 row stands — unchanged this round — and
    # q_dedup_exact/_fingerprint/q_lang_id/q_bpe_token_count stay
    # pytest-gated past slot 50)
    "q_dedup_minhash_portable",
    "q_ngram_jaccard",
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
