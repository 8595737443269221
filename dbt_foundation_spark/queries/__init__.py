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
# ``queries()``.  Round-6 rotation (VERDICT r5 "Next round" #1/#3):
# (a) the 5 queries whose validated-in-place oracles landed LATE in
# round 5 (after that round's window was set) — q_dedup_minhash
# (ground-truth pair count via inverted-index join + banding-recall
# bound), q_dedup_simhash (planted-duplicate canary), q_cosine_topk_ivf
# (exact top-10 + IVF recall bound), q_multimodal_features /
# q_frame_sample (generator-arithmetic re-derivation). Their only
# driver rows are r1 rows-only; this round gives each its first FULL
# (rows+schema+hash) driver row. (b) 45 of the 50 queries whose latest
# green row is r3 — now the oldest full-check evidence (the r2 bucket
# was emptied in r5). Five r3 queries are deferred to the r7 window:
# q_dedup_minhash_portable, q_dedup_simhash_portable,
# q_cosine_topk_quantized, q_dedup_incremental, q_dedup_corpus — all
# five are dedup/ANN flavors whose siblings (the fast minhash/simhash
# detectors, the IVF index) get fresh r6 rows in slot (a), so the
# family's freshest evidence is ≤1 round old either way. 5 + 45 = 50.
# r7 plan: those 5 deferred r3 queries + 45 of the 48 r4 rows (the
# remaining 3 r4 rows + this round's r6 block refresh in r8) — the
# steady-state cycle is ~3 rounds for 153 oracled queries at 50/round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) first-ever FULL driver rows — oracles landed late in r5
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_cosine_topk_ivf",
    "q_multimodal_features",
    "q_frame_sample",
    # (b) r3-stale evidence refresh — reference/framework core first,
    # then the relational/TPC-H-analog block, then the LLM-pipeline
    # operators (order mirrors the r3 window's own grouping)
    "q_literal_union",
    "q_ref_filter",
    "q_notnull_filter",
    "q_source_scan",
    "q_star_except",
    "q_recent_events",
    "q_json_extract_agg",
    "q_group_by_all",
    "q_table_rebuild",
    "q_incremental_append",
    "q_incremental_merge",
    "q_snapshot_scd2",
    "q_cdc_snapshot",
    "q_pricing_summary",
    "q_join_inner",
    "q_join_semi",
    "q_fk_orphans",
    "q_join_range",
    "q_shipping_priority",
    "q_lateral_json",
    "q_except",
    "q_intersect",
    "q_agg_rollup",
    "q_agg_cube",
    "q_crossdb_datemath",
    "q_session_window_native",
    "q_asof_join",
    "q_range_bin_join",
    "q_ngram_jaccard",
    "q_embedding_neardup",
    "q_array_ops",
    "q_epoch_shuffle",
    "q_stratified_sample",
    "q_doc_chunks",
    "q_vocab_encode",
    "q_dedup_components",
    "q_repetition_signals",
    "q_sequence_pack",
    "q_contamination",
    "q_knn_join",
    "q_domain_mix",
    "q_pii_redact",
    "q_quality_quantile",
    "q_embedding_quantize",
    "q_containment",
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
