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
# ``queries()``.  Round-7 rotation (VERDICT r6 "Next round" #1; union
# r1–r6 recomputed at round start: 5×r3, 48×r4, 50×r5, 50×r6 full rows
# + the 3 rows-only-by-design catalog-state queries):
# (a) the 5 queries deferred from the r6 window, whose latest full row
# is r3 — now the oldest evidence in the catalog: q_dedup_minhash_portable,
# q_dedup_simhash_portable, q_cosine_topk_quantized, q_dedup_incremental,
# q_dedup_corpus. (b) 45 of the 48 queries whose latest green row is r4.
# Three r4 queries are deferred to the r8 window —
# q_incremental_microbatch, q_dedup_keep_best, q_embedding_meanpool —
# chosen because each one's family carries fresh r6 evidence
# (q_incremental_append/merge, q_dedup_components/q_dedup_minhash,
# q_embedding_quantize/q_embedding_neardup), so no family's freshest
# row ages past 1 round. 5 + 45 = 50.
# r8 plan: those 3 deferred r4 queries + 47 of the 50 r5 rows (the
# remaining 3 r5 rows lead r9 with the r6 block) — the steady-state
# cycle is ~3 rounds for 153 oracled queries at 50/round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) oldest evidence first — the 5 dedup/ANN flavors deferred from r6
    "q_dedup_minhash_portable",
    "q_dedup_simhash_portable",
    "q_cosine_topk_quantized",
    "q_dedup_incremental",
    "q_dedup_corpus",
    # (b) r4-stale evidence refresh — relational/TPC-H-analog block
    # first, then windows/framework, then the LLM-pipeline operators
    # (order mirrors the r4 window's own grouping)
    "q_big_orders",
    "q_brand_revenue",
    "q_cohort_retention",
    "q_customer_distribution",
    "q_excess_shippers",
    "q_exists_priority",
    "q_forecast_revenue",
    "q_gap_fill",
    "q_idle_customers",
    "q_important_nations",
    "q_local_volume",
    "q_market_share",
    "q_min_cost_supplier",
    "q_nation_profit",
    "q_nation_volume",
    "q_priority_shipments",
    "q_promo_revenue",
    "q_returned_customers",
    "q_small_qty_revenue",
    "q_supplier_variety",
    "q_top_supplier",
    "q_value_outliers",
    "q_waiting_suppliers",
    "q_window_cume_dist",
    "q_window_first_last",
    "q_window_range_frame",
    "q_winsorize",
    "q_histogram_quantiles",
    "q_salted_join",
    "q_two_phase_distinct",
    "q_zorder_layout",
    "q_clone_pointer",
    "q_model_contract",
    # LLM-pipeline / text operators from the r4 block
    "q_bigram_logprob",
    "q_unigram_logprob",
    "q_char_entropy",
    "q_corpus_pipeline",
    "q_filter_funnel",
    "q_fuzzy_match",
    "q_idf_novelty",
    "q_repeated_spans",
    "q_temperature_mix",
    "q_token_budget_select",
    "q_top_terms",
    "q_train_test_split",
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
