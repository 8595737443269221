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
# ``queries()``.  Round-10 rotation (VERDICT r9 "Next round" #2; union
# r1–r9 recomputed at round start: 3×r6, 50×r7, 50×r8, 50×r9 full rows
# + the 3 rows-only-by-design catalog-state queries):
# (a) the 3 queries deferred from the r9 window, whose latest full row
# is r6 — now the oldest evidence in the catalog: q_dedup_minhash,
# q_dedup_simhash, q_cosine_topk_ivf. (b) 47 of the 50 queries whose
# latest green row is r7.  Three r7 queries are deferred to the r11
# window — q_dedup_minhash_portable, q_dedup_simhash_portable,
# q_cosine_topk_quantized — chosen because each one's base-family
# query is IN this window (q_dedup_minhash, q_dedup_simhash,
# q_cosine_topk_ivf) and q_cosine_topk carries r8 evidence, so no
# family's freshest row ages past 1 round.  3 + 47 = 50.
# r11 plan: those 3 deferred r7 queries + 47 of the 50 r8 rows — the
# steady-state cycle is ~3 rounds for 153 oracled queries at 50/round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) oldest evidence first — the 3 rows deferred from r9 (r6 age)
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_cosine_topk_ivf",
    # (b) r7-stale evidence refresh — dedup/ANN + LLM-text block first
    # (order mirrors the r7 window's own grouping)
    "q_dedup_corpus",
    "q_dedup_incremental",
    "q_corpus_pipeline",
    "q_fuzzy_match",
    "q_clone_pointer",
    "q_bigram_logprob",
    "q_unigram_logprob",
    "q_char_entropy",
    "q_repeated_spans",
    "q_top_terms",
    "q_idf_novelty",
    "q_token_budget_select",
    "q_histogram_quantiles",
    "q_train_test_split",
    "q_two_phase_distinct",
    "q_salted_join",
    "q_zorder_layout",
    "q_winsorize",
    "q_value_outliers",
    "q_gap_fill",
    "q_forecast_revenue",
    "q_cohort_retention",
    "q_filter_funnel",
    "q_temperature_mix",
    # relational / TPC-H-ish block
    "q_big_orders",
    "q_brand_revenue",
    "q_customer_distribution",
    "q_excess_shippers",
    "q_exists_priority",
    "q_idle_customers",
    "q_important_nations",
    "q_local_volume",
    "q_market_share",
    "q_min_cost_supplier",
    "q_model_contract",
    "q_nation_profit",
    "q_nation_volume",
    "q_priority_shipments",
    "q_promo_revenue",
    "q_returned_customers",
    "q_small_qty_revenue",
    "q_supplier_variety",
    "q_top_supplier",
    "q_waiting_suppliers",
    # window-function block
    "q_window_cume_dist",
    "q_window_first_last",
    "q_window_range_frame",
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
