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
# ``queries()``.  Round-13 rotation (VERDICT r12 "Next round" #1;
# evidence ages recomputed from CORRECTNESS_r01..r12 at round start:
# 3 rows with r9-age evidence, 50 with r10-age, 50 with r11-age, 50
# with r12-age + the 3 rows-only-by-design catalog-state queries):
# (a) the 3 queries deferred from the r12 window, whose latest full row
# is r9 — now the oldest evidence in the catalog: q_literal_union,
# q_notnull_filter, q_star_except (exactly the trio the r12 comment
# committed to lead r13).
# (b) 47 of the 50 queries whose latest green row is r10.  Three r10
# queries defer to lead the r14 window — q_big_orders, q_promo_revenue,
# q_small_qty_revenue — chosen because each is a stateless TPC-H-style
# relational query (scan→agg→join) with its own pytest coverage and no
# index/lifecycle state, so a one-round deferral carries the least risk.
# 3 + 47 = 50.  r14 plan: those 3 deferred r10 rows + 47 of the 50
# r11-age rows — steady-state cycle stays ~3 rounds for 153 oracled
# queries.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) oldest evidence first — the 3 rows deferred from r12 (r9 age)
    "q_literal_union",
    "q_notnull_filter",
    "q_star_except",
    # (b) r10-stale evidence refresh — 47 of 50 (q_big_orders,
    # q_promo_revenue, q_small_qty_revenue lead r14)
    "q_bigram_logprob",
    "q_brand_revenue",
    "q_char_entropy",
    "q_clone_pointer",
    "q_cohort_retention",
    "q_corpus_pipeline",
    "q_cosine_topk_ivf",
    "q_customer_distribution",
    "q_dedup_corpus",
    "q_dedup_incremental",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_excess_shippers",
    "q_exists_priority",
    "q_filter_funnel",
    "q_forecast_revenue",
    "q_fuzzy_match",
    "q_gap_fill",
    "q_histogram_quantiles",
    "q_idf_novelty",
    "q_idle_customers",
    "q_important_nations",
    "q_local_volume",
    "q_market_share",
    "q_min_cost_supplier",
    "q_model_contract",
    "q_nation_profit",
    "q_nation_volume",
    "q_priority_shipments",
    "q_repeated_spans",
    "q_returned_customers",
    "q_salted_join",
    "q_supplier_variety",
    "q_temperature_mix",
    "q_token_budget_select",
    "q_top_supplier",
    "q_top_terms",
    "q_train_test_split",
    "q_two_phase_distinct",
    "q_unigram_logprob",
    "q_value_outliers",
    "q_waiting_suppliers",
    "q_window_cume_dist",
    "q_window_first_last",
    "q_window_range_frame",
    "q_winsorize",
    "q_zorder_layout",
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
