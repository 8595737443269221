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


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import side effects register every query.
    from dbt_foundation_spark.queries import (  # noqa: F401
        framework,
        llm,
        reference,
        relational,
        utils_parity,
        windows,
    )

    _LOADED = True
