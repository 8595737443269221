"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``dbt_foundation_spark.queries`` — the catalog registers
every implemented SURVEY §2 operator as a ``(spark, sf_dir) ->
DataFrame`` callable paired (where SQL-expressible) with a DuckDB
oracle string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_SMOKE = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> None:
    """Session invariants the catalog relies on (UTC + nanos parquet)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; loader also handles ns→long


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    _configure(spark)
    from dbt_foundation_spark.queries import all_queries

    return all_queries()["q_pricing_summary"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbt_foundation_spark.queries import all_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible key in ``queries()``."""
    from dbt_foundation_spark.queries import all_oracles

    return all_oracles()
