"""Shared helpers for the query catalog.

Numeric determinism contract: the driver hash-compares Spark output with
DuckDB output value-by-value. Plain SUM/AVG over doubles is
order-dependent (different partial-aggregation orders → last-ulp drift),
so every oracle-compared aggregate over a double column goes through an
exact DECIMAL(18,4) cast (bit-identical in both engines: a double can
never sit exactly on a 1e-4 rounding boundary, because 5e-5 has no
finite binary expansion), is summed exactly, and is cast back to double
at the end. At 100 TB scale this costs nothing — decimal sums are still
map-side-combinable JVM aggregates.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Parquet TIMESTAMP(NANOS) columns (Spark reads them as long nanos via
# spark.sql.legacy.parquet.nanosAsLong; we convert to TIMESTAMP_NTZ —
# microsecond floor, matching DuckDB's ns→µs truncation).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# Base-scan memo: spark.read.parquet infers the schema from file footers
# on EVERY call (a driver-side read). Scans are immutable logical plans,
# so reusing one per (session, path, table) is safe and cuts a fixed
# per-query cost that adds up across an 86-query bench run. Keyed on the
# session object so a restarted session never serves stale plans.
_SCAN_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (parquet → pushdown-friendly)."""
    key = (id(spark), sf_dir, name)
    cached = _SCAN_MEMO.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col,
                # integer div — nanos overflow double's 53-bit mantissa
                F.timestamp_micros(F.expr(f"{col} DIV 1000")).cast("timestamp_ntz"),
            )
    if len(_SCAN_MEMO) > 256:  # bound growth across many sessions/dirs
        _SCAN_MEMO.clear()
    _SCAN_MEMO[key] = df
    return df


def fan_out(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition an UNDERSIZED scan up to the cluster's
    default parallelism — identity when the scan already has enough
    splits. Implementation lives in ``dbt_foundation_spark.parallelism``
    (r13: shared with the index build operators); this wrapper keeps the
    historic (spark, df) signature the query catalog uses. See that
    module's docstring for the full rationale and the inputFiles-probe
    note (r4 VERDICT #2: never force plan→RDD conversion at build time).
    """
    from dbt_foundation_spark.parallelism import fan_out as _fan_out

    return _fan_out(df)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for Spark-SQL queries."""
    for name in names or TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def dsum(col: str | Column, alias: str, scale: int = 8) -> Column:
    """Exact (decimal-routed) sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 8) -> Column:
    """Deterministic average: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 8) -> str:
    """DuckDB twin of :func:`dsum`.

    The final decimal→double goes THROUGH VARCHAR: DuckDB's direct
    decimal→double cast is double-rounded (int128→double, then
    /10^scale) and drifts 1 ulp from Spark's correctly-rounded cast
    once sums reach ~1e9 — which sf0.1 totals do (the r7 sf0.1 sweep
    caught 6 queries green at sf0.01 drifting at sf0.1). The varchar
    round-trip renders the exact decimal digits and strtod parses them
    correctly rounded, bit-identical to Spark's Decimal.toDouble, at
    every magnitude — same schema, no output change."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 8) -> str:
    """DuckDB twin of :func:`davg` (varchar-routed like
    :func:`sql_dsum` — the sum feeding the division carries the same
    decimal→double double-rounding hazard)."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS VARCHAR)"
        f" AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
