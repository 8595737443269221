"""dbt_utils 1.3.1 parity — pure Column/DataFrame helpers, zero UDFs.

The reference pins dbt_utils (packages.yml:4-5; README.md:259-266 calls
out surrogate keys, pivots, deduplication, date spines). Every helper
here returns a Column or DataFrame built from pyspark.sql.functions so
the whole surface stays inside Catalyst/whole-stage codegen — the right
trade at 100 TB (a Python UDF here would serialize every row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def generate_surrogate_key(*cols: str | Column) -> Column:
    """dbt_utils.generate_surrogate_key: md5 over null-safe concat.

    Mirrors the macro's semantics: each field cast to string, NULL →
    the literal '_dbt_utils_surrogate_key_null_', joined with '-'.
    """
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("_dbt_utils_surrogate_key_null_"),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def safe_divide(numerator: Column | str, denominator: Column | str) -> Column:
    """NULL (not error/Inf) on zero denominator — Spark's try_divide."""
    n = F.col(numerator) if isinstance(numerator, str) else numerator
    d = F.col(denominator) if isinstance(denominator, str) else denominator
    return F.try_divide(n, d)


def safe_add(*cols: Column | str) -> Column:
    """Treats NULLs as 0 unless all are NULL (dbt_utils semantics)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    total = sum((F.coalesce(c, F.lit(0)) for c in cs[1:]), F.coalesce(cs[0], F.lit(0)))
    all_null = cs[0].isNull()
    for c in cs[1:]:
        all_null = all_null & c.isNull()
    return F.when(all_null, F.lit(None)).otherwise(total)


def safe_subtract(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.when(ca.isNull() & cb.isNull(), F.lit(None)).otherwise(
        F.coalesce(ca, F.lit(0)) - F.coalesce(cb, F.lit(0))
    )


def width_bucket(value, min_value, max_value, num_buckets: int) -> Column:
    """dbt_utils.width_bucket → Spark's native width_bucket."""
    v = F.col(value) if isinstance(value, str) else value
    return F.width_bucket(v, F.lit(min_value), F.lit(max_value), F.lit(num_buckets))


def haversine_distance(lat1, lon1, lat2, lon2, unit: str = "km") -> Column:
    """Great-circle distance; pure arithmetic over radians/sin/cos/asin."""

    def c(x):
        return F.col(x) if isinstance(x, str) else x

    lat1, lon1, lat2, lon2 = c(lat1), c(lon1), c(lat2), c(lon2)
    radius = 6371.0 if unit == "km" else 3958.761416
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * radius) * F.asin(F.sqrt(a))


def get_url_host(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.parse_url(u, F.lit("HOST"))


def get_url_path(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.parse_url(u, F.lit("PATH"))


def get_url_parameter(url: Column | str, parameter: str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.parse_url(u, F.lit("QUERY"), F.lit(parameter))


def slugify(col: Column | str) -> Column:
    """lowercase, non-alnum → '_', collapse repeats, trim edges."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lower(c)
    s = F.regexp_replace(s, r"[^a-z0-9]+", "_")
    return F.regexp_replace(s, r"^_+|_+$", "")


def deduplicate(
    df: DataFrame, partition_by: list[str], order_by: list[Column | str]
) -> DataFrame:
    """dbt_utils.deduplicate: keep exactly one row per key by order.

    row_number over a partitioned window — the shuffle is on the dedup
    key only, and Spark's window TopK pushes the rn==1 filter down.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def date_spine(
    spark: SparkSession, start_date: str, end_date: str, datepart: str = "day"
) -> DataFrame:
    """dbt_utils.date_spine: one row per period in [start, end).

    F.sequence + explode — generated JVM-side, no driver loop; at scale
    explode of a single sequence row is fine for calendar ranges (they
    are small); for huge ranges use spark.range over epoch integers.
    """
    step = {"day": "interval 1 day", "week": "interval 7 day", "month": "interval 1 month",
            "hour": "interval 1 hour"}[datepart]
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_date).cast("date"),
                F.lit(end_date).cast("date"),
                F.expr(step),
            )
        ).alias("date_" + datepart)
    ).filter(F.col("date_" + datepart) < F.lit(end_date).cast("date"))


def generate_series(spark: SparkSession, upper_bound: int) -> DataFrame:
    """dbt_utils.generate_series: integers 1..upper_bound.

    spark.range is a parallel, partitioned source — the 100 TB-safe way
    to generate a series (no single exploded row)."""
    return spark.range(1, upper_bound + 1).select(F.col("id").alias("generated_number"))


def pivot(
    df: DataFrame,
    group_by: list[str],
    pivot_column: str,
    values: list[str],
    agg_column: Column | str,
    agg: str = "sum",
) -> DataFrame:
    """dbt_utils.pivot: explicit value list (required — at 100 TB an
    implicit-values pivot triggers a full distinct scan first)."""
    a = F.col(agg_column) if isinstance(agg_column, str) else agg_column
    return (
        df.groupBy(*group_by)
        .pivot(pivot_column, values)
        .agg(getattr(F, agg)(a))
    )


def unpivot(
    df: DataFrame,
    id_columns: list[str],
    value_columns: list[str],
    name_column: str = "field_name",
    value_column: str = "value",
) -> DataFrame:
    """dbt_utils.unpivot via native UNPIVOT (stack) — JVM-side."""
    return df.unpivot(
        [F.col(c) for c in id_columns],
        [F.col(c) for c in value_columns],
        name_column,
        value_column,
    )
