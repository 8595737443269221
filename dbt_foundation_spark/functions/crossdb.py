"""dbt cross-database macro surface (the ``dbt.*`` dispatch macros every
adapter ships — dateadd, datediff, date_trunc, last_day, split_part,
listagg, …) re-expressed as Spark Column builders.

The reference project runs on dbt-Snowflake, whose models may call any
of these via ``{{ dbt.datediff(...) }}``; a user porting models to this
engine gets the same names with the same (Snowflake-flavored) semantics:

- ``datediff`` counts DATE-PART BOUNDARIES CROSSED (Snowflake manual:
  "the number of date part boundaries", not elapsed intervals) — so
  datediff('year', Dec 31, Jan 1) == 1.
- ``dateadd`` adds N date parts, preserving the input type.
- ``listagg`` is ordered string aggregation.

Everything is a pure Column expression (whole-stage codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_PARTS = ("year", "quarter", "month", "week", "day", "hour", "minute", "second")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dateadd(datepart: str, interval: int, col: Column | str) -> Column:
    """dbt.dateadd: add N dateparts, preserving the input type
    (Snowflake behavior): DATE + date part stays DATE; TIMESTAMP keeps
    its time-of-day (incl. fractional seconds); time parts promote DATE
    to TIMESTAMP. Interval arithmetic (``col + make_interval(...)``)
    gives exactly these typing rules in Spark — add_months/date_add
    would silently return DATE for timestamp inputs."""
    p = datepart.lower()
    c = _c(col)
    months = {"year": 12, "quarter": 3, "month": 1}
    if p in months:
        return c + F.make_interval(months=F.lit(months[p] * interval))
    if p in ("week", "day"):
        days = (7 if p == "week" else 1) * interval
        return c + F.make_interval(days=F.lit(days))
    if p in ("hour", "minute", "second"):
        # date + sub-day interval throws in Spark; the explicit cast is
        # the promotion Snowflake applies implicitly
        seconds = {"hour": 3600, "minute": 60, "second": 1}[p] * interval
        return c.cast("timestamp") + F.make_interval(secs=F.lit(seconds))
    raise ValueError(f"dateadd: unknown datepart {datepart!r}")


def datediff(datepart: str, start: Column | str, end: Column | str) -> Column:
    """dbt.datediff: count datepart BOUNDARIES crossed between start and
    end (Snowflake semantics; DuckDB's date_diff matches, so results are
    cross-engine checkable)."""
    p = datepart.lower()
    s, e = _c(start), _c(end)
    if p == "year":
        return (F.year(e) - F.year(s)).cast("bigint")
    if p == "quarter":
        return ((F.year(e) - F.year(s)) * 4 + (F.quarter(e) - F.quarter(s))).cast("bigint")
    if p == "month":
        return ((F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))).cast("bigint")
    if p == "week":
        # boundaries crossed = whole weeks between week-starts (Monday)
        return (
            F.datediff(F.date_trunc("week", e), F.date_trunc("week", s)) / 7
        ).cast("bigint")
    if p == "day":
        return F.datediff(e.cast("date"), s.cast("date")).cast("bigint")
    if p in ("hour", "minute", "second"):
        unit = {"hour": 3600, "minute": 60, "second": 1}[p]
        trunc = {"hour": "hour", "minute": "minute", "second": "second"}[p]
        return (
            (
                F.date_trunc(trunc, e).cast("long")
                - F.date_trunc(trunc, s).cast("long")
            )
            / unit
        ).cast("bigint")
    raise ValueError(f"datediff: unknown datepart {datepart!r}")


def date_trunc(datepart: str, col: Column | str) -> Column:
    """dbt.date_trunc (Spark's date_trunc already matches)."""
    if datepart.lower() not in _DATE_PARTS:
        raise ValueError(f"date_trunc: unknown datepart {datepart!r}")
    return F.date_trunc(datepart.lower(), _c(col))


def last_day(col: Column | str, datepart: str = "month") -> Column:
    """dbt.last_day: last day of the month/quarter/year containing col."""
    p = datepart.lower()
    if p == "month":
        return F.last_day(_c(col))
    if p in ("quarter", "year"):
        months = {"quarter": 3, "year": 12}[p]
        return F.date_add(F.add_months(F.date_trunc(p, _c(col)).cast("date"), months), -1)
    raise ValueError(f"last_day: unsupported datepart {datepart!r}")


def split_part(col: Column | str, delimiter: str, part: int) -> Column:
    """dbt.split_part (1-indexed; negative counts from the end)."""
    if part == 0:
        raise ValueError("split_part is 1-indexed; part must be non-zero")
    parts = F.split(_c(col), F.lit(delimiter), F.lit(-1))
    idx = F.lit(part) if part > 0 else F.greatest(F.size(parts) + part + 1, F.lit(0))
    return F.coalesce(F.try_element_at(parts, idx), F.lit(""))


def concat(*cols: Column | str) -> Column:
    """dbt.concat (NULL-propagating, Snowflake CONCAT behavior)."""
    return F.concat(*[_c(c) for c in cols])


def hash_(col: Column | str) -> Column:
    """dbt.hash: md5 of the stringified value, NULL-propagating (dbt's
    hash macro and Snowflake md5 both return NULL for NULL — coalescing
    here would hash-collide NULL with ''; NULL-safe coalescing belongs
    to generate_surrogate_key only)."""
    return F.md5(_c(col).cast("string"))


def any_value(col: Column | str) -> Column:
    return F.any_value(_c(col))


def bool_or(col: Column | str) -> Column:
    return F.bool_or(_c(col))


def listagg(
    col: Column | str,
    delimiter: str = ",",
    order_by: Column | str | None = None,
) -> Column:
    """dbt.listagg: ordered string aggregation. Deterministic output
    requires order_by (sorted by that key, then by value)."""
    c = _c(col).cast("string")
    if order_by is None:
        return F.array_join(F.array_sort(F.collect_list(c)), delimiter)
    pair = F.struct(_c(order_by).alias("k"), c.alias("v"))
    return F.array_join(
        F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"]), delimiter
    )


def position(substring: Column | str, col: Column | str) -> Column:
    """dbt.position: 1-based index of substring (0 when absent)."""
    sub = _c(substring) if not isinstance(substring, str) else F.lit(substring)
    return F.instr(_c(col), sub)


def right(col: Column | str, n: int) -> Column:
    return F.when(F.lit(n) <= 0, F.lit("")).otherwise(
        F.substring(_c(col), -n, n)
    )


def left(col: Column | str, n: int) -> Column:
    return F.substring(_c(col), 1, n)


def length(col: Column | str) -> Column:
    return F.length(_c(col))


def replace(col: Column | str, old: str, new: str) -> Column:
    return F.replace(_c(col), F.lit(old), F.lit(new))


def cast_bool_to_text(col: Column | str) -> Column:
    """dbt.cast_bool_to_text: lowercase 'true'/'false'/NULL."""
    return _c(col).cast("string")


def safe_cast(col: Column | str, dtype: str) -> Column:
    """dbt.safe_cast: NULL on failure (Spark try_cast)."""
    return _c(col).try_cast(dtype)


def escape_single_quotes(value: str) -> str:
    """dbt.escape_single_quotes (string literal helper)."""
    return value.replace("'", "''")


def string_literal(value: str) -> str:
    """dbt.string_literal: quoted SQL literal of a Python string."""
    return f"'{escape_single_quotes(value)}'"


def array_construct(*cols: Column | str) -> Column:
    return F.array(*[_c(c) for c in cols])


def array_append(arr: Column | str, elem: Column | str) -> Column:
    return F.array_append(_c(arr), _c(elem))


def array_concat(a: Column | str, b: Column | str) -> Column:
    return F.concat(_c(a), _c(b))


def regexp_instr(col: Column | str, pattern: str) -> Column:
    """dbt.regexp_instr: 1-based position of the first regex match
    (0 when absent) — Spark's builtin since 3.5."""
    return F.regexp_instr(_c(col), F.lit(pattern))
