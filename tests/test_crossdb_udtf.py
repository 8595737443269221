"""Cross-database macro surface (dbt.* dispatch twins) + UDTF extension
point — unit semantics beyond the oracle-checked catalog queries."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dbt_foundation_spark.functions import crossdb as C


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_datediff_counts_boundaries(spark):
    """Snowflake semantics: boundaries crossed, not elapsed intervals."""
    a = F.lit("2023-12-31").cast("date")
    b = F.lit("2024-01-01").cast("date")
    assert _one(spark, C.datediff("year", a, b)) == 1
    assert _one(spark, C.datediff("month", a, b)) == 1
    assert _one(spark, C.datediff("quarter", a, b)) == 1
    assert _one(spark, C.datediff("day", a, b)) == 1
    # within the same month: zero month boundaries
    c = F.lit("2024-01-31").cast("date")
    assert _one(spark, C.datediff("month", b, c)) == 0
    # reversed arguments go negative
    assert _one(spark, C.datediff("day", b, a)) == -1
    with pytest.raises(ValueError):
        C.datediff("fortnight", a, b)


def test_dateadd_clamps_month_end(spark):
    jan31 = F.lit("2024-01-31").cast("date")
    assert _one(spark, C.dateadd("month", 1, jan31)) == datetime.date(2024, 2, 29)
    assert _one(spark, C.dateadd("year", 1, jan31)) == datetime.date(2025, 1, 31)
    assert _one(spark, C.dateadd("week", 2, jan31)) == datetime.date(2024, 2, 14)
    ts = _one(spark, C.dateadd("hour", 3, F.lit("2024-01-31 22:30:00").cast("timestamp")))
    assert ts == datetime.datetime(2024, 2, 1, 1, 30)


def test_dateadd_preserves_input_type(spark):
    # Snowflake semantics: TIMESTAMP input keeps its time-of-day (incl.
    # fractional seconds) under date parts; DATE stays DATE; time parts
    # promote DATE to TIMESTAMP.
    ts = F.lit("2024-01-31 22:30:00.123456").cast("timestamp")
    got = _one(spark, C.dateadd("day", 1, ts))
    assert got == datetime.datetime(2024, 2, 1, 22, 30, 0, 123456)
    got = _one(spark, C.dateadd("month", 1, ts))
    assert got == datetime.datetime(2024, 2, 29, 22, 30, 0, 123456)
    got = _one(spark, C.dateadd("second", 1, ts))
    assert got == datetime.datetime(2024, 1, 31, 22, 30, 1, 123456)
    d = F.lit("2024-01-31").cast("date")
    assert _one(spark, C.dateadd("day", 1, d)) == datetime.date(2024, 2, 1)
    promoted = _one(spark, C.dateadd("hour", 3, d))
    assert promoted == datetime.datetime(2024, 1, 31, 3, 0)


def test_last_day_quarter_year(spark):
    d = F.lit("2024-05-17").cast("date")
    assert _one(spark, C.last_day(d)) == datetime.date(2024, 5, 31)
    assert _one(spark, C.last_day(d, "quarter")) == datetime.date(2024, 6, 30)
    assert _one(spark, C.last_day(d, "year")) == datetime.date(2024, 12, 31)


def test_split_part_indexing(spark):
    s = F.lit("a-b-c")
    assert _one(spark, C.split_part(s, "-", 1)) == "a"
    assert _one(spark, C.split_part(s, "-", 3)) == "c"
    assert _one(spark, C.split_part(s, "-", -1)) == "c"
    assert _one(spark, C.split_part(s, "-", 4)) == ""  # past the end
    with pytest.raises(ValueError):
        C.split_part(s, "-", 0)


def test_string_and_cast_helpers(spark):
    assert C.escape_single_quotes("it's") == "it''s"
    assert C.string_literal("it's") == "'it''s'"
    assert _one(spark, C.safe_cast(F.lit("12x"), "int")) is None
    assert _one(spark, C.safe_cast(F.lit("12"), "int")) == 12
    assert _one(spark, C.cast_bool_to_text(F.lit(True))) == "true"
    assert _one(spark, C.right(F.lit("abcdef"), 2)) == "ef"
    assert _one(spark, C.left(F.lit("abcdef"), 2)) == "ab"
    assert _one(spark, C.right(F.lit("abcdef"), 0)) == ""
    assert _one(spark, C.regexp_instr(F.lit("xxab12"), r"[0-9]+")) == 5
    assert _one(spark, C.regexp_instr(F.lit("xxab"), r"[0-9]+")) == 0
    # dbt.hash / Snowflake md5 propagate NULL (coalescing to '' would
    # hash-collide NULL with the empty string)
    assert _one(spark, C.hash_(F.lit(None).cast("string"))) is None
    assert _one(spark, C.hash_(F.lit("x"))) == _one(spark, F.md5(F.lit("x")))


def test_udtf_registration_and_lateral(spark):
    from dbt_foundation_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "alpha beta gamma delta", "http://x.io/p?a=1&b=two"), (2, None, "http://x.io/p")],
        "id int, txt string, url string",
    ).createOrReplaceTempView("udtf_in")
    chunks = spark.sql(
        "SELECT t.id, c.chunk_idx, c.chunk_text "
        "FROM udtf_in t, LATERAL text_chunks(t.txt, 3, 2) c"
    ).collect()
    got = {(r.id, r.chunk_idx, r.chunk_text) for r in chunks}
    assert got == {(1, 0, "alpha beta gamma"), (1, 1, "gamma delta")}
    params = spark.sql(
        "SELECT t.id, p.param, p.value FROM udtf_in t, LATERAL url_params(t.url) p"
    ).collect()
    assert {(r.id, r.param, r.value) for r in params} == {(1, "a", "1"), (1, "b", "two")}


def test_get_column_values_and_query_dict(spark, sf_dir):
    from dbt_foundation_spark.ops import (
        get_column_values,
        get_filtered_columns_in_relation,
        get_query_results_as_dict,
    )
    from dbt_foundation_spark.queries._util import t

    nation = t(spark, sf_dir, "nation")
    vals = get_column_values(nation, "n_regionkey")
    assert sorted(vals) == [0, 1, 2, 3, 4]
    top2 = get_column_values(nation, "n_regionkey", max_records=2)
    assert len(top2) == 2
    assert get_filtered_columns_in_relation(nation, ["n_comment"]) == [
        "n_nationkey", "n_name", "n_regionkey",
    ]
    nation.createOrReplaceTempView("nation_v")
    d = get_query_results_as_dict(
        spark, "SELECT n_regionkey, COUNT(*) AS n FROM nation_v GROUP BY 1 ORDER BY 1"
    )
    assert d["n_regionkey"] == [0, 1, 2, 3, 4] and sum(d["n"]) == 25


def test_trimmed_mean_udaf(spark):
    import math

    from dbt_foundation_spark.functions.udaf import trimmed_mean_10

    rows = [("a", float(x)) for x in range(1, 11)] + [("a", 1000.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {
        r["grp"]: r["tm"]
        for r in df.groupBy("grp").agg(trimmed_mean_10("v").alias("tm")).collect()
    }
    # group a: values 1..10 + outlier 1000; 10th/90th pct of the 11
    # values are 2.0/10.0 -> mean(2..10) = 6.0; the outlier is trimmed
    assert math.isclose(got["a"], 6.0, rel_tol=1e-12)
    assert math.isclose(got["b"], 5.0, rel_tol=1e-12)


def test_gini_udaf(spark):
    import math

    from dbt_foundation_spark.functions.udaf import gini_coefficient

    rows = [("eq", 1.0)] * 4 + [("conc", 0.0), ("conc", 0.0), ("conc", 0.0), ("conc", 8.0)]
    df = spark.createDataFrame([(g, v) for g, v in rows], "grp string, v double")
    got = {
        r["grp"]: r["g"]
        for r in df.groupBy("grp").agg(gini_coefficient("v").alias("g")).collect()
    }
    assert math.isclose(got["eq"], 0.0, abs_tol=1e-12)      # uniform
    assert math.isclose(got["conc"], 0.75, rel_tol=1e-12)   # 1 of 4 holds all
