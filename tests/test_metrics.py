"""Semantic-layer unit tests (metrics.py): each metric type against a
hand-computed expectation, plus the declared error contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_foundation_spark.metrics import SemanticLayer


@pytest.fixture()
def layer(spark):
    df = spark.createDataFrame(
        [
            # (day, region, amount, is_promo)
            ("2024-01-01", "NA", 10.0, 1),
            ("2024-01-01", "NA", 20.0, 0),
            ("2024-01-01", "EU", 5.0, 1),
            ("2024-01-02", "NA", 40.0, 0),
            ("2024-01-02", "EU", 15.0, 1),
        ],
        "day string, region string, amount double, is_promo int",
    )
    sl = SemanticLayer()
    sl.semantic_model(
        "sales",
        df,
        measures={
            "amount": {"agg": "sum"},
            "n": {"agg": "count", "expr": "*"},
        },
        dimensions={"day": {"expr": "day", "time": True}, "region": "region"},
        primary_time="day",
    )
    sl.metric("total", model="sales", measure="amount")
    sl.metric(
        "promo_total", model="sales", measure="amount", filter="is_promo = 1"
    )
    sl.metric(
        "aov", type="ratio", model="sales", numerator="amount", denominator="n"
    )
    sl.metric(
        "promo_share",
        type="derived",
        expr="promo_total / total",
        metrics=("promo_total", "total"),
    )
    sl.metric("running", type="cumulative", model="sales", measure="amount")
    return sl


def test_simple_filtered_ratio_derived(layer):
    rows = {
        r["region"]: r
        for r in layer.query(
            ["total", "promo_total", "aov", "promo_share"], group_by=["region"]
        ).collect()
    }
    assert rows["NA"]["total"] == 70.0
    assert rows["NA"]["promo_total"] == 10.0
    assert rows["NA"]["aov"] == pytest.approx(70.0 / 3)
    assert rows["NA"]["promo_share"] == pytest.approx(1 / 7)
    assert rows["EU"]["total"] == 20.0
    assert rows["EU"]["promo_total"] == 20.0


def test_grand_total_no_dims(layer):
    row = layer.query(["total", "aov"]).collect()[0]
    assert row["total"] == 90.0
    assert row["aov"] == pytest.approx(18.0)


def test_cumulative_partitions_by_other_dims(layer):
    rows = layer.query(
        ["total", "running"], group_by=["day", "region"]
    ).collect()
    got = {(r["day"], r["region"]): r["running"] for r in rows}
    assert got[("2024-01-01", "NA")] == 30.0
    assert got[("2024-01-02", "NA")] == 70.0  # NA accumulates NA only
    assert got[("2024-01-01", "EU")] == 5.0
    assert got[("2024-01-02", "EU")] == 20.0


def test_cumulative_agg_semantics(layer, spark):
    """Cumulative metrics honor the measure's agg where it distributes
    (min/max re-aggregate the per-period partials) and reject aggs that
    don't (avg: a sum of daily averages is not a running average) —
    r4 ADVICE fix."""
    sl = layer
    sl.semantic_model(
        "obs",
        spark.createDataFrame(
            [("2024-01-01", 5.0), ("2024-01-01", 9.0), ("2024-01-02", 3.0)],
            "day string, v double",
        ),
        measures={
            "vmin": {"agg": "min", "expr": "v"},
            "vavg": {"agg": "avg", "expr": "v"},
        },
        dimensions={"day": {"expr": "day", "time": True}},
        primary_time="day",
    )
    sl.metric("running_min", type="cumulative", model="obs", measure="vmin")
    got = {
        r["day"]: r["running_min"]
        for r in sl.query(["running_min"], group_by=["day"]).collect()
    }
    assert got == {"2024-01-01": 5.0, "2024-01-02": 3.0}

    sl.metric("running_avg", type="cumulative", model="obs", measure="vavg")
    with pytest.raises(ValueError, match="distributive"):
        sl.query(["running_avg"], group_by=["day"]).collect()


def test_where_pushes_into_frame(layer):
    row = layer.query(["total"], where="region = 'EU'").collect()[0]
    assert row["total"] == 20.0


def test_error_contracts(layer, spark):
    with pytest.raises(ValueError, match="primary_time"):
        layer.query(["running"], group_by=["region"]).collect()
    with pytest.raises(KeyError, match="unknown dimension"):
        layer.query(["total"], group_by=["nope"])
    with pytest.raises(ValueError, match="unknown metric type"):
        layer.metric("bad", type="median", model="sales", measure="amount")
    with pytest.raises(ValueError, match="need model"):
        layer.metric("bad2")
    # cross-semantic-model queries are rejected, not silently joined
    other = spark.createDataFrame([("x", 1.0)], "k string, v double")
    layer.semantic_model("other", other, measures={"v": {"agg": "sum"}})
    layer.metric("other_v", model="other", measure="v")
    with pytest.raises(ValueError, match="span semantic models"):
        layer.query(["total", "other_v"])
