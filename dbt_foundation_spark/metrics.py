"""Semantic layer — declared measures/dimensions compiled to DataFrames.

Reference parity: dbt's semantic layer (dbt-core 1.6+ ``metrics:`` /
MetricFlow semantic models). The reference is a dbt starter on
Snowflake, so its consumers would adopt exactly this surface for
governed metrics; this module re-expresses it Spark-first — every
``query()`` compiles to ONE declarative DataFrame plan that Catalyst
optimizes like any hand-written aggregate (pushdown, partial aggs,
AQE), so a governed metric costs the same as the ad-hoc query it
replaces.

Scope (documented, honest): metrics read ONE semantic model each —
MetricFlow's cross-semantic-model entity joins are out of scope; join
your fact to its dimensions in the model frame (the mart layer the
reference's own structure prescribes) and declare the semantic model
over that. Supported metric types: ``simple`` (filtered aggregation of
a measure), ``ratio`` (numerator/denominator measures), ``derived``
(expression over sibling metrics), ``cumulative`` (running total over
the declared time dimension).

Scale notes: a metric query is group-by + conditional aggregates — one
keyed shuffle with map-side combine. ``cumulative`` adds one window
over the GROUPED frame (rows = |time grain values| × |dimension
combos|, aggregate-scale, not fact-scale) partitioned by the non-time
dimensions — never a window over raw rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_AGGS: dict[str, Callable[[Any], Any]] = {
    "sum": F.sum,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


@dataclass
class Measure:
    name: str
    agg: str
    expr: str  # SQL expression over the semantic model's frame


@dataclass
class Dimension:
    name: str
    expr: str
    is_time: bool = False


@dataclass
class SemanticModel:
    name: str
    frame: Callable[[], DataFrame]  # lazy — resolved at query time
    measures: dict[str, Measure]
    dimensions: dict[str, Dimension]
    primary_time: str | None = None


@dataclass
class Metric:
    name: str
    type: str  # simple | ratio | derived | cumulative
    model: str | None = None
    measure: str | None = None
    numerator: str | None = None
    denominator: str | None = None
    expr: str | None = None  # derived: over sibling metric names
    filter: str | None = None  # SQL predicate over the model frame
    metrics: tuple[str, ...] = ()  # derived inputs
    extra: dict[str, Any] = field(default_factory=dict)


class SemanticLayer:
    """Registry + compiler. Declare semantic models and metrics once;
    ``query()`` answers any (metrics × dimensions) request."""

    def __init__(self) -> None:
        self.models: dict[str, SemanticModel] = {}
        self.metrics: dict[str, Metric] = {}

    # ---------- declaration ----------

    def semantic_model(
        self,
        name: str,
        frame: Callable[[], DataFrame] | DataFrame,
        *,
        measures: dict[str, dict],
        dimensions: dict[str, Any] | None = None,
        primary_time: str | None = None,
    ) -> SemanticModel:
        """``measures``: name → {agg, expr} (expr defaults to the
        measure name; ``count`` with expr '*' counts rows).
        ``dimensions``: name → SQL expr string, or {expr, time: True}.
        ``primary_time`` names the time dimension cumulative metrics
        accumulate over."""
        ms = {
            n: Measure(n, spec.get("agg", "sum"), spec.get("expr", n))
            for n, spec in measures.items()
        }
        for m in ms.values():
            if m.agg not in _AGGS:
                raise ValueError(f"measure {m.name}: unknown agg {m.agg!r}")
        ds: dict[str, Dimension] = {}
        for n, spec in (dimensions or {}).items():
            if isinstance(spec, str):
                ds[n] = Dimension(n, spec)
            else:
                ds[n] = Dimension(n, spec.get("expr", n), bool(spec.get("time")))
        if primary_time is not None and primary_time not in ds:
            raise ValueError(f"primary_time {primary_time!r} is not a dimension")
        sm = SemanticModel(
            name,
            frame if callable(frame) else (lambda f=frame: f),
            ms,
            ds,
            primary_time,
        )
        self.models[name] = sm
        return sm

    def metric(
        self,
        name: str,
        *,
        type: str = "simple",
        model: str | None = None,
        measure: str | None = None,
        numerator: str | None = None,
        denominator: str | None = None,
        expr: str | None = None,
        metrics: tuple[str, ...] = (),
        filter: str | None = None,
    ) -> Metric:
        if type not in ("simple", "ratio", "derived", "cumulative"):
            raise ValueError(f"unknown metric type: {type}")
        if type in ("simple", "cumulative") and not (model and measure):
            raise ValueError(f"{name}: {type} metrics need model= and measure=")
        if type == "ratio" and not (model and numerator and denominator):
            raise ValueError(f"{name}: ratio metrics need numerator/denominator")
        if type == "derived" and not (expr and metrics):
            raise ValueError(f"{name}: derived metrics need expr= and metrics=")
        m = Metric(
            name,
            type,
            model=model,
            measure=measure,
            numerator=numerator,
            denominator=denominator,
            expr=expr,
            metrics=tuple(metrics),
            filter=filter,
        )
        self.metrics[name] = m
        return m

    # ---------- compilation ----------

    def _resolve_model(self, metrics: list[Metric]) -> SemanticModel:
        names = set()
        for m in metrics:
            if m.type == "derived":
                names |= {self.metrics[d].model for d in m.metrics}
            else:
                names.add(m.model)
        names.discard(None)
        if len(names) != 1:
            raise ValueError(
                f"metrics span semantic models {sorted(names)} — queries read "
                "one semantic model (join facts to dims in the model frame)"
            )
        return self.models[names.pop()]

    def _measure_col(self, sm: SemanticModel, measure: str, flt: str | None):
        ms = sm.measures[measure]
        col = F.expr("1") if ms.expr == "*" else F.expr(ms.expr)
        if flt is not None:
            col = F.when(F.expr(flt), col)  # NULL outside the filter:
            # sum/count/avg all ignore NULLs → conditional aggregation
            # without a second scan of the fact
        return _AGGS[ms.agg](col)

    def query(
        self,
        metrics: list[str] | tuple[str, ...],
        *,
        group_by: list[str] | tuple[str, ...] = (),
        where: str | None = None,
        order_by: bool = True,
    ) -> DataFrame:
        """Compile a metric request into one DataFrame.

        ``group_by`` names declared dimensions. ``where`` is a SQL
        predicate over the semantic model's frame (pre-aggregation, so
        it pushes down to the scan). Every requested metric becomes a
        column named after itself."""
        wanted = [self.metrics[m] for m in metrics]
        # derived metrics pull their inputs into the aggregation
        base_needed: list[Metric] = []
        for m in wanted:
            if m.type == "derived":
                base_needed.extend(self.metrics[d] for d in m.metrics)
            else:
                base_needed.append(m)
        sm = self._resolve_model(base_needed)
        frame = sm.frame()
        if where is not None:
            frame = frame.filter(F.expr(where))
        dims = []
        for d in group_by:
            if d not in sm.dimensions:
                raise KeyError(f"unknown dimension {d!r} on {sm.name}")
            dims.append(F.expr(sm.dimensions[d].expr).alias(d))

        aggs = []
        seen: set[str] = set()
        for m in base_needed:
            if m.name in seen:
                continue
            seen.add(m.name)
            if m.type in ("simple", "cumulative"):
                aggs.append(
                    self._measure_col(sm, m.measure, m.filter).alias(m.name)
                )
            elif m.type == "ratio":
                num = self._measure_col(sm, m.numerator, m.filter)
                den = self._measure_col(sm, m.denominator, m.filter)
                aggs.append((num / den).alias(m.name))
        out = frame.groupBy(*dims).agg(*aggs) if dims else frame.agg(*aggs)

        cum = [m for m in base_needed if m.type == "cumulative"]
        if cum:
            if sm.primary_time is None or sm.primary_time not in group_by:
                raise ValueError(
                    "cumulative metrics need the semantic model's primary_time "
                    f"({sm.primary_time!r}) in group_by"
                )
            others = [d for d in group_by if d != sm.primary_time]
            w = (
                Window.partitionBy(*others)
                .orderBy(F.col(sm.primary_time).asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            for m in cum:
                # A running total only equals re-aggregating the raw rows
                # up to each period when the measure's agg DISTRIBUTES
                # over the per-period partials: sum/count accumulate with
                # sum, min/max with min/max. avg / count_distinct do not
                # (a sum of monthly averages is not a running average), so
                # those are rejected rather than silently miscomputed.
                agg = sm.measures[m.measure].agg
                if agg in ("sum", "count"):
                    out = out.withColumn(m.name, F.sum(m.name).over(w))
                elif agg in ("min", "max"):
                    out = out.withColumn(m.name, _AGGS[agg](F.col(m.name)).over(w))
                else:
                    raise ValueError(
                        f"{m.name}: cumulative metrics require a "
                        f"distributive measure agg (sum/count/min/max), "
                        f"got {agg!r}"
                    )

        for m in wanted:
            if m.type == "derived":
                out = out.withColumn(m.name, F.expr(m.expr))
        out = out.select(*group_by, *[m.name for m in wanted])
        if order_by and group_by:
            out = out.orderBy(*group_by)
        return out

    def query_stream(
        self,
        metrics: list[str] | tuple[str, ...],
        *,
        time_col: str,
        window: str,
        slide: str | None = None,
        watermark: str = "0 seconds",
        group_by: list[str] | tuple[str, ...] = (),
    ) -> DataFrame:
        """Streaming twin of :meth:`query`: the SAME metric
        declarations compile onto a streaming frame as a watermarked
        windowed aggregation — one definition serves the batch mart and
        the live dashboard (the semantic-layer promise, Spark-first:
        Structured Streaming's incremental aggregation state is bounded
        by the watermark, so this runs forever at any rate).

        The semantic model's frame must be a streaming DataFrame
        (``spark.readStream...``). ``window``/``slide`` are duration
        strings (tumbling when ``slide`` is omitted). ``cumulative``
        metrics are batch-only (an unbounded running total has no
        watermark to bound its state) and are rejected."""
        wanted = [self.metrics[m] for m in metrics]
        base_needed: list[Metric] = []
        for m in wanted:
            if m.type == "cumulative":
                raise ValueError(
                    f"{m.name}: cumulative metrics are batch-only — a "
                    "streaming running total would keep unbounded state"
                )
            if m.type == "derived":
                base_needed.extend(self.metrics[d] for d in m.metrics)
            else:
                base_needed.append(m)
        sm = self._resolve_model(base_needed)
        frame = sm.frame().withWatermark(time_col, watermark)
        dims = [
            F.expr(sm.dimensions[d].expr).alias(d) for d in group_by
        ]
        aggs = []
        seen: set[str] = set()
        for m in base_needed:
            if m.name in seen:
                continue
            seen.add(m.name)
            if m.type == "simple":
                aggs.append(
                    self._measure_col(sm, m.measure, m.filter).alias(m.name)
                )
            elif m.type == "ratio":
                num = self._measure_col(sm, m.numerator, m.filter)
                den = self._measure_col(sm, m.denominator, m.filter)
                aggs.append((num / den).alias(m.name))
        win = (
            F.window(time_col, window, slide) if slide else F.window(time_col, window)
        )
        out = frame.groupBy(win, *dims).agg(*aggs)
        for m in wanted:
            if m.type == "derived":
                out = out.withColumn(m.name, F.expr(m.expr))
        return out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_by,
            *[m.name for m in wanted],
        )
