"""Structured Streaming extension (SURVEY §2.J — Cat D).

The reference is batch-only ELT (its nearest analog is the incremental
materialization family), so this module is the engine's *extension*
surface: the same event-analytics the batch catalog computes over the
``events`` table, expressed as an incremental ``readStream`` pipeline.
Every operator returns an unstarted streaming DataFrame; ``run_*``
helpers attach sinks.

Scale notes baked into the shapes:
- watermarks bound state: a windowed agg without one grows state
  forever at 100 TB/day ingest; every agg here takes ``watermark``.
- file-source micro-batching is governed by maxFilesPerTrigger; state
  shuffles are keyed by (window, group) so AQE/skew handling applies.
- the custom stateful op uses applyInPandasWithState (Arrow-batched) —
  the Spark-native replacement for a hand-rolled state store.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # TIMESTAMP (ltz), not NTZ: watermarks require event-time with a
        # zone; the engine pins the session zone to UTC so they coincide
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(window, event_type) counts+sums; watermark bounds state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select("w.start", "w.end", "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("w.start", "w.end", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-merged) — the streaming twin of the
    batch q_session_window query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("w.start", "w.end", "user_id", "n_events")
    )


def dedup_stream(
    events: DataFrame, keys: Iterable[str] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-per-key stream: state is dropped once the watermark
    passes, so memory is bounded by the late-data horizon, not history."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


_STATE_SCHEMA = "n_events bigint, sum_value double"
_USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, sum_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals that survive
    across micro-batches (applyInPandasWithState, Arrow-batched).

    This is the wiring point for bespoke state machines (sessionization
    with business rules, CDC folding) that windowed aggs can't express.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "update",
) -> None:
    """Drain everything currently available into an in-memory sink table
    named ``query_name``, then stop (the batch-parity test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Append-mode parquet sink — the production-shaped path (exactly-
    once via checkpoint + file-sink manifest)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
