"""Sequence packing — assemble documents into fixed token-budget
training sequences.

Reference scope: the reference pipeline (dbt-foundation) stops at
relational marts; packing is part of the mandated LLM-pipeline surface
(BASELINE.json Cat D) that a training-data engine needs downstream of
dedup/quality filtering.

Two flavors, one contract (adds ``seq_id`` + ``seq_offset`` columns):

``pack_sequences``
    Contiguous-fill packing via a window cumulative sum:
    ``seq_id = floor((cumsum(tokens) - tokens) / budget)`` over a
    deterministic order. A document whose tokens straddle a budget
    boundary stays in the sequence where it *starts*, so a sequence can
    overflow ``budget`` by up to ``max(doc_tokens) - 1`` — the standard
    SQL-expressible approximation of greedy packing. Fully declarative:
    one shuffle (the window partition), codegen'd arithmetic, and
    replayable in any engine with window functions — which is what lets
    the DuckDB oracle check it row-for-row.

``pack_sequences_greedy``
    Exact first-fit-by-order greedy: a sequence is closed as soon as the
    next document would exceed ``budget`` (oversized documents get a
    sequence of their own). Needs sequential state per group, so it runs
    as an ``applyInPandas`` over the same partition key — the Arrow-batch
    escape hatch for semantics a window can't express.

Scale (100 TB): both flavors shuffle once on the packing partition key.
Pack within real pipeline units (shard/epoch/lang) or pass
``bucket_by=(id_col, n)`` to spread a huge corpus over ``n`` independent
packing groups — sequences never span groups, every group packs in
parallel, and no global window (= single reducer) ever exists.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _free_name(df: DataFrame, base: str) -> str:
    """A helper-column name guaranteed absent from ``df``: ``base``
    itself unless the input already carries it (r10 advice: a literal
    ``_pack_tie`` input column was silently overwritten and then
    dropped from the output).  Deterministic — base, base_0, base_1, …
    — so reruns of the same input produce the same plan."""
    name, i = base, 0
    while name in df.columns:
        name = f"{base}_{i}"
        i += 1
    return name


def _grouping(
    df: DataFrame,
    partition_cols: Sequence[str] | None,
    bucket_by: tuple[str, int] | None,
) -> tuple[DataFrame, list[str], list[str]]:
    """Resolve the packing groups; returns (df, group_cols, added_cols)."""
    group_cols = list(partition_cols or [])
    added: list[str] = []
    if bucket_by is not None:
        id_col, n = bucket_by
        if n < 1:
            raise ValueError(f"bucket count must be >= 1, got {n}")
        # pmod of the numeric id — portable (same result in any engine
        # with integer modulo), unlike hash()-based bucketing.
        bucket = _free_name(df, "_pack_bucket")
        df = df.withColumn(bucket, F.pmod(F.col(id_col).cast("bigint"), F.lit(n)))
        group_cols.append(bucket)
        added.append(bucket)
    if not group_cols:
        raise ValueError(
            "pack_sequences needs partition_cols and/or bucket_by: a global "
            "window is a single-reducer bottleneck at scale"
        )
    return df, group_cols, added


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] | None = None,
    bucket_by: tuple[str, int] | None = None,
) -> DataFrame:
    """Contiguous-fill packing (window cumsum; oracle-replayable).

    Adds ``seq_id`` (0-based within each packing group) and
    ``seq_offset`` (token offset of this document inside its sequence —
    ``cumsum_before mod budget`` for non-straddling documents).

    Dirty token counts (NULL or negative — an upstream counting stage
    that failed or overflowed) get NULL seq_id/seq_offset and consume
    NO budget, identically in this path and the greedy one. NULL was
    already row-local (sum skips it), but a NEGATIVE count previously
    entered the cumsum and shifted every LATER document's offsets in
    the group — corrupt rows poisoning clean rows' packing (probed
    r10). Route NULL-seq_id rows explicitly before export.

    TIED order_cols values resolve through the md5-over-row tiebreak
    (:func:`_pack_tie`) appended to the sort, making the total order
    unique. Without it the default RANGE window frame counted every
    tied PEER's tokens into each peer's own cumsum-before (overlapping
    offsets matching no serial packing), and the greedy path's stable
    sort kept whatever order the shuffle delivered.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    df, group_cols, added = _grouping(df, partition_cols, bucket_by)
    w = Window.partitionBy(*group_cols).orderBy(*order_cols, _pack_tie(df))
    tok = F.when(F.col(tokens_col) >= 0, F.col(tokens_col))  # NULL if dirty
    before = (F.sum(tok).over(w) - tok).cast("bigint")
    out = df.withColumn(
        "seq_id", (before / F.lit(budget)).cast("bigint")
    ).withColumn("seq_offset", before - F.col("seq_id") * F.lit(budget))
    return out.drop(*added) if added else out


def _pack_tie(df: DataFrame):
    """Deterministic tiebreak for packing orders: md5 over the whole
    row's JSON (UTC-rendered timestamps so the hash is session-tz
    independent) — same rerun-stable keeper exact_dedup/cdc_snapshot
    use. Makes any user order_cols a TOTAL order, so the window path's
    RANGE frame has no peers and the greedy path's sort has no
    partition-order-dependent ties."""
    return F.md5(F.to_json(F.struct(*df.columns), {"timeZone": "UTC"}))


def _greedy_pack(pdf: pd.DataFrame, tokens_col: str, budget: int) -> pd.DataFrame:
    seq_ids, offsets = [], []
    seq_id, fill = 0, 0
    for tok in pdf[tokens_col]:
        # dirty count (NULL/negative): NULL placement, no budget use —
        # same contract as pack_sequences (see its docstring); int(tok)
        # on a NULL crashed the whole Arrow batch before (probed r10)
        if pd.isna(tok) or tok < 0:
            seq_ids.append(None)
            offsets.append(None)
            continue
        tok = int(tok)
        if fill > 0 and fill + tok > budget:
            seq_id += 1
            fill = 0
        seq_ids.append(seq_id)
        offsets.append(fill)
        fill += tok
        if fill >= budget:  # full (or oversized single doc): close it
            seq_id += 1
            fill = 0
    pdf = pdf.copy()
    pdf["seq_id"] = pd.array(seq_ids, dtype="Int64")
    pdf["seq_offset"] = pd.array(offsets, dtype="Int64")
    return pdf


def pack_sequences_greedy(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] | None = None,
    bucket_by: tuple[str, int] | None = None,
) -> DataFrame:
    """Exact first-fit greedy packing via ``applyInPandas`` per group.

    Sequences never exceed ``budget`` unless a single document does (an
    oversized document occupies a sequence alone). One shuffle on the
    group key; state per group is O(1) (a running fill counter), the
    Arrow batch is the group's rows ordered by ``order_cols``.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    df, group_cols, added = _grouping(df, partition_cols, bucket_by)
    # same md5 tiebreak as the window path: without it, tied order_cols
    # rows keep whatever order the shuffle delivered into the Arrow
    # batch (mergesort is stable IN that arbitrary order)
    tie = _free_name(df, "_pack_tie")
    df = df.withColumn(tie, _pack_tie(df))
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(df.schema.fields)
        + [StructField("seq_id", LongType()), StructField("seq_offset", LongType())]
    )
    order = list(order_cols) + [tie]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _greedy_pack(pdf.sort_values(order, kind="mergesort"), tokens_col, budget)

    out = df.groupBy(*group_cols).applyInPandas(fn, schema=schema).drop(tie)
    return out.drop(*added) if added else out


def sequence_stats(packed: DataFrame, tokens_col: str, group_cols: Iterable[str]) -> DataFrame:
    """Per-sequence fill stats (docs, tokens) — the packing-efficiency
    audit a pipeline runs after :func:`pack_sequences`."""
    return packed.groupBy(*group_cols, "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("bigint").alias("n_tokens"),
    )


def serpentine_shards(
    df: DataFrame,
    *,
    id_col: str,
    cost_col: str,
    n_shards: int,
    sub_buckets: int = 64,
) -> DataFrame:
    """Cost-balanced shard assignment (training-shard export planning)
    without a global sort.

    Rows are ranked in (``cost_col`` DESC, ``id % sub_buckets``,
    ``id``) order and dealt onto ``n_shards`` shards serpentine-style
    (round g visits shards 0..n-1, round g+1 visits n-1..0) — the
    classic boustrophedon variant of LPT scheduling: shard row counts
    differ by ≤ 1 and cost totals stay near-equal because each
    consecutive pair of rounds gives every shard one "high" and one
    "low" pick of that cost neighborhood.

    The global rank is computed in two bounded phases, never one
    all-rows window:

    - phase A: histogram of (cost value, id-sub-bucket) pair counts —
      one keyed shuffle with map-side combine; its cumulative-offset
      window runs over the HISTOGRAM (≤ distinct_costs × sub_buckets
      rows, metadata-scale), not the corpus.
    - phase B: ``row_number`` partitioned by (cost value, sub-bucket) —
      window state bounded by one value-bucket's ties (the sub-bucket
      split is exactly what keeps million-row tie groups, e.g. every
      empty doc having cost 0, from serializing into one task) — plus
      the phase-A offset.

    The sub-bucket key is ``id % sub_buckets`` (not a hash) so any
    SQL engine replays the identical total order — the DuckDB oracle
    compares against the naive single-window plan. ``id_col`` must be
    numeric and unique; raise ``sub_buckets`` if a single cost value's
    ties could outgrow an executor partition.

    Adds ``shard`` (int, 0-based). One extra keyed shuffle + one
    small-table join versus the undistributable naive plan.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    idc = F.col(id_col)
    keyed = df.withColumn("_sb", (idc % F.lit(sub_buckets)).cast("int"))
    hist = keyed.groupBy(cost_col, "_sb").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(F.col(cost_col).desc(), F.col("_sb").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = hist.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0).cast("bigint"))
    ).select(cost_col, "_sb", "_off")
    w_in = Window.partitionBy(cost_col, "_sb").orderBy(idc.asc())
    # Null-safe equality on the cost key: groupBy and the window both
    # treat NULL cost as its own group (ranked last under desc — Spark
    # and ANSI NULLS LAST agree), but a plain equi-join would silently
    # drop those rows from the shard plan (r4 ADVICE).
    ranked = (
        keyed.join(
            offs.withColumnRenamed(cost_col, "_oc").withColumnRenamed("_sb", "_osb"),
            F.col(cost_col).eqNullSafe(F.col("_oc")) & (F.col("_sb") == F.col("_osb")),
        )
        .drop("_oc", "_osb")
        .withColumn("_rank", F.row_number().over(w_in) + F.col("_off"))
    )
    r0 = F.col("_rank") - 1
    rnd = F.floor(r0 / n_shards)
    pos = r0 % n_shards
    shard = F.when(rnd % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn("shard", shard.cast("int")).drop("_sb", "_off", "_rank")


def export_shards(
    df: DataFrame,
    path: str,
    *,
    shard_col: str = "shard",
    fmt: str = "json",
    files_per_shard: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write a shard-assigned frame (e.g. :func:`serpentine_shards`
    output) as one directory per shard — the physical training-shard
    export a data loader consumes (``shard=N/part-*.json[l]``; Spark's
    json sink IS JSONL: one object per line).

    ``files_per_shard`` controls file granularity via a repartition on
    the shard column (1 → exactly one file per shard locally; at 100 TB
    raise it so single files stay under object-store sweet spots — the
    repartition shuffles once on (shard, salt)). Readers get partition
    pruning on ``shard=`` for free when they re-read with Spark."""
    if fmt not in ("json", "parquet", "csv"):
        raise ValueError(f"unsupported export format: {fmt}")
    out = df
    if files_per_shard == 1:
        out = df.repartition(F.col(shard_col))
    elif files_per_shard > 1:
        # The salt must vary PER ROW within a shard — a function of the
        # shard value alone is constant inside each shard, which would
        # collapse every shard back into one task/file (r4 ADVICE) —
        # and it must be DETERMINISTIC per row content: a shuffle key
        # derived from monotonically_increasing_id()/rand() changes on
        # task retry, and Spark's fetch-failure recomputation then
        # silently duplicates or drops rows (the SPARK-23207 class,
        # which Spark only auto-guards for round-robin repartition).
        # xxhash64 over the row's hashABLE columns is retry-stable
        # (Spark rejects hash() on MAP-typed inputs, so those are
        # excluded; spark_partition_id — also stable under recompute of
        # the same partition — covers the all-maps edge). The explicit
        # partition count stops AQE's small-shuffle coalescing from
        # merging the salted tasks back together on small inputs.
        def _hashable(dt) -> bool:
            from pyspark.sql import types as T

            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
        row_key = (
            F.xxhash64(*[F.col(c) for c in cols])
            if cols
            else F.spark_partition_id().cast("long")
        )
        # materialized via withColumn: the spark_partition_id fallback is
        # classed nondeterministic and would be rejected as a bare
        # repartition expression
        salted = df.withColumn(
            "_fps", F.pmod(row_key, F.lit(files_per_shard)).cast("int")
        )
        out = salted.repartition(
            files_per_shard * 64, F.col(shard_col), F.col("_fps")
        ).drop("_fps")
    writer = out.write.partitionBy(shard_col).mode(mode)
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        writer.parquet(path)
