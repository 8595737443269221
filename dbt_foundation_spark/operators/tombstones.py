"""Tombstone log — logical takedown for persisted indexes.

A 100 TB corpus index (operators/dedup_index.py, the IVF index in
operators/similarity.py) cannot be rebuilt per takedown request, and
parquet cannot delete rows in place. The scalable pattern is the one
Delta/Iceberg delete files implement, expressed here with plain
parquet (same store-agnostic stance as the rest of the index family):

- :func:`retract_from_index` appends the retracted doc ids to a tiny
  ``{path}/tombstones`` dataset — O(takedown batch), no index rewrite;
- every read path (``dedup_against_*``, ``containment_against_index``,
  IVF search / k-NN join / list profile) subtracts the log with a
  broadcast anti-join (:func:`subtract_tombstones`) — takedown logs
  are MB-scale next to a TB-scale index, so the join never shuffles
  the index side, and an index with no log gets back the UNWRAPPED
  scan (zero plan change on the common path);
- ``maintenance.compact_index`` folds the deletions physically (the
  rewrite it was already doing anti-joins the log) and clears the log.
  The fold is idempotent: a crash after some sub-datasets folded
  leaves the log in place, re-subtracting matches nothing on the
  already-folded datasets, and the next compaction finishes the job;
- every ``build_*`` clears the log when it completes — a rebuild is a
  fresh corpus, and a stale log would silently hide recycled ids. The
  clear runs at the END of the build, with the manifest write: a
  build that crashes mid-way leaves mixed-generation datasets
  regardless of the log, and the recovery contract is the same as
  compaction's — RE-RUN the build (clearing at the start instead
  would make a crashed rebuild silently resurrect retracted docs,
  the worse failure for takedown compliance).

Re-admission rule: a tombstone hides EVERY row with that id, including
rows appended after the retraction. That is the correct takedown
semantics (the id is dead until explicitly revived); re-admitting a
retracted id requires :func:`clear_tombstones` first. New documents
that merely RESEMBLE retracted content are unaffected — they carry
their own ids, and the subtraction removes the retracted docs from the
dedup candidates, so retraction never blocks future admissions.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_UNSET = object()  # sentinel: subtract_tombstones should read the log


def _tomb_path(index_path: str) -> str:
    return f"{index_path.rstrip('/')}/tombstones"


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def read_tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The retracted-id set (one ``id`` column, distinct), or ``None``
    when the index has no tombstones — callers use ``None`` to skip the
    anti-join entirely, keeping the no-takedown plan unchanged."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(_tomb_path(index_path))
    except AnalysisException:
        return None
    return df.select("id").distinct()


def subtract_tombstones(
    spark: SparkSession,
    index_path: str,
    df: DataFrame,
    id_col: str,
    tomb: DataFrame | None | object = _UNSET,
) -> DataFrame:
    """``df`` minus rows whose ``id_col`` is tombstoned. Broadcast
    left-anti: the log is bounded by takedown volume, never corpus
    size, so the index side neither shuffles nor re-clusters.

    Callers that subtract from SEVERAL sub-datasets in one query pass
    ``tomb=read_tombstones(...)`` so the log's file listing runs once
    per query, not once per dataset."""
    if tomb is _UNSET:
        tomb = read_tombstones(spark, index_path)
    if tomb is None:
        return df
    return df.join(
        F.broadcast(tomb.withColumnRenamed("id", "__tomb_id")),
        on=F.col(id_col) == F.col("__tomb_id"),
        how="left_anti",
    )


def _as_id_df(spark: SparkSession, ids: DataFrame | Iterable) -> DataFrame | None:
    """Normalize a DataFrame-or-iterable of ids to a single distinct
    ``id`` column, or None for an empty iterable. A caller DataFrame is
    pinned with an eager localCheckpoint: the count and the write that
    follow must see the SAME rows even when the plan is
    nondeterministic (``suspect_docs.sample(...)``) — the hazard
    ``knn_join_ivf`` pins the same way for its prune filter."""
    if isinstance(ids, DataFrame):
        if len(ids.columns) != 1:
            raise ValueError(
                f"ids must be a single-column DataFrame, got {ids.columns}"
            )
        # NULL ids can never match a row (NULL equality) — logging them
        # would inflate the reported count and bloat the log for nothing
        norm = ids.toDF("id").where(F.col("id").isNotNull()).distinct()
        return norm.localCheckpoint(eager=True)
    vals = [v for v in ids if v is not None]
    if not vals:
        return None
    return spark.createDataFrame([(v,) for v in vals], ["id"]).distinct()


def _type_category(t: str) -> str:
    if any(
        t.startswith(p)
        for p in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
    ):
        return "numeric"
    if t in ("string", "varchar", "char") or t.startswith(("varchar", "char")):
        return "string"
    return t


def _index_id_type(spark: SparkSession, index_path: str) -> str | None:
    """The index's document-id type, derived from its stored datasets
    (flavor via manifest; dedup flavors key by ``id``, the IVF lists
    keep the builder's names). None when underivable (pre-manifest
    index, or datasets not yet written)."""
    from pyspark.errors import AnalysisException

    from dbt_foundation_spark.operators.dedup_index import (
        INDEX_LAYOUT,
        _read_manifest,
    )

    mft = _read_manifest(spark, index_path)
    flavor = (mft or {}).get("flavor")
    if flavor not in INDEX_LAYOUT:
        return None
    for sub in INDEX_LAYOUT[flavor]:
        try:
            schema = spark.read.parquet(f"{index_path}/{sub}").schema
        except AnalysisException:
            continue
        if flavor == "ivf":
            if sub != "lists":
                continue
            from dbt_foundation_spark.operators.similarity import ivf_id_col

            return schema[ivf_id_col(schema)].dataType.simpleString()
        if "id" in schema.names:
            return schema["id"].dataType.simpleString()
    return None


def _conform_id_type(
    spark: SparkSession, index_path: str, tomb: DataFrame
) -> DataFrame:
    """Pin the batch's id type to the log's (or, for a first batch, the
    index's). Without this, a bigint batch followed by a string batch
    leaves the log's parquet files with conflicting schemas — every
    later read breaks — and a non-coercible mismatch would make the
    anti-join match nothing while the retraction still reported
    success. Same-category mismatches (int batch, bigint index) are
    CAST to the target; cross-category mismatches raise."""
    existing = read_tombstones(spark, index_path)
    target = (
        existing.schema["id"].dataType.simpleString()
        if existing is not None
        else _index_id_type(spark, index_path)
    )
    got = tomb.schema["id"].dataType.simpleString()
    if target is None or got == target:
        return tomb
    if _type_category(got) != _type_category(target):
        raise ValueError(
            f"{index_path}: retraction ids are {got} but the index keys "
            f"documents by {target} — a takedown with the wrong id type "
            "would silently remove nothing"
        )
    return tomb.select(F.col("id").cast(target).alias("id"))


def retract_from_index(
    spark: SparkSession, index_path: str, ids: DataFrame | Iterable
) -> int:
    """Logically delete documents from a persisted index (takedown /
    contamination removal / license revocation). Appends the ids to the
    tombstone log and returns how many distinct ids the batch carried;
    physical removal happens at the next ``compact_index``.

    ``ids``: a single-column DataFrame (any id type matching the
    index's) or a plain Python iterable of id values."""
    base = index_path.rstrip("/")
    p, fs = _hadoop(spark, base)
    if not fs.exists(p):
        raise ValueError(
            f"{base} does not exist — refusing to start a tombstone log "
            "at a path that holds no index (typo guard)"
        )
    tomb = _as_id_df(spark, ids)
    if tomb is None:
        return 0
    n = tomb.count()
    if n == 0:
        return 0
    tomb = _conform_id_type(spark, base, tomb)
    # coalesce(1): one takedown batch = one small file; the log is
    # bounded by takedown volume and cleared at every compaction, so
    # file count never accumulates past compaction cadence.
    tomb.coalesce(1).write.mode("append").parquet(_tomb_path(base))
    return n


def clear_tombstones(
    spark: SparkSession, index_path: str, ids: DataFrame | Iterable | None = None
) -> int:
    """Drop the whole tombstone log (``ids=None`` — what compaction
    does after folding, and what a completed rebuild does) or revive a
    subset of retracted ids so they can be re-admitted. Returns the
    number of ids removed from the log.

    The subset rewrite collects the surviving log to the driver — safe
    by the same bound the broadcast subtraction relies on: the log is
    takedown-sized, not corpus-sized."""
    existing = read_tombstones(spark, index_path)
    if existing is None:
        return 0
    tp = _tomb_path(index_path)
    p, fs = _hadoop(spark, tp)
    if ids is None:
        n = existing.count()
        fs.delete(p, True)
        return n
    revive = _as_id_df(spark, ids)
    if revive is None:
        return 0
    keep = existing.join(F.broadcast(revive), "id", "left_anti")
    kept_rows = keep.collect()  # bounded: takedown-sized log
    removed = existing.count() - len(kept_rows)
    fs.delete(p, True)
    if kept_rows:
        spark.createDataFrame(kept_rows, existing.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tp)
    return removed
