"""Driver-local DataFrames without the 32-slice pickle tax.

``spark.createDataFrame(list, schema)`` slices local data into
``defaultParallelism`` pickled partitions, and every action fetches each
slice from the Python driver through its own socket round-trip. Measured
on local[32] (Spark 4.1, r13 optimization round): a 16-row frame costs
~0.4-0.5 s per parallel action and ~5-7 s under ``coalesce(1)`` — the
coalesced task fetches all 32 slices SERIALLY. The engine builds many
such frames (index manifests, centroid tables, retraction batches,
framework-query result snapshots, literal seed relations), so the fixed
cost multiplies across the catalog.

Routing the same rows through a pandas DataFrame hands the JVM one
Arrow batch instead (1-2 partitions): measured 0.04 s collect /
0.09 s ``coalesce(1).count()`` / 0.16 s single-file parquet write for
the same 16 rows. :func:`local_frame` is that route, with a guarded
fallback to the classic path for types whose pandas round-trip is not
trivially lossless (binary, struct, map, date/timestamp) — callers on
those schemas keep today's exact behavior.

At 100 TB nothing changes: these frames are metadata-scale by
construction (manifests, centroids, bounded id batches); the win is
removing a per-operation constant, not a scaling term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Types whose list→pandas→Arrow round-trip is NOT obviously identical
# to the classic pickle path (tz semantics, nested conversion, binary
# width). Schemas containing any of these fall back to the classic
# ``createDataFrame`` — correctness first, the constant only matters on
# the hot flat-schema sites.
_FALLBACK_TYPES = (
    T.BinaryType,
    T.StructType,
    T.MapType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DayTimeIntervalType,
    T.NullType,
)


def _arrow_safe(dt: T.DataType) -> bool:
    if isinstance(dt, _FALLBACK_TYPES):
        return False
    if isinstance(dt, T.ArrayType):
        return _arrow_safe(dt.elementType)
    return True


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` minus the slice tax.

    ``rows``: a list of tuples/Rows (or dicts when ``schema`` is a
    StructType/DDL naming the columns). ``schema``: StructType or DDL
    string — always explicit, the pandas hop must never re-infer types.
    Falls back to the classic path for empty input and for schemas with
    types outside the guaranteed-lossless set (see module docstring).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if not rows or not all(_arrow_safe(f.dataType) for f in schema.fields):
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = [f.name for f in schema.fields]
    if isinstance(rows[0], dict):
        data = [tuple(r.get(n) for n in names) for r in rows]
    else:
        data = [tuple(r) for r in rows]
    pdf = pd.DataFrame(data, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)
