"""Multimodal column plumbing (SURVEY §2.L D5): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas iterators (mapInPandas).

The decode step itself is STUBBED (no PIL/ffmpeg in this container —
gated behind an import-try with a deterministic fake), but everything
Spark-side is real and tested: the schema contract, the mapInPandas
batch shape, partition sizing, and the feature-column outputs.

At scale: binary payloads dominate partition size — repartition so
``rows_per_partition * avg_payload ≤ spark.sql.files.maxPartitionBytes``
before a mapInPandas stage, and project metadata-only pipelines WITHOUT
touching the binary column (column pruning keeps bytes unread).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decode backends are optional in this environment
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, mime_type string, n_bytes long, sha256 string, "
    "features array<float>"
)


def synthetic_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (the stand-in
    for a real lakehouse media source).

    Generated JVM-side from ``spark.range`` (r13 optimization): the
    previous driver-list ``createDataFrame`` produced a
    defaultParallelism-sliced local relation whose slices downstream
    ``coalesce(target_partitions)`` stages fetched SERIALLY from the
    Python driver (~1.2 s of fixed overhead per action at 32 cores —
    see local_data.py; binary+struct columns are outside local_frame's
    Arrow-safe set, so the fix here is generating in the JVM instead).
    Row-for-row identical to the driver-side formula:
    ``sha2(i, 256)`` unhexed IS ``hashlib.sha256(str(i)).digest()``,
    repeated to ``payload_bytes``."""
    copies = payload_bytes // 32
    i = F.col("id")
    payload = F.concat(*[F.unhex(F.sha2(i.cast("string"), 256))] * copies)
    return spark.range(n).select(
        i.alias("media_id"),
        payload.alias("payload"),
        F.when(i % 3 != 0, "image/png").otherwise("audio/wav").alias("mime_type"),
        F.struct(
            (64 + i % 16).cast("int").alias("width"),
            (48 + i % 9).cast("int").alias("height"),
            (1000 * (i % 7)).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder/encoder: hash-derived
    pseudo-features. Replace with PIL/torchvision in a full container."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    df: DataFrame,
    dim: int = 8,
    target_partitions: int | None = None,
    decode_fn=None,
) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, not rows).

    ``decode_fn(payload: bytes) -> list[float]`` plugs in a real backend
    (PIL/torchvision/ffmpeg); the default is the deterministic fake
    featurizer, independent of what imports happen to be installed —
    the Spark-side contract (schema, batching, pruning) is identical
    either way.

    target_partitions sizes the Python-worker fan-out: each partition
    spawns an Arrow worker, so tiny inputs should coalesce (worker
    startup dominates) while payload-heavy inputs should repartition up
    until rows_per_partition × avg_payload fits executor memory.

    NULL payloads (missing media) yield NULL n_bytes/sha256/features
    and ``decode_fn`` is NEVER called on them: a real backend (PIL /
    ffmpeg) would abort the Arrow batch on None, and the previous
    ``p or b""`` coalesce silently gave a MISSING payload the same
    sha256 (and fake features) as a zero-byte file — conflating "we
    never fetched it" with "it is empty" in any dedup-by-hash
    downstream. An EMPTY (b"") payload is real data and still decodes.
    """
    if target_partitions is not None:
        df = df.coalesce(target_partitions)
    decode = decode_fn or (lambda p: _fake_decode_features(p, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pd.array(
                        [None if p is None else len(p) for p in payloads],
                        dtype="Int64",
                    ),
                    "sha256": [
                        None if p is None else hashlib.sha256(p).hexdigest()
                        for p in payloads
                    ],
                    "features": [
                        None if p is None else decode(p) for p in payloads
                    ],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    (timestamps from metadata duration) — pure JVM explode; the decode
    of each frame is the stubbed step above."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must NOT read the payload column
    (verify with .explain: the parquet scan's ReadSchema excludes it)."""
    return (
        df.select("mime_type", "meta.width", "meta.height")
        .groupBy("mime_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
        )
    )
