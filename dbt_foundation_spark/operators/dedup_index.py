"""Persisted minhash band index — incremental dedup without recomputing
the corpus (SURVEY §2.L D2, the production flank of minhash_lsh_join).

At 100 TB the corpus's shingle sets and band buckets are computed ONCE,
stored, and every daily ingest joins against the stored index:

- ``{path}/bands``:    (band, bucket, id) — the LSH candidate index,
  written repartitioned by (band, bucket) so at read time the
  new-batch join shuffles only the (tiny) batch side and index
  partitions irrelevant to the batch's buckets are skippable.
- ``{path}/shingles``: (id, shingles array<string>) — the verify-side
  payload, keyed by id for the candidate re-attach join.

``dedup_against_index`` then equals :func:`minhash_lsh_join` with the
corpus side read from storage instead of recomputed — pytest pins that
equivalence. ``append_to_index`` folds a verified batch into the index
(dedup-then-admit), keeping the index one incremental write per ingest
instead of a corpus-wide rebuild.

On a real cluster, write the bands dataset as a bucketed table
(``bucketBy(n, "bucket")``) so the per-ingest join is shuffle-free on
the index side; path-based parquet keeps this module warehouse-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_foundation_spark.functions.text import token_ngrams
from dbt_foundation_spark.operators.dedup import _band_buckets, minhash_signature


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, shingle_len: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(token_ngrams(text_col, shingle_len)).alias("shingles"),
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 3,
    portable: bool = False,
    index_partitions: int = 32,
) -> None:
    """Materialize the corpus band index + shingle store at ``path``.

    One pass over the corpus (signature → bands), then two writes. The
    bands dataset is repartitioned by (band, bucket) — the join key of
    every future ingest — so its files are bucket-clustered."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_len, portable)
    banded = (
        _band_buckets(sig, bands, num_hashes // bands, portable)
        .withColumnRenamed("_id", "id")
        .repartition(index_partitions, "band", "bucket")
    )
    banded.write.mode("overwrite").parquet(f"{path}/bands")
    _shingle_sets(df, id_col, text_col, shingle_len).write.mode("overwrite").parquet(
        f"{path}/shingles"
    )


def dedup_against_index(
    spark: SparkSession,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.7,
    portable: bool = False,
) -> DataFrame:
    """(new_id, corpus_id, jaccard ≥ threshold) for a new batch vs the
    stored index — same semantics as minhash_lsh_join(new, corpus, ...)
    but the corpus side costs one index read, not a recompute.

    The signature parameters MUST match the ones the index was built
    with (they define the hash family); they're trusted from the caller
    here — a production index would carry them in a manifest file."""
    sig_new = minhash_signature(new_df, id_col, text_col, num_hashes, shingle_len, portable)
    banded_new = _band_buckets(sig_new, bands, num_hashes // bands, portable)
    index_bands = spark.read.parquet(f"{path}/bands")
    cand = (
        banded_new.select("band", "bucket", F.col("_id").alias("new_id"))
        .join(
            index_bands.select("band", "bucket", F.col("id").alias("corpus_id")),
            ["band", "bucket"],
        )
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    sh_new = _shingle_sets(new_df, id_col, text_col, shingle_len).select(
        F.col("id").alias("new_id"), F.col("shingles").alias("sh_a")
    )
    sh_corpus = spark.read.parquet(f"{path}/shingles").select(
        F.col("id").alias("corpus_id"), F.col("shingles").alias("sh_b")
    )
    pairs = cand.join(sh_new, "new_id").join(sh_corpus, "corpus_id")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", F.try_divide(inter, union))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def append_to_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 3,
    portable: bool = False,
) -> None:
    """Admit a (deduped) batch into the index: append its band rows and
    shingle sets. Appends — never rewrites — so the index grows by one
    file set per ingest; run operators.maintenance.compact_table-style
    compaction on the bands dataset when micro-batches accumulate."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_len, portable)
    banded = _band_buckets(sig, bands, num_hashes // bands, portable).withColumnRenamed(
        "_id", "id"
    )
    banded.write.mode("append").parquet(f"{path}/bands")
    _shingle_sets(df, id_col, text_col, shingle_len).write.mode("append").parquet(
        f"{path}/shingles"
    )
