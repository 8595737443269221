"""End-to-end training-data curation example — the engine's
LLM-pipeline surface in one file, mirroring a production corpus loop:

    day 0   build the corpus near-dup index (minhash bands + manifest)
    day N   dedup the day's batch against the index, admit survivors;
            the embedding-index twin catches paraphrase-level dupes
    always  gate → dedup → collapse → shard the admitted corpus
    search  build a persisted IVF index, answer ANN queries by
            partition pruning

Run directly (uses sf0.001 testdata):  python examples/curation_pipeline.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def run_curation_example(spark, sf_dir: str, workdir: str) -> dict:
    """Drive the full loop; returns the headline numbers (for the test
    and the __main__ printout)."""
    from dbt_foundation_spark.functions import text as X
    from dbt_foundation_spark.operators.dedup import minhash_lsh_pairs
    from dbt_foundation_spark.operators.dedup_index import (
        append_to_index,
        build_minhash_index,
        dedup_against_index,
    )
    from dbt_foundation_spark.operators.packing import (
        export_shards,
        serpentine_shards,
    )
    from dbt_foundation_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 > 0)      # the landed corpus
    batch = docs.filter(F.col("doc_id") % 5 == 0)      # today's ingest
    out = {}

    # --- day 0: persist the near-dup index (parameters land in the
    # manifest; a mismatched query raises instead of silently missing) --
    idx = str(Path(workdir) / "mh_index")
    params = dict(num_hashes=16, bands=4, shingle_len=3)
    build_minhash_index(corpus, "doc_id", "text", idx, **params)

    # --- day N: admission control — drop batch docs that near-dup the
    # corpus (index join: |batch| x collision rate, corpus untouched)
    # or a smaller-id doc in the same batch, then admit the survivors --
    vs_corpus = dedup_against_index(
        spark, batch, "doc_id", "text", idx, jaccard_threshold=0.5, **params
    ).select(F.col("new_id").alias("_d"))
    within = minhash_lsh_pairs(
        batch, "doc_id", "text", jaccard_threshold=0.5, **params
    ).select(F.greatest("id_a", "id_b").alias("_d"))
    survivors = batch.join(
        vs_corpus.union(within).distinct(),
        batch["doc_id"] == F.col("_d"),
        "left_anti",
    )
    out["batch_size"] = batch.count()
    out["admitted"] = survivors.count()
    append_to_index(survivors, "doc_id", "text", idx, **params)

    # --- curate the admitted corpus: gate -> token budget -> balanced
    # training shards, exported as shard=N/ JSONL directories ---------
    curated = (
        corpus.unionByName(survivors)
        .filter(
            (X.quality_score("text") >= 0.25) & (X.lang_id("text") != "und")
        )
        .select("doc_id", "text", X.token_count("text").alias("toks"))
    )
    assigned = serpentine_shards(curated, id_col="doc_id", cost_col="toks", n_shards=4)
    shard_dir = str(Path(workdir) / "shards")
    export_shards(
        assigned.select("doc_id", "toks", "shard"), shard_dir, shard_col="shard"
    )
    out["curated"] = curated.count()
    out["shard_dirs"] = sorted(
        p.name for p in Path(shard_dir).iterdir() if p.name.startswith("shard=")
    )

    # --- semantic flank: the same dedup-admit loop on EMBEDDINGS —
    # catches paraphrase-level duplicates that share no surface n-grams
    from dbt_foundation_spark.operators.dedup_index import (
        build_embedding_index,
        dedup_against_embedding_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb_corpus = emb.filter(F.col("vec_id") % 5 > 0)
    emb_batch = emb.filter(F.col("vec_id") % 5 == 0)
    emb_idx = str(Path(workdir) / "emb_index")
    build_embedding_index(
        emb_corpus, "vec_id", "embedding", emb_idx, threshold=0.25
    )
    out["semantic_dupes"] = (
        dedup_against_embedding_index(
            spark, emb_batch, "vec_id", "embedding", emb_idx, threshold=0.25
        )
        .select("new_id")
        .distinct()
        .count()
    )

    # --- similarity: persisted IVF index, partition-pruned ANN query --
    # full lifecycle: build on the corpus slice, APPEND the daily batch
    # with the stored centroids, batch-query it, compact the ingest's
    # micro-files back per list
    from dbt_foundation_spark.operators.maintenance import compact_index
    from dbt_foundation_spark.operators.similarity import (
        append_to_ivf_index,
        knn_join_ivf,
    )

    ivf = str(Path(workdir) / "ivf_index")
    build_ivf_index(emb_corpus, "vec_id", "embedding", ivf, n_lists=8)
    append_to_ivf_index(emb_batch, "vec_id", "embedding", ivf)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    hits = search_ivf_index(
        spark, ivf, "vec_id", "embedding", qv, k=5, n_probe=3, exclude_id=0
    ).collect()
    out["ann_top5"] = [int(r["vec_id"]) for r in hits]
    # every appended vector answers for itself in one batched job
    knn = knn_join_ivf(
        spark, ivf, emb_batch.limit(20), "vec_id", "embedding",
        k=1, n_probe=2,
    )
    out["batch_self_hits"] = knn.filter(
        F.col("query_id") == F.col("corpus_id")
    ).count()
    out["ivf_files_after_compact"] = compact_index(spark, ivf)["lists"][
        "after"
    ]["n_files"]

    # --- takedown: logically retract the query's own vector, verify it
    # vanished from ANN results, then let the next compaction fold the
    # deletion physically and clear the log
    from dbt_foundation_spark.operators.tombstones import (
        read_tombstones,
        retract_from_index,
    )

    retract_from_index(spark, ivf, [hits[0]["vec_id"]])
    post = search_ivf_index(
        spark, ivf, "vec_id", "embedding", qv, k=5, n_probe=3, exclude_id=0
    ).collect()
    out["retracted_gone"] = all(
        r["vec_id"] != hits[0]["vec_id"] for r in post
    )
    compact_index(spark, ivf)
    out["tombstones_after_compact"] = read_tombstones(spark, ivf) is None
    from dbt_foundation_spark.operators.maintenance import index_stats

    out["ivf_stats"] = index_stats(spark, ivf)
    return out


def main() -> None:
    from dbt_foundation_spark.session import get_spark

    spark = get_spark(app_name="curation_example")
    sf_dir = "/root/testdata/sf0.001"
    with tempfile.TemporaryDirectory() as td:
        out = run_curation_example(spark, sf_dir, td)
        print(f"ingest: {out['admitted']}/{out['batch_size']} admitted")
        print(f"semantic near-dups in batch (embedding index): {out['semantic_dupes']}")
        print(f"curated corpus: {out['curated']} docs -> {out['shard_dirs']}")
        print(f"ANN top-5 for vec 0: {out['ann_top5']}")
        print(
            f"batch ANN self-hits: {out['batch_self_hits']}/20; "
            f"lists files after compact: {out['ivf_files_after_compact']}"
        )
        print(
            f"takedown: retracted vector gone={out['retracted_gone']}, "
            f"log folded at compaction={out['tombstones_after_compact']}"
        )
        print(f"index stats: {out['ivf_stats']}")


if __name__ == "__main__":
    main()
