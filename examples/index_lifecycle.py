"""Persisted-index lifecycle walkthrough — the operational loop a
100 TB corpus actually schedules, end to end in one file:

    build      → build_minhash_index / build_ivf_index (one corpus pass)
    ingest     → append_to_index per daily batch (dedup-then-admit),
                 or streaming via run_dedup_ingest / run_ivf_ingest
    takedown   → retract_from_index (O(batch) log append; every read
                 path subtracts it immediately)
    revive     → clear_tombstones(ids=...) (file-level fold — see
                 operators/tombstones.py for the crash contract;
                 raises while compact_index holds the __compacting
                 marker, so a revive can never race a fold)
    maintain   → compact_index (folds micro-files AND tombstones;
                 clears exactly the folded ids)
    observe    → index_stats (files per dataset = compaction signal,
                 tombstones = fold-pending signal, crash_leftovers =
                 re-run-maintenance signal) and, for IVF indexes,
                 ivf_sizing_advice (√N rule drift = rebuild signal)

Run directly (uses sf0.001 testdata):  python examples/index_lifecycle.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dbt_foundation_spark.operators.dedup_index import (
    append_to_index,
    build_minhash_index,
    dedup_against_index,
)
from dbt_foundation_spark.operators.maintenance import compact_index, index_stats
from dbt_foundation_spark.operators.tombstones import (
    clear_tombstones,
    retract_from_index,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from dbt_foundation_spark.session import get_spark

    spark = get_spark(app_name="index_lifecycle_example", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(num_hashes=32, bands=8, shingle_len=3)

    with tempfile.TemporaryDirectory(prefix="idx_example_") as root:
        path = f"{root}/minhash_index"

        # 1. BUILD — one pass over the admitted corpus
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        build_minhash_index(corpus, "doc_id", "text", path, **kw)
        print("built:", index_stats(spark, path)["datasets"])

        # 2. INGEST — daily batch: dedup against the corpus, admit the
        #    survivors (the streaming flank is run_dedup_ingest)
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        hits = dedup_against_index(
            spark, batch, "doc_id", "text", path, jaccard_threshold=0.6, **kw
        )
        dupes = hits.select(F.col("new_id").alias("doc_id")).distinct()
        survivors = batch.join(dupes, "doc_id", "left_anti")
        append_to_index(survivors, "doc_id", "text", path, **kw)
        print(
            f"ingested {survivors.count()} of {batch.count()} "
            f"(near-dups dropped: {dupes.count()})"
        )

        # 3. TAKEDOWN — logical, O(batch); effective on the NEXT query
        dead = [r[0] for r in corpus.select("doc_id").limit(5).collect()]
        print("retracted:", retract_from_index(spark, path, dead))
        print("tombstones pending fold:", index_stats(spark, path)["tombstones"])

        # 4. REVIVE one id (license re-granted) — the rest stay dead
        print("revived:", clear_tombstones(spark, path, dead[:1]))

        # 5. MAINTAIN — fold micro-files and the remaining tombstones
        out = compact_index(spark, path)
        for sub, stats in out.items():
            print(
                f"compacted {sub}: {stats['before']['n_files']} files "
                f"-> {stats['after']['n_files']}"
            )
        s = index_stats(spark, path)
        print("after compaction:", {"tombstones": s["tombstones"],
                                    "crash_leftovers": s["crash_leftovers"]})
        assert s["tombstones"] == 0 and s["crash_leftovers"] == []

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
