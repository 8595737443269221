"""Per-job breakdown of the persisted-index lifecycle ops (r14).

Replays bench.py's _index_lifecycle sequence (build -> append ->
retract -> compact for the minhash and IVF indexes) with the event log
enabled and prints, per op: wall seconds, the jobs inside the op's wall
window (duration, task count, call site), and the DRIVER GAP — wall
time not covered by any job, i.e. planning/FS/manifest constants that
no executor ever sees. That gap is exactly the per-op constant VERDICT
r13 #5 asks to cut.

Usage::

    python tools/lifecycle_breakdown.py            # sf0.1
    python tools/lifecycle_breakdown.py --sf 0.01
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.1")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="lifecycle_breakdown_")
    from pyspark.sql import functions as F

    from dbt_foundation_spark.operators.dedup_index import (
        append_to_index,
        build_minhash_index,
    )
    from dbt_foundation_spark.operators.maintenance import compact_index
    from dbt_foundation_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
    )
    from dbt_foundation_spark.operators.tombstones import retract_from_index
    from dbt_foundation_spark.session import get_spark

    spark = get_spark(
        app_name="lifecycle_breakdown",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sf_dir = f"/root/testdata/sf{args.sf}"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs.limit(10).collect()  # warmup

    marks: dict[str, tuple[float, float]] = {}

    def clock(name, fn):
        t0 = time.time()
        fn()
        marks[name] = (t0 * 1000, time.time() * 1000)

    root = tempfile.mkdtemp(prefix="lifecycle_scratch_")
    try:
        mh, ivf = f"{root}/mh", f"{root}/ivf"
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        batch = docs.filter(F.col("doc_id") % 10 == 0)
        kw = dict(num_hashes=32, bands=8, shingle_len=3)
        clock("minhash_build", lambda: build_minhash_index(
            corpus, "doc_id", "text", mh, **kw))
        clock("minhash_append", lambda: append_to_index(
            batch, "doc_id", "text", mh, **kw))
        dead = [r[0] for r in corpus.select("doc_id").limit(200).collect()]
        clock("minhash_retract", lambda: retract_from_index(spark, mh, dead))
        clock("minhash_compact_fold", lambda: compact_index(spark, mh))

        vcorpus = emb.filter(F.col("vec_id") % 10 != 0)
        vbatch = emb.filter(F.col("vec_id") % 10 == 0)
        clock("ivf_build", lambda: build_ivf_index(
            vcorpus, "vec_id", "embedding", ivf, n_lists=16))
        clock("ivf_append", lambda: append_to_ivf_index(
            vbatch, "vec_id", "embedding", ivf))
        vdead = [r[0] for r in vcorpus.select("vec_id").limit(200).collect()]
        clock("ivf_retract", lambda: retract_from_index(spark, ivf, vdead))
        clock("ivf_compact_fold", lambda: compact_index(spark, ivf))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    jobs: dict[int, dict] = {}
    log = Path(log_dir) / app_id
    if not log.exists():
        candidates = sorted(
            p
            for p in Path(log_dir).glob(f"*{app_id}*")
            if not p.name.endswith(".inprogress")
        )
        if not candidates:
            sys.exit(f"no event log for {app_id} under {log_dir}")
        candidate = candidates[0]
        log = candidate if candidate.is_file() else next(
            f for f in sorted(candidate.iterdir()) if f.name.startswith("events_")
        )
    for line in open(log):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "site": ev.get("Properties", {}).get("callSite.short", ""),
                "ntasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in ev.get("Stage Infos", [])
                ),
            }
        elif e == "SparkListenerJobEnd":
            jobs.setdefault(ev["Job ID"], {})["end"] = ev["Completion Time"]

    for name, (lo, hi) in marks.items():
        wall = (hi - lo) / 1000.0
        inside = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if "start" in j and "end" in j and lo <= j["start"] <= hi
        ]
        covered = sum(j["end"] - j["start"] for _, j in inside) / 1000.0
        print(f"== {name}: wall {wall:.3f}s, {len(inside)} jobs, "
              f"job-sum {covered:.3f}s, driver gap {wall - covered:.3f}s ==")
        for jid, j in inside:
            print(
                f"  job {jid}: {(j['end'] - j['start']) / 1000:6.3f}s "
                f"tasks={j.get('ntasks', '?'):4} {j.get('site', '')}"
            )


if __name__ == "__main__":
    main()
