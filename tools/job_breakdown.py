"""Per-job breakdown of a catalog query (round-13 profiling aid).

Runs the named queries once warm through the bench's build→noop-sink
path with the Spark event log enabled, then parses the log into one
line per job: duration, stage count, task count, and the job's call
site — showing WHERE a multi-job query (pins, convergence probes,
collects) spends its wall clock, which plan explains cannot.

Usage::

    python tools/job_breakdown.py q_corpus_pipeline
    python tools/job_breakdown.py --sf 0.01 q_incremental_microbatch
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="0.1")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="job_breakdown_")
    from dbt_foundation_spark.queries import all_queries
    from dbt_foundation_spark.session import get_spark

    spark = get_spark(
        app_name="job_breakdown",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sf_dir = f"/root/testdata/sf{args.sf}"
    qs = all_queries()
    qs["q_pricing_summary"](spark, sf_dir).collect()  # warmup

    marks: dict[str, tuple[float, float]] = {}
    for name in args.names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        marks[name] = (t0 * 1000, time.time() * 1000)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    log = Path(log_dir) / app_id
    if not log.exists():  # Spark 4 rolling event log layout
        candidates = sorted(
            p
            for p in Path(log_dir).glob(f"*{app_id}*")
            if not p.name.endswith(".inprogress")
        )
        if not candidates:
            sys.exit(f"no event log for {app_id} under {log_dir}")
        candidate = candidates[0]  # compact/rolled variants sort together
        log = candidate if candidate.is_file() else next(
            f for f in sorted(candidate.iterdir()) if f.name.startswith("events_")
        )
    for line in open(log):
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "site": ev.get("Properties", {}).get("callSite.short", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "ntasks": sum(
                    s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])
                ),
            }
        elif e == "SparkListenerJobEnd":
            jobs.setdefault(ev["Job ID"], {})["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
            }

    for name, (lo, hi) in marks.items():
        print(f"== {name} (second warm run) ==")
        tot = 0.0
        for jid in sorted(jobs):
            j = jobs[jid]
            # a JobEnd without its JobStart (truncated log) has no
            # "start"; skip the record instead of crashing the report
            if "end" not in j or "start" not in j or not (lo <= j["start"] <= hi):
                continue
            dur = (j["end"] - j["start"]) / 1000.0
            tot += dur
            ran = [
                f"{stages[s]['name'].split(' at ')[0]}:{stages[s]['ms']}ms"
                for s in j.get("stages", [])
                if s in stages
            ]
            print(
                f"  job {jid}: {dur:6.3f}s tasks={j.get('ntasks', '?'):4} "
                f"{j.get('site', '')}  [{', '.join(ran[:4])}]"
            )
        print(f"  sum of jobs: {tot:.3f}s")


if __name__ == "__main__":
    main()
