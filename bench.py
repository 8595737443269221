"""Benchmark harness: runs the headline catalog queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: run every oracle-backed query plus rows-only ops marked
# as benchmark-worthy; skip trivial literal fixtures.
SKIP = {"q_literal_union", "q_ref_filter", "q_notnull_filter", "q_catalog_tables"}


def _index_lifecycle(spark, sf_dir: str) -> dict[str, float]:
    """Timed persisted-index lifecycle — the operations a 100 TB
    deployment actually SCHEDULES (build once, append per ingest,
    retract on takedown, compact to fold both), which the query-only
    timings above never exercise. One minhash index (flat, band-
    clustered layout) and one IVF index (hive-partitioned lists):
    build → append a 10% batch → retract ~200 ids → compact (folds the
    tombstones physically and clears the log). Scratch lives in a temp
    dir and is removed; the headline ``value`` metric is unaffected —
    these are reported as their own section."""
    import shutil
    import tempfile

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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 4)

    root = tempfile.mkdtemp(prefix="bench_index_")
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
    return out


def _looks_worse(p: float, c: float, floor: float) -> bool:
    # ratio + absolute-delta floor: 1.3× of a 0.35 s query is
    # scheduler jitter, 1.3× of a 2 s query is a real regression.
    # EITHER side clearing the floor qualifies (round-10 verdict #3):
    # requiring prev >= floor alone left a blind spot where a query
    # whose previous sample was sub-floor never got its warm verify no
    # matter how far its current sample moved — r10's q_idf_novelty
    # went 0.49 s -> 1.51 s cold and slipped through exactly that way
    # (the warm re-check later proved it compile noise, but the
    # detector should have been the one to prove it).
    return (p >= floor or c >= floor) and c > 1.3 * p and (c - p) >= 0.25


def _regression_candidates(
    timings: dict[str, float],
    prev_warm: dict[str, float],
    prev_cold: dict[str, float],
    speed: float,
) -> set[str]:
    """Queries whose single cold sample could flag at judgment time.

    Candidates get three warm samples before any regression verdict —
    a cold sample folds plan+codegen compile and cries wolf on its own.
    A query is a candidate iff EITHER basis (scaled prev warm with the
    0.3 s warm floor, or scaled prev cold with the 0.6 s cold floor)
    looks worse under :func:`_looks_worse`, which itself accepts a
    sub-floor PREVIOUS sample when the current one clears the floor.
    """
    return {
        name
        for name, cur in timings.items()
        if (
            name in prev_warm
            and _looks_worse(prev_warm[name] * speed, cur, 0.3)
        )
        or (
            name in prev_cold
            and _looks_worse(prev_cold[name] * speed, cur, 0.6)
        )
    }


def _top_movers(
    timings: dict[str, float],
    prev_cold: dict[str, float],
    speed: float,
    k: int = 5,
) -> list[str]:
    """The k queries that MOVED most vs the drift-adjusted previous
    cold sample — in EITHER direction, regression flag or not (r11
    verdict #5: three rounds running, the biggest adjudication sink
    was contention wobble on queries that never flagged; the bench now
    warm-verifies its own movers so the artifact carries the verdict).
    Sub-floor pairs (both sides < 0.3 s) are scheduler jitter, not
    movers. Ranked by |log ratio| so 0.5× and 2.0× tie."""
    import math

    scored = []
    for name, cur in timings.items():
        p = prev_cold.get(name)
        if not p:
            continue
        p_adj = p * speed
        if max(p_adj, cur) < 0.3 or min(p_adj, cur) <= 0:
            continue
        scored.append((abs(math.log(cur / p_adj)), name))
    return [name for _, name in sorted(scored, reverse=True)[:k]]


def _warm_verify(
    movers: list[str],
    timings: dict[str, float],
    warm: dict[str, float],
    prev_warm: dict[str, float],
    prev_cold: dict[str, float],
    speed: float,
    warm_speed: float,
    sentinel: dict[str, float] | None = None,
    probe_ref: float | None = None,
) -> list[dict]:
    """Adjudicate each mover from its WARM minimum (the statistic that
    is stable across contention — see the warm-pass comment): verdict
    "flat" when the warm sample sits within ±15% of the drift-adjusted
    previous warm basis (the cold move was compile/contention noise),
    "slower"/"faster" when the warm numbers themselves moved. With no
    previous warm sample the basis is the previous COLD one — a warm
    run matching or beating it is "flat" (compile noise); "faster" is
    never claimed against a cold basis (warm beats cold by
    construction).

    Contention sentinel (r12 verdict #3): the drift calibration is
    taken at RUN START, so a load spike during the warm phase defeated
    the adjudicator — the r12 driver run labeled the untouched
    q_pricing_summary "slower" while 19/19 overlapping warm queries
    rose together. ``sentinel[name]`` is the fixed CPU probe re-timed
    right after that query's warm samples; ``probe_ref`` is the
    fastest the SAME probe ran anywhere in this run (sampled through
    the cold pass — the run-start calibration alone is ~2× slower
    than the converged probe because the JVM is still JIT-ramping, so
    using it as the reference would mask real contention). When a
    "slower" verdict's own sentinel ran > 1.3× the reference, the
    machine was demonstrably slower DURING that query's warm window
    and the verdict downgrades to "contended" (the entry keeps the
    ratio and gains ``sentinel_ratio`` so the evidence is auditable);
    1.3 clears the post-activity scheduler jitter the probe shows on
    an idle machine while real multi-JVM contention reads 1.5-3×.
    "faster" and "flat" verdicts never downgrade — a sentinel that
    moved cannot fake those. If the WHOLE run (cold pass included)
    ran contended the reference is elevated and nothing downgrades —
    that global shift is drift_ratio's job, reported alongside."""
    out = []
    for name in movers:
        cold_prev = prev_cold.get(name)
        entry: dict = {
            "query": name,
            "cold_prev_adj": round(cold_prev * speed, 4) if cold_prev else None,
            "cold_cur": timings.get(name),
        }
        w = warm.get(name)
        if w is None:
            entry.update({"basis": "none", "verdict": "unverified"})
            out.append(entry)
            continue
        if name in prev_warm:
            basis, p = "warm", prev_warm[name] * warm_speed
        elif cold_prev:
            basis, p = "warm-vs-cold", cold_prev * speed
        else:
            entry.update({"basis": "none", "verdict": "unverified"})
            out.append(entry)
            continue
        r = w / p
        if basis == "warm":
            verdict = "flat" if 0.85 <= r <= 1.15 else (
                "slower" if r > 1.15 else "faster"
            )
        else:
            verdict = "flat" if r <= 1.15 else "slower"
        s_ratio = None
        if sentinel and probe_ref and name in sentinel:
            s_ratio = round(sentinel[name] / probe_ref, 3)
            if verdict == "slower" and s_ratio > 1.3:
                verdict = "contended"
        entry.update(
            {
                "basis": basis,
                "warm_prev_adj": round(p, 4),
                "warm_cur": w,
                "warm_ratio": round(r, 3),
                "verdict": verdict,
            }
        )
        if s_ratio is not None:
            entry["sentinel_ratio"] = s_ratio
        out.append(entry)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from dbt_foundation_spark.queries import all_queries
    from dbt_foundation_spark.session import get_spark

    spark = get_spark(app_name="dbt_foundation_spark_bench")
    qs = {k: v for k, v in sorted(all_queries().items()) if k not in SKIP}

    # warm the JVM + parquet footer caches once with the flagship query
    qs["q_pricing_summary"](spark, sf_dir).collect()

    # fixed per-query overhead floor: the cheapest possible plan through
    # the same build→noop-write path. Everything up to this floor is
    # session/scheduler constant, not operator cost — report it so
    # per-query deltas can be read against it (round-2 ask #7).
    floor_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor_runs.append(time.perf_counter() - t0)
    overhead_floor = round(sorted(floor_runs)[len(floor_runs) // 2], 4)

    # CPU calibration probe: a fixed, cache-independent JVM compute
    # (200M xxhash64 across all cores). Same-code warm timings drift
    # 20-40% across VM boots (CPU frequency / host neighbors), which a
    # per-boot probe captures and the scheduler-floor above does not.
    # Recorded as a diagnostic and used as the drift FALLBACK — the
    # primary regression normalizer is the median per-query ratio (see
    # the regression block), which also catches non-CPU drift the probe
    # measured flat while wall-clock moved 9%.
    def _calib_probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(xxhash64(id) % 1000000) s"  # modulo: no ANSI bigint overflow
        ).collect()
        return time.perf_counter() - t0

    calib_runs = [_calib_probe() for _ in range(3)]
    calib = round(min(calib_runs), 4)

    timings: dict[str, float] = {}
    # every-15th-query probe through the cold pass: the fastest of
    # these is the run's "quiet machine" reference for the warm-phase
    # contention sentinel (min-of-2 per site — the first probe right
    # after query activity carries ~1.5-2.5x scheduler settle)
    cold_probes: list[float] = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: full execution, no driver-side result transfer
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        if i % 15 == 14:
            cold_probes.append(round(min(_calib_probe(), _calib_probe()), 4))

    # Steady-state flank: the cold numbers above fold one-time plan +
    # whole-stage-codegen compilation (and Python-worker spin-up for the
    # Arrow paths) into each query's single run — measured at sf0.1 that
    # is ~half the wall for the slowest queries (q_dedup_simhash 6.2 s
    # cold vs 3.3 s warm: its 65-buffer hash aggregate compiles ~3 s of
    # generated code; q_multimodal_features 3.9 vs 1.3 s). On a 100 TB
    # job the plan compiles once and the map stage runs for hours, so
    # the warm number is the per-operator cost that scales. Re-run the
    # top-10 slowest once warm and report both.
    # three warm samples, keep the MIN: single warm samples on 1-3 s
    # queries jitter +/-30% between bench invocations (GC, OS caches),
    # which made the regression flagger cry wolf on unchanged code; the
    # minimum is the stable statistic for "how fast can this plan go"
    # (raised from two samples in round 5 — min-of-2 still flagged
    # unchanged queries at 1.4x across same-day runs)
    # Baseline rule (round-6 verdict #2): ``bench_detail.json`` is the
    # COMMITTED sf0.1 baseline — it becomes the baseline only by an
    # explicit commit of a driver-scale run. A smoke run at any other SF
    # must never clobber it (it happened by accident in r5/r6), so
    # non-baseline SFs read AND write an SF-suffixed sidecar instead —
    # which also gives smoke runs their own same-scale drift basis.
    here = Path(__file__).resolve().parent
    if sf == 0.1:
        detail_path = here / "bench_detail.json"
    else:
        detail_path = here / f"bench_detail_sf{sf}.json"
    try:
        prev = json.loads(detail_path.read_text())
    except (OSError, ValueError):
        prev = None
    if prev and prev.get("sf") != sf:
        prev = None
    prev_cold = (prev or {}).get("queries", {})
    prev_warm = (prev or {}).get("warm_top10", {})

    # cold-basis regression CANDIDATES get verified warm below: a single
    # cold sample folds plan+codegen compile (measured 0.7→3.3 s swings
    # on unchanged queries), so flagging straight off it cries wolf.

    # machine-drift normalizer, computed BEFORE candidate selection so
    # the candidate and flag checks use the SAME scaled basis (a drift
    # < 1 run would otherwise flag queries cold that were never given
    # their warm verify). Primary estimator: the MEDIAN per-query cold
    # ratio over the common set — this sandbox drifts 5-15% between
    # same-day same-code runs with the CPU probe FLAT (the drift is
    # scheduler/IO, not CPU frequency), and one genuine localized
    # regression cannot move the median of ~150 queries. A code change
    # that slows EVERYTHING would be absorbed, which is why drift_ratio
    # is reported next to the flags: drift ≫1 with no code change is
    # machine state, drift ≫1 right after a session/config commit is
    # the finding. Clamped — beyond 2× something else is wrong and
    # should flag, not absorb. CPU-probe fallback when the set is thin.
    prev_calib = (prev or {}).get("calib_sec")
    cpu = min(2.0, max(0.5, calib / prev_calib)) if prev_calib else 1.0
    ratios = sorted(
        timings[n] / prev_cold[n]
        for n in timings.keys() & prev_cold.keys()
        if prev_cold[n] >= 0.3
    )
    drift = ratios[len(ratios) // 2] if len(ratios) >= 20 else cpu
    speed = min(2.0, max(0.5, drift))

    candidates = _regression_candidates(timings, prev_warm, prev_cold, speed)
    movers = _top_movers(timings, prev_cold, speed)
    warm: dict[str, float] = {}
    # per-query contention sentinel (r12 verdict #3): the run-start
    # calibration cannot see a load spike that starts DURING the warm
    # phase, so each warm-verified query gets the same fixed CPU probe
    # re-timed right after its samples — if the probe moved with the
    # query, the "slower" verdict downgrades to "contended" in
    # _warm_verify and the regression entry carries the evidence.
    sentinel: dict[str, float] = {}
    for name in sorted(
        set(sorted(timings, key=lambda q: -timings[q])[:10])
        | candidates
        | set(movers)
    ):
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        warm[name] = round(min(samples), 4)
        sentinel[name] = round(min(_calib_probe(), _calib_probe()), 4)

    # sentinel reference: min over the cold-pass probes (same min-of-2
    # statistic, same post-activity conditions), NOT the run-start
    # calib — the probe JIT-ramps ~2x over the first queries, so the
    # run-start number would mask contention up to that factor. A run
    # too short to collect cold-pass probes (subset smoke under 15
    # queries) falls back to the sentinels' own minimum (r13 review:
    # the calib fallback biased every ratio ~0.5x and the downgrade
    # could never fire) — if at least one warm window was quiet that
    # approximates the floor; if ALL were contended, ratios read ~1
    # and flags stand, the conservative fate.
    probe_ref = min(cold_probes) if cold_probes else (
        min(sentinel.values()) if sentinel else calib
    )
    total = round(sum(timings.values()), 4)
    # warm-basis drift: cold ratios fold compile-time shifts that warm
    # minima don't have, so scaling prev_warm by the COLD median could
    # mask a genuine warm regression behind a compile-cost change.
    # When enough warm pairs exist (top-10 stability gives ~10), use
    # their own median; else fall back to the cold-derived speed.
    warm_ratios = sorted(
        warm[n] / prev_warm[n]
        for n in warm.keys() & prev_warm.keys()
        if prev_warm[n] >= 0.3
    )
    warm_speed = (
        min(2.0, max(0.5, warm_ratios[len(warm_ratios) // 2]))
        if len(warm_ratios) >= 6
        else speed
    )
    # Round-over-round regression flagging (round-3 ask #5): compare
    # against the PREVIOUS committed bench_detail.json before
    # overwriting it; only at the same SF. Basis preference:
    # warm-vs-warm (the number that scales — cold folds one-time
    # codegen), else the current WARM min against the previous cold
    # sample (a warm run still slower than last round's cold one is a
    # real regression; one merely matching it is compile noise), else
    # cold-vs-cold for queries the warm pass didn't reach.
    regressions = []
    if prev:
        for name, cur in timings.items():
            cur_w = warm.get(name)
            if name in prev_warm and cur_w is not None:
                p, c, kind = prev_warm[name], cur_w, "warm"
            elif name in prev_cold and cur_w is not None:
                p, c, kind = prev_cold[name], cur_w, "warm-vs-cold"
            elif name in prev_cold:
                p, c, kind = prev_cold[name], cur, "cold"
            else:
                continue
            p = round(p * (warm_speed if kind == "warm" else speed), 4)
            floor = 0.3 if kind == "warm" else 0.6
            if _looks_worse(p, c, floor):
                entry = {
                    "query": name,
                    "prev": p,
                    "cur": c,
                    "ratio": round(c / p, 2),
                    "basis": kind,
                }
                # annotation only, never suppression: a flag whose own
                # warm window ran contended stays a flag, but carries
                # the sentinel evidence for adjudication
                if name in sentinel:
                    entry["sentinel_ratio"] = round(
                        sentinel[name] / probe_ref, 3
                    )
                regressions.append(entry)
    # index lifecycle timings (round-5 ask #6): drift-normalized against
    # the previous committed run with the same basis/floors as queries —
    # these are one-shot maintenance ops (no warm pass makes sense: a
    # build IS cold in production), so the cold floor applies.
    lifecycle = _index_lifecycle(spark, sf_dir)
    prev_life = (prev or {}).get("index_lifecycle", {})

    def _life_regs(life: dict[str, float]) -> list[dict]:
        regs = []
        for name, cur in life.items():
            if name in prev_life:
                p = round(prev_life[name] * speed, 4)
                if _looks_worse(p, cur, 0.6):
                    regs.append(
                        {
                            "query": f"lifecycle:{name}",
                            "prev": p,
                            "cur": cur,
                            "ratio": round(cur / p, 2),
                            "basis": "lifecycle",
                        }
                    )
        return regs

    life_regs = _life_regs(lifecycle)
    lifecycle_retried = False
    if life_regs:
        # one-shot contention adjudication (r12: leftover test JVMs
        # shutting down faked 1.5-2x flags on every lifecycle op in the
        # same run): the query movers get a warm pass, but maintenance
        # ops are stateful sequences — so a flagged run gets ONE full
        # fresh-scratch re-run and each op keeps its minimum, the same
        # min statistic the warm pass uses. Recorded in the artifact
        # (lifecycle_retried), never silent.
        second = _index_lifecycle(spark, sf_dir)
        lifecycle = {
            k: min(v, second.get(k, v)) for k, v in lifecycle.items()
        }
        life_regs = _life_regs(lifecycle)
        lifecycle_retried = True
    regressions.extend(life_regs)
    regressions.sort(key=lambda r: -r["ratio"])
    warm_verify = _warm_verify(
        movers, timings, warm, prev_warm, prev_cold, speed, warm_speed,
        sentinel=sentinel, probe_ref=probe_ref,
    )
    # how much slower the machine ran during the warm phase than at
    # its quietest moment this run — the contention summary the
    # per-query sentinel ratios roll up to (median: one genuinely slow
    # probe cannot move it)
    s_vals = sorted(sentinel.values())
    warm_phase_drift = (
        round(s_vals[len(s_vals) // 2] / probe_ref, 3)
        if s_vals and probe_ref
        else None
    )
    # Full per-query timings go to a sidecar file; stdout gets one COMPACT
    # line (top-5 slowest only) so the driver's bounded capture never
    # truncates the JSON (round-1 BENCH had parsed:null from a ~2.5 KB line).
    detail = {
        "metric": "catalog_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warm_top10": warm,
        "warm_verify": warm_verify,
        "index_lifecycle": lifecycle,
        "lifecycle_retried": lifecycle_retried,
        "regressions": regressions,
        "overhead_floor_sec": overhead_floor,
        "overhead_floor_total": round(overhead_floor * len(timings), 2),
        "calib_sec": calib,
        # MEASURED (unclamped) drift so a saturating global slowdown
        # stays visible; the internal scaling uses the clamped value
        "drift_ratio": round(drift, 3),
        "warm_drift_ratio": round(warm_speed, 3),
        "warm_phase_drift": warm_phase_drift,
        "warm_sentinel": sentinel,
        "probe_ref_sec": probe_ref,
        "sf": sf,
    }
    detail_path.write_text(json.dumps(detail, indent=1))
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": top5,
                "warm_top10": warm,
                # stdout stays bounded (a ~2.5 KB line once parsed as
                # null in the driver's capture): verdicts only; the
                # sidecar carries the full per-mover evidence
                "warm_verify": {
                    v["query"]: v.get("verdict", "unverified")
                    for v in warm_verify
                },
                "regressions": regressions[:5],
                "index_lifecycle": lifecycle,
                "n_queries": len(timings),
                "overhead_floor_sec": overhead_floor,
                "calib_sec": calib,
                "drift_ratio": round(drift, 3),
                "warm_phase_drift": warm_phase_drift,
                "detail": detail_path.name,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
