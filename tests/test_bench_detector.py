"""Unit tests for bench.py's regression detector primitives.

Round-10 verdict #3: the candidate selector required the PREVIOUS
sample to clear the per-basis floor, so a sub-floor query whose current
cold sample tripled (q_idf_novelty, 0.49 s -> 1.51 s in the r10 driver
run) never got its warm verify.  Candidacy must trigger when EITHER
side clears the floor; these tests pin that contract on synthetic
prev/cur detail dicts without spinning up Spark.
"""

from __future__ import annotations

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)  # type: ignore[union-attr]


def test_sub_floor_prev_with_large_current_is_candidate():
    # The exact r10 blind-spot shape: prev cold 0.49 s (below the 0.6 s
    # cold floor), current cold 1.51 s.  Ratio 3.1x, delta 1.02 s.
    timings = {"q_idf_novelty": 1.51}
    prev_cold = {"q_idf_novelty": 0.49}
    got = bench._regression_candidates(timings, {}, prev_cold, speed=1.0)
    assert got == {"q_idf_novelty"}


def test_sub_floor_on_both_sides_stays_quiet():
    # 0.15 s -> 0.45 s: 3x ratio but both sides under the 0.6 s cold
    # floor and the absolute delta barely clears 0.25 — the floor's
    # whole purpose is to keep this jitter class quiet.
    timings = {"q_tiny": 0.45}
    prev_cold = {"q_tiny": 0.15}
    got = bench._regression_candidates(timings, {}, prev_cold, speed=1.0)
    assert got == set()


def test_small_absolute_delta_stays_quiet_even_over_floor():
    # 0.55 -> 0.72: current clears the floor and ratio is 1.31x, but
    # the absolute delta (0.17 s) is under the 0.25 s floor.
    timings = {"q_mid": 0.72}
    prev_cold = {"q_mid": 0.55}
    got = bench._regression_candidates(timings, {}, prev_cold, speed=1.0)
    assert got == set()


def test_prev_over_floor_still_flags():
    # The pre-existing path: prev 1.0 s -> cur 2.0 s must stay a
    # candidate after the either-side change.
    timings = {"q_big": 2.0}
    prev_cold = {"q_big": 1.0}
    got = bench._regression_candidates(timings, {}, prev_cold, speed=1.0)
    assert got == {"q_big"}


def test_speed_scaling_applies_before_floors():
    # Machine-drift normalizer: prev 0.8 s at speed 2.0 scales to a
    # 1.6 s basis, so a 1.9 s current sample is 1.19x — not a candidate.
    timings = {"q_drift": 1.9}
    prev_cold = {"q_drift": 0.8}
    got = bench._regression_candidates(timings, {}, prev_cold, speed=2.0)
    assert got == set()


def test_warm_basis_uses_its_own_floor():
    # Warm floor is 0.3 s: prev warm 0.2 s (sub-floor), current cold
    # 0.9 s -> candidate via the either-side rule on the warm basis.
    timings = {"q_warmish": 0.9}
    prev_warm = {"q_warmish": 0.2}
    got = bench._regression_candidates(timings, prev_warm, {}, speed=1.0)
    assert got == {"q_warmish"}


def test_looks_worse_is_pure_ratio_and_delta():
    assert bench._looks_worse(0.49, 1.51, 0.6)  # the r10 miss
    assert not bench._looks_worse(0.49, 0.55, 0.6)
    assert bench._looks_worse(1.0, 2.0, 0.6)
    assert not bench._looks_worse(2.0, 2.2, 0.6)


def test_top_movers_both_directions_ranked_by_log_ratio():
    # r11 verdict #5: movers are adjudication targets in EITHER
    # direction; 0.5x and 2.0x tie on |log ratio| and both outrank a
    # 1.3x wobble. Sub-floor pairs never qualify.
    timings = {
        "q_up2x": 2.0, "q_down2x": 1.0, "q_wobble": 1.3,
        "q_tiny": 0.05, "q_flat": 1.0,
    }
    prev_cold = {
        "q_up2x": 1.0, "q_down2x": 2.0, "q_wobble": 1.0,
        "q_tiny": 0.2, "q_flat": 1.0,
    }
    got = bench._top_movers(timings, prev_cold, speed=1.0, k=3)
    assert set(got[:2]) == {"q_up2x", "q_down2x"}
    assert got[2] == "q_wobble"
    assert "q_tiny" not in got


def test_top_movers_respects_drift_adjustment():
    # a uniform 1.5x machine-drift move is absorbed by speed=1.5 —
    # nothing ranks above a genuinely moved query
    timings = {"q_a": 1.5, "q_b": 3.1}
    prev_cold = {"q_a": 1.0, "q_b": 1.0}
    got = bench._top_movers(timings, prev_cold, speed=1.5, k=1)
    assert got == ["q_b"]


def test_warm_verify_flat_verdict_on_contention_wobble():
    # the r9/r10/r11 adjudication shape: cold moved 1.3x but the warm
    # minimum sits on the previous warm basis -> the artifact itself
    # says "flat" and no human re-litigates contention.
    verdicts = bench._warm_verify(
        ["q_ngram"],
        timings={"q_ngram": 2.51},
        warm={"q_ngram": 1.97},
        prev_warm={"q_ngram": 1.96},
        prev_cold={"q_ngram": 1.95},
        speed=1.0,
        warm_speed=1.0,
    )
    assert len(verdicts) == 1
    v = verdicts[0]
    assert v["verdict"] == "flat" and v["basis"] == "warm"
    assert v["warm_ratio"] == round(1.97 / 1.96, 3)


def test_warm_verify_slower_and_faster_verdicts():
    verdicts = bench._warm_verify(
        ["q_slow", "q_fast"],
        timings={"q_slow": 3.0, "q_fast": 0.9},
        warm={"q_slow": 2.8, "q_fast": 0.8},
        prev_warm={"q_slow": 2.0, "q_fast": 1.2},
        prev_cold={"q_slow": 2.1, "q_fast": 1.3},
        speed=1.0,
        warm_speed=1.0,
    )
    by = {v["query"]: v for v in verdicts}
    assert by["q_slow"]["verdict"] == "slower"
    assert by["q_fast"]["verdict"] == "faster"


def test_warm_verify_cold_basis_never_claims_faster():
    # no previous warm sample: a warm run beating the previous COLD one
    # is compile noise ("flat"), never a "faster" claim
    verdicts = bench._warm_verify(
        ["q_new"],
        timings={"q_new": 1.4},
        warm={"q_new": 0.7},
        prev_warm={},
        prev_cold={"q_new": 1.5},
        speed=1.0,
        warm_speed=1.0,
    )
    assert verdicts[0]["verdict"] == "flat"
    assert verdicts[0]["basis"] == "warm-vs-cold"


def test_warm_verify_unverified_without_samples():
    verdicts = bench._warm_verify(
        ["q_gone"],
        timings={"q_gone": 1.0},
        warm={},
        prev_warm={},
        prev_cold={"q_gone": 1.0},
        speed=1.0,
        warm_speed=1.0,
    )
    assert verdicts[0]["verdict"] == "unverified"


def test_warm_verify_slower_downgrades_to_contended_when_sentinel_moved():
    # r12 verdict #3: the r12 driver run labeled the untouched
    # q_pricing_summary "slower" while the whole warm phase ran 1.0-1.8x
    # hot (a load spike AFTER the run-start calibration). With the
    # per-query sentinel also >15% over the run-start calib, the verdict
    # must read "contended", keep the ratio, and carry the evidence.
    verdicts = bench._warm_verify(
        ["q_pricing"],
        timings={"q_pricing": 2.33},
        warm={"q_pricing": 2.1},
        prev_warm={"q_pricing": 1.45},
        prev_cold={"q_pricing": 1.58},
        speed=1.0,
        warm_speed=1.0,
        sentinel={"q_pricing": 1.4},
        probe_ref=1.0,
    )
    v = verdicts[0]
    assert v["verdict"] == "contended"
    assert v["sentinel_ratio"] == 1.4
    assert v["warm_ratio"] == round(2.1 / 1.45, 3)


def test_warm_verify_slower_stands_when_sentinel_flat():
    # a genuinely slower query on a quiet machine: the sentinel sat on
    # the run-start calibration, so "slower" must NOT be discounted
    verdicts = bench._warm_verify(
        ["q_real"],
        timings={"q_real": 3.0},
        warm={"q_real": 2.8},
        prev_warm={"q_real": 2.0},
        prev_cold={"q_real": 2.1},
        speed=1.0,
        warm_speed=1.0,
        sentinel={"q_real": 1.02},
        probe_ref=1.0,
    )
    v = verdicts[0]
    assert v["verdict"] == "slower"
    assert v["sentinel_ratio"] == 1.02


def test_warm_verify_faster_and_flat_never_downgrade():
    # a moved sentinel cannot fake "faster" or "flat" — those verdicts
    # pass through untouched (with the evidence still attached)
    verdicts = bench._warm_verify(
        ["q_fast", "q_flat"],
        timings={"q_fast": 0.9, "q_flat": 2.0},
        warm={"q_fast": 0.8, "q_flat": 1.98},
        prev_warm={"q_fast": 1.2, "q_flat": 1.96},
        prev_cold={"q_fast": 1.3, "q_flat": 1.95},
        speed=1.0,
        warm_speed=1.0,
        sentinel={"q_fast": 1.5, "q_flat": 1.5},
        probe_ref=1.0,
    )
    by = {v["query"]: v for v in verdicts}
    assert by["q_fast"]["verdict"] == "faster"
    assert by["q_flat"]["verdict"] == "flat"
    assert by["q_fast"]["sentinel_ratio"] == 1.5


def test_warm_verify_no_sentinel_keeps_old_contract():
    # sentinel-less calls (older artifacts, unit fixtures) behave
    # exactly as before: "slower" stands, no sentinel_ratio key
    verdicts = bench._warm_verify(
        ["q_slow"],
        timings={"q_slow": 3.0},
        warm={"q_slow": 2.8},
        prev_warm={"q_slow": 2.0},
        prev_cold={"q_slow": 2.1},
        speed=1.0,
        warm_speed=1.0,
    )
    v = verdicts[0]
    assert v["verdict"] == "slower"
    assert "sentinel_ratio" not in v


def test_warm_verify_sentinel_threshold_clears_scheduler_jitter():
    # min-of-2 probes right after query activity still read up to
    # ~1.3x the run's converged reference on an IDLE machine (JIT +
    # scheduler settle, measured r13) — a 1.28 sentinel must NOT
    # discount a real slower verdict; only >1.3 does.
    verdicts = bench._warm_verify(
        ["q_edge"],
        timings={"q_edge": 3.0},
        warm={"q_edge": 2.8},
        prev_warm={"q_edge": 2.0},
        prev_cold={"q_edge": 2.1},
        speed=1.0,
        warm_speed=1.0,
        sentinel={"q_edge": 1.28},
        probe_ref=1.0,
    )
    assert verdicts[0]["verdict"] == "slower"
    assert verdicts[0]["sentinel_ratio"] == 1.28
