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
