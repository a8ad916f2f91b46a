"""bench.py's warm regression gate — reproduce-before-fail semantics.

VERDICT r10 "What's wrong" #1: the driver's BENCH_r10 run exited rc=1
flagging four queries whose code had not changed — single-sample
co-tenant noise in one query's measurement window, with median_ratio
1.0 so normalization had nothing to normalize. The gate must treat a
first-pass flag as a hypothesis and fail only when a fresh serial
re-measurement reproduces it; both samples stay in the artifact.
"""

from __future__ import annotations

import bench


def _gate(timings, prev, remeasure):
    return bench.warm_gate(dict(timings), dict(prev), remeasure)


def test_noise_flag_is_retracted_by_remeasure():
    prev = {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0}
    # q_c spiked 2x in its single measurement window; others flat
    timings = {"q_a": 1.0, "q_b": 1.05, "q_c": 2.0}
    calls = []

    def remeasure(name):
        calls.append(name)
        return 1.02  # fresh serial sample: back to steady state

    confirmed, first_pass, median_ratio = bench.warm_gate(
        timings, prev, remeasure
    )
    assert calls == ["q_c"]  # ONLY the flagged query is re-measured
    assert confirmed == {}  # noise does not fail the run
    assert first_pass["q_c"]["remeasured"] == 1.02  # both samples recorded
    assert first_pass["q_c"]["now"] == 2.0
    # the retracted flag's steady-state number supersedes the noisy one
    assert timings["q_c"] == 1.02
    assert median_ratio == 1.05  # the round's own median shift


def test_genuine_regression_reproduces_and_fails():
    prev = {"q_a": 1.0, "q_b": 1.0, "q_c": 1.0}
    timings = {"q_a": 1.0, "q_b": 1.0, "q_c": 2.0}
    confirmed, first_pass, _ = bench.warm_gate(timings, prev, lambda n: 1.95)
    assert set(confirmed) == {"q_c"}
    assert confirmed["q_c"]["remeasured"] == 1.95
    assert timings["q_c"] == 2.0  # confirmed flag keeps the measurement


def test_global_slowdown_is_normalized_not_flagged():
    # co-tenant frequency scaling: EVERY query +60% — the median divisor
    # absorbs it; no per-query flag, no remeasure calls
    prev = {f"q_{i}": 1.0 for i in range(5)}
    timings = {f"q_{i}": 1.6 for i in range(5)}
    confirmed, first_pass, median_ratio = bench.warm_gate(
        timings, prev, lambda n: (_ for _ in ()).throw(AssertionError)
    )
    assert confirmed == {} and first_pass == {}
    assert abs(median_ratio - 1.6) < 1e-9


def test_faster_round_cannot_mask_regression():
    # everything else got 2x FASTER; q_c regressed 1.8x absolute. With a
    # raw median divisor of 0.5 this would hide; the 1.0 floor keeps it
    # visible, and a reproducing remeasure confirms it.
    prev = {"q_a": 2.0, "q_b": 2.0, "q_c": 1.0, "q_d": 2.0}
    timings = {"q_a": 1.0, "q_b": 1.0, "q_c": 1.8, "q_d": 1.0}
    confirmed, _, median_ratio = bench.warm_gate(timings, prev, lambda n: 1.8)
    assert median_ratio == 1.0
    assert set(confirmed) == {"q_c"}


def test_sub_floor_delta_never_flags():
    # 3x ratio but only 150 ms absolute — under REGRESSION_FLOOR_SEC
    prev = {"q_a": 0.05, "q_b": 1.0}
    timings = {"q_a": 0.15, "q_b": 1.0}
    confirmed, first_pass, _ = bench.warm_gate(
        timings, prev, lambda n: (_ for _ in ()).throw(AssertionError)
    )
    assert confirmed == {} and first_pass == {}


def test_previous_bench_selects_same_sf_baseline(tmp_path, monkeypatch):
    """ADVICE r11 #4: a newer baseline at a DIFFERENT sf must be
    skipped, not returned — each sf keeps its own ratchet, and a new-sf
    run (no matching record) gets None so it can seed a baseline."""
    import json
    import os

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    red = bench.REDUCTION
    old = {"queries": {"q_a": 1.0}, "sf": 0.1, "reduction": red}
    foreign = {"queries": {"q_a": 0.1}, "sf": 0.01, "reduction": red}
    (tmp_path / "BENCH_LOCAL_r05.json").write_text(json.dumps(old))
    (tmp_path / "BENCH_LOCAL_sf0.01_r06.json").write_text(json.dumps(foreign))
    name, doc = bench._previous_bench(0.1)
    assert name == "BENCH_LOCAL_r05.json" and doc["sf"] == 0.1
    name, doc = bench._previous_bench(0.01)
    assert name == "BENCH_LOCAL_sf0.01_r06.json" and doc["sf"] == 0.01
    assert bench._previous_bench(1.0) is None
    # records under a FOREIGN measurement protocol (the pre-r14 count()
    # reduction, marker-less) are skipped — ratios across protocols are
    # meaningless, the ratchet re-seeds
    (tmp_path / "BENCH_LOCAL_r07.json").write_text(
        json.dumps({"queries": {"q_a": 2.0}, "sf": 1.0})
    )
    assert bench._previous_bench(1.0) is None
    (tmp_path / "BENCH_LOCAL_r08.json").write_text(
        json.dumps({"queries": {"q_a": 2.0}, "sf": 1.0, "reduction": red})
    )
    name, _ = bench._previous_bench(1.0)
    assert name == "BENCH_LOCAL_r08.json"
