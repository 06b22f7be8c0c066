"""measure_scaling's per-leg-max selection logic (no Ray, no subprocess:
run_at is monkeypatched).  The estimator contract: external interference
only SUBTRACTS from a leg's throughput, so the max over attempts is each
leg's uninterfered speed; max-of-RATIO would be biased (a slow lo-leg
draw inflates efficiency)."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _fake_run_at(seq_by_cpu):
    """Successive docs_per_sec values per cpu level."""
    state = {k: iter(v) for k, v in seq_by_cpu.items()}

    def run_at(ncpu):
        tp = next(state[ncpu])
        return {"docs_per_sec": tp, "value": 24000 / tp}

    return run_at


def test_per_leg_max_beats_single_bad_draw(monkeypatch):
    # attempt 1: hi leg throttled (eff 0.65); attempt 2: hi leg healthy.
    monkeypatch.setattr(bench, "run_at", _fake_run_at(
        {4: [270.0, 250.0], 16: [700.0, 1000.0]}))
    monkeypatch.setenv("RAY_GRAFT_SCALING_ATTEMPTS", "2")
    sc = bench.measure_scaling(4, 16)
    assert sc["docs_per_sec_lo"] == 270.0       # per-LEG max, not last
    assert sc["docs_per_sec_hi"] == 1000.0
    assert sc["scaling_efficiency"] == round((1000 / 270) / 4, 3)
    assert len(sc["attempts"]) == 2             # raw draws preserved


def test_early_stop_on_healthy_first_attempt(monkeypatch):
    calls = {"n": 0}
    healthy = _fake_run_at({4: [270.0, 270.0, 270.0],
                            16: [1030.0, 1030.0, 1030.0]})

    def counting(ncpu):
        calls["n"] += 1
        return healthy(ncpu)

    monkeypatch.setattr(bench, "run_at", counting)
    monkeypatch.setenv("RAY_GRAFT_SCALING_ATTEMPTS", "3")
    sc = bench.measure_scaling(4, 16)
    assert sc["scaling_efficiency"] >= 0.85
    assert calls["n"] == 2                      # one pair, early-stopped
    assert len(sc["attempts"]) == 1


def test_slow_lo_draw_does_not_inflate(monkeypatch):
    # a throttled lo leg in attempt 2 must NOT raise the efficiency
    # (max-of-ratio would have picked (1000/100)/4 = 2.5)
    monkeypatch.setattr(bench, "run_at", _fake_run_at(
        {4: [270.0, 100.0], 16: [700.0, 1000.0]}))
    monkeypatch.setenv("RAY_GRAFT_SCALING_ATTEMPTS", "2")
    sc = bench.measure_scaling(4, 16)
    assert sc["scaling_efficiency"] == round((1000 / 270) / 4, 3)
    assert sc["scaling_efficiency"] < 1.0
