"""Budget/emission machinery tests for bench.py (VERDICT r4 next #1).

BENCH_r04.json was rc=124/parsed=null: the old main() printed its single
JSON line only after ALL legs completed, so a driver kill mid-run lost
everything, including the already-measured headline. These tests drive the
new main() with stub legs under artificially tiny budgets and assert the
three hardening properties:

  1. a cumulative JSON line is (re)printed after every completed leg, so
     truncating stdout at ANY line boundary still yields a parseable,
     headline-bearing artifact;
  2. optional legs that would blow the wall-clock budget are skipped and
     recorded in legs_skipped;
  3. a leg that raises records error_<leg> and the remaining legs still run.

Real-leg measurements live in BENCH_r*.json (driver-run on hardware), not
here — on the CPU suite the flagship legs would compile for minutes.
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


@pytest.fixture()
def no_preflight(monkeypatch):
    """Stub the TPU wedge-probe: these tests exercise budget/emission
    machinery only."""
    monkeypatch.setattr(bench, "wait_for_tpu", lambda max_wait_s=None: None)


def _run(legs, budget_s, no_wait_error=True):
    lines = []
    results = bench.main(budget_s=budget_s, legs=legs,
                         emit=lines.append)
    assert lines, "main() must emit at least one line"
    parsed = [json.loads(ln) for ln in lines]
    return results, parsed


def test_every_leg_reprints_cumulative_line(no_preflight):
    legs = [
        ("alpha", lambda r: r.update(value=7035.0), 1, True),
        ("beta", lambda r: r.update(egtea_clips_per_sec=3.0), 1, False),
    ]
    results, parsed = _run(legs, budget_s=3600)
    # one line per completed leg + the final reprint; every line parseable
    assert len(parsed) >= len(legs)
    # cumulative: the first emission already carries the headline value
    assert parsed[0]["value"] == 7035.0
    assert parsed[0]["legs_done"] == ["alpha"]
    last = parsed[-1]
    assert last["value"] == 7035.0
    assert last["egtea_clips_per_sec"] == 3.0
    assert last["legs_done"] == ["alpha", "beta"]
    assert last["legs_skipped"] == []
    assert last["metric"] == "EK100 val clips/sec/chip"
    assert "elapsed_s" in last and "budget_s" in last
    assert results["legs_done"] == ["alpha", "beta"]


def test_tiny_budget_drops_optional_legs_but_still_emits(no_preflight):
    ran = []
    legs = [
        ("headline", lambda r: (ran.append("headline"),
                                r.update(value=1.0))[-1], 1, True),
        # cold-run estimate far above the remaining budget -> must be skipped
        ("expensive_optional", lambda r: ran.append("optional"),
         10_000, False),
        ("cheap_optional", lambda r: (ran.append("cheap"),
                                      r.update(cheap=1))[-1], 0, False),
    ]
    _, parsed = _run(legs, budget_s=5)
    last = parsed[-1]
    # required leg ran even under the tiny budget; optional estimated-over-
    # budget leg was dropped BEFORE running; cheap one still fit
    assert ran == ["headline", "cheap"]
    assert last["legs_done"] == ["headline", "cheap_optional"]
    assert last["legs_skipped"] == ["expensive_optional"]
    assert last["value"] == 1.0


def test_failing_leg_records_error_and_rest_still_run(no_preflight):
    def boom(r):
        raise RuntimeError("sync is broken")

    legs = [
        ("end_to_end", boom, 1, True),
        ("after", lambda r: r.update(after_ok=True), 1, False),
    ]
    _, parsed = _run(legs, budget_s=3600)
    last = parsed[-1]
    assert last["error_end_to_end"] == "RuntimeError: sync is broken"
    assert "value" not in last  # no bogus headline published
    assert last["after_ok"] is True
    assert last["legs_done"] == ["after"]


def test_wedged_preflight_still_reaches_the_legs(monkeypatch):
    """A wait_for_tpu that exhausts its (budget-derived, capped) window must
    not abort the bench: the error is recorded and the legs still run."""
    seen = {}

    def fake_wait(max_wait_s):
        seen["max_wait_s"] = max_wait_s
        raise RuntimeError("TPU worker unresponsive")

    monkeypatch.setattr(bench, "wait_for_tpu", fake_wait)
    legs = [("hl", lambda r: r.update(value=2.0), 30, True)]
    _, parsed = _run(legs, budget_s=100)
    last = parsed[-1]
    assert "TPU worker unresponsive" in last["wait_for_tpu_error"]
    assert last["value"] == 2.0
    # the wedge-wait window was clamped to leave headroom for the headline
    # leg (never the old unconditional 2400 s)
    assert seen["max_wait_s"] <= 100


def test_real_leg_registry_shape():
    """The shipped registry: headline first, baseline second, every entry
    well-formed, and the expensive operating-point legs marked optional."""
    names = [name for name, _, _, _ in bench.LEGS]
    assert names[0] == "end_to_end"
    assert names[1] == "baseline"
    for name, fn, est, required in bench.LEGS:
        assert callable(fn) and est > 0 and isinstance(required, bool)
    optional = {n for n, _, _, req in bench.LEGS if not req}
    assert {"train256", "train256_bf16m", "int8_cache"} <= optional


def test_budget_env_var_default(monkeypatch, no_preflight):
    monkeypatch.setenv("AFFT_BENCH_BUDGET_S", "7")
    legs = [("hl", lambda r: r.update(value=1.0), 1, True)]
    results, parsed = _run(legs, budget_s=None)
    assert parsed[-1]["budget_s"] == 7.0
