"""The bench harness must be un-losable (VERDICT r2 weak #1).

BENCH_r02.json recorded NOTHING because bench.py printed one JSON line
only at the very end and a hang lost every leg. These tests pin the
round-3 harness contract with stub legs (no jax, no TPU):

- a complete, parseable JSON line is printed after EVERY leg;
- a hung leg (simulated with sleep >> budget) is interrupted by the
  SIGALRM budget, recorded in legs_skipped, and the bench continues;
- two consecutive timeouts trip the dead-tunnel breaker;
- a raising leg is recorded as error:... and never kills the run;
- prerequisite-gated legs skip cleanly when the prerequisite failed.
"""

import io
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pytest

from bench import LegRunner


def run_capture(fn):
    """Capture stdout lines printed by fn()."""
    old = sys.stdout
    sys.stdout = buf = io.StringIO()
    try:
        fn()
    finally:
        sys.stdout = old
    return [ln for ln in buf.getvalue().splitlines() if ln.strip()]


def parse_all(lines):
    return [json.loads(ln) for ln in lines]


class TestLegRunner:
    def test_emission_after_every_leg(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=60, partial_path=None)

        def scenario():
            runner.emit()
            runner.run("a", lambda: R.update(value=1.0), budget_s=30)
            runner.run("b", lambda: R.update(extra=2), budget_s=30)
            runner.emit(status="complete")

        lines = run_capture(scenario)
        recs = parse_all(lines)  # every line must parse
        assert len(recs) == 4
        assert recs[0]["value"] == 0.0          # pre-leg line exists
        assert recs[1]["value"] == 1.0          # headline recorded alone
        assert recs[-1]["extra"] == 2
        assert recs[-1]["status"] == "complete"
        assert recs[-1]["legs_done"] == ["a", "b"]
        assert recs[-1]["legs_skipped"] == {}

    def test_hung_leg_is_skipped_and_run_continues(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)

        def hang():
            time.sleep(30)

        def scenario():
            runner.run("good", lambda: R.update(value=7.0), budget_s=30)
            t0 = time.time()
            ok = runner.run("hung", hang, budget_s=1)
            assert not ok
            assert time.time() - t0 < 10  # alarm fired, not the sleep
            runner.run("after", lambda: R.update(after=True), budget_s=30)

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["value"] == 7.0
        assert rec["legs_skipped"]["hung"].startswith("timeout")
        assert rec["after"] is True
        assert rec["legs_done"] == ["good", "after"]

    def test_two_timeouts_trip_dead_tunnel_breaker(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)

        def scenario():
            runner.run("h1", lambda: time.sleep(30), budget_s=1)
            runner.run("h2", lambda: time.sleep(30), budget_s=1)
            t0 = time.time()
            runner.run("h3", lambda: time.sleep(30), budget_s=30)
            assert time.time() - t0 < 5  # skipped instantly, no alarm wait

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["legs_skipped"]["h1"].startswith("timeout")
        assert rec["legs_skipped"]["h2"].startswith("timeout")
        assert rec["legs_skipped"]["h3"] == "tunnel_dead"

    def test_raising_leg_recorded_not_fatal(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)

        def boom():
            raise RuntimeError("compile OOM")

        def scenario():
            runner.run("boom", boom, budget_s=30)
            runner.run("after", lambda: R.update(after=1), budget_s=30)

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["legs_skipped"]["boom"].startswith("error:RuntimeError")
        assert "compile OOM" in rec["legs_skipped"]["boom"]
        assert rec["after"] == 1

    def test_prerequisite_gating(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)

        def scenario():
            runner.run("base", lambda: time.sleep(30), budget_s=1)  # fails
            runner.run("dep", lambda: R.update(dep=1), budget_s=30,
                       needs=("base",))

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["legs_skipped"]["dep"] == "prerequisite_skipped:base"
        assert "dep" not in rec

    def test_global_deadline_skips_remaining(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=0.5, partial_path=None)  # past already

        def scenario():
            runner.run("late", lambda: R.update(late=1), budget_s=120)

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["legs_skipped"]["late"] == "deadline"

    def test_partial_file_mirrors_last_line(self, tmp_path):
        p = tmp_path / "BENCH_partial.json"
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=str(p))

        def scenario():
            runner.run("a", lambda: R.update(value=3.0), budget_s=30)

        run_capture(scenario)
        rec = json.loads(p.read_text())
        assert rec["value"] == 3.0
        assert rec["legs_done"] == ["a"]


class TestCanary:
    def test_canary_returns_backend_or_none(self):
        # the canary is a subprocess compile+run+fetch; in the test env it
        # must come back with SOME backend string (cpu or tpu), not hang
        from bench import tpu_canary

        out, detail = tpu_canary(timeout_s=180)
        assert out is None or out in ("cpu", "tpu")
        if out is None:
            assert detail  # a failure always carries a diagnosis

    def test_canary_detects_hang(self, monkeypatch):
        # a canary that cannot finish within the timeout returns None
        from bench import tpu_canary

        monkeypatch.setattr(sys, "executable", "/bin/sleep")
        # sys.executable is invoked as [exe, '-c', code]; /bin/sleep -c ...
        # exits nonzero immediately -> (None, detail)
        out, detail = tpu_canary(timeout_s=5, retry_sleep_s=0.0)
        assert out is None and detail.startswith("rc=")
