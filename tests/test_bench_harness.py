"""The bench harness must be un-losable AND driver-parseable.

BENCH_r02.json recorded NOTHING because bench.py printed one JSON line
only at the very end and a hang lost every leg. BENCH_r03.json ran all 16
legs yet the driver parsed NOTHING because the full-record line grew to
3.6 KB and the driver's ~2000-char stdout tail cut off the leading keys.
These tests pin the round-4 harness contract with stub legs (no jax, no
TPU):

- a compact, parseable JSON line (hard-capped size, leading keys intact)
  is printed after EVERY leg; the FULL record mirrors to the partial file;
- a hung leg (simulated with sleep >> budget) is interrupted by the
  SIGALRM budget, recorded in legs_skipped, and the bench continues;
- two consecutive timeouts (leg OR warm-subprocess) trip the dead-tunnel
  breaker;
- a raising leg is recorded as error:... and never kills the run;
- prerequisite-gated legs skip cleanly when the prerequisite failed;
- a leg's warm subprocess (first-compile isolation) that HANGS is killed
  at its hard timeout and feeds the breaker — the C-level-hang mode
  SIGALRM cannot interrupt in-process; a warm that merely fails fast does
  NOT skip the leg.
"""

import io
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        assert recs[-1]["status"] == "complete"
        assert recs[-1]["legs_done"] == 2       # compact: count, not list
        assert "legs_skipped" not in recs[-1]   # empty dict omitted
        # non-whitelisted fields stay out of the compact line but live in
        # the full record
        assert "extra" not in recs[-1]
        assert runner.result["extra"] == 2
        assert runner.result["legs_done"] == ["a", "b"]

    def test_compact_line_capped_with_every_leg_populated(self):
        # the driver keeps a ~2000-char stdout tail and parses the LAST
        # line: with every whitelisted field populated plus skip entries,
        # the compact line must stay under 1.5 KB with leading keys intact
        R = {
            "metric": "fused_davidson_n8192_r16_sustained",
            "value": 10217.5,
            "unit": "GFLOP/s",
            "vs_baseline": 1.597,
            "backend": "tpu",
            "canary": "tpu",
        }
        runner = LegRunner(R, budget_s=60, partial_path=None)
        for f in LegRunner.COMPACT_LEG_FIELDS:
            R[f] = 123456.123456
        R["legs_done"] = [f"leg{i}" for i in range(20)]
        R["legs_skipped"] = {"slowleg": "timeout_300s",
                            "exploded": "error:RuntimeError:" + "x" * 200}
        lines = run_capture(lambda: runner.emit(status="complete"))
        assert len(lines) == 1
        line = lines[0]
        assert len(line) <= 1500
        rec = json.loads(line)
        # the keys round 3 lost to truncation lead the line
        assert line.index('"metric"') < line.index('"value"') < 100
        assert rec["value"] == 10217.5
        assert rec["vs_baseline"] == 1.597
        assert rec["legs_done"] == 20
        assert len(rec["legs_skipped"]["exploded"]) <= 48

    def test_mass_skip_compact_stays_capped(self):
        """Dead-tunnel run: ~25 skipped legs must not blow the cap through
        the legs_skipped dict alone (review round 4: measured 1417 bytes
        at 18 skips even after every whitelist field was dropped) — the
        dict degrades to a count + first names."""
        R = {
            "metric": "fused_davidson_n8192_r16_sustained",
            "value": 0.0,
            "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "backend": "tpu",
            "canary": "dead",
        }
        runner = LegRunner(R, budget_s=60, partial_path=None)
        for f in LegRunner.COMPACT_LEG_FIELDS:
            R[f] = 123456.123456
        R["legs_skipped"] = {
            f"some_quite_long_leg_name_{i}": "warm_timeout_300s_extra_detail"
            for i in range(25)
        }
        lines = run_capture(lambda: runner.emit(status="complete"))
        line = lines[0]
        assert len(line) <= 1500, len(line)
        rec = json.loads(line)
        assert rec["legs_skipped"]["n"] == 25
        assert "some_quite_long_leg_name_0" in rec["legs_skipped"]["first"]
        assert line.index('"metric"') < 100

    def test_compact_drops_tail_fields_never_core(self):
        R = {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2.0,
             "backend": "tpu", "canary": "tpu"}
        runner = LegRunner(R, budget_s=60, partial_path=None)
        for f in LegRunner.COMPACT_LEG_FIELDS:
            R[f] = 1.0
        runner.MAX_COMPACT_BYTES = 250  # force dropping
        out = runner.compact()
        assert out["metric"] == "m" and out["value"] == 1.0
        assert out["vs_baseline"] == 2.0
        # tail whitelist fields were sacrificed
        assert len(json.dumps(out)) <= 400

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
        assert runner.result["after"] is True
        assert runner.result["legs_done"] == ["good", "after"]

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
        assert runner.result["after"] == 1

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
        assert "dep" not in runner.result

    def test_global_deadline_skips_remaining(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=0.5, partial_path=None)  # past already

        def scenario():
            runner.run("late", lambda: R.update(late=1), budget_s=120)

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert rec["legs_skipped"]["late"] == "deadline"

    def test_partial_file_mirrors_full_record(self, tmp_path):
        p = tmp_path / "BENCH_partial.json"
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=str(p))

        def scenario():
            runner.run("a", lambda: R.update(value=3.0, extra="full-only"),
                       budget_s=30)

        run_capture(scenario)
        rec = json.loads(p.read_text())
        assert rec["value"] == 3.0
        assert rec["legs_done"] == ["a"]       # full list, not the count
        assert rec["extra"] == "full-only"     # non-whitelisted field kept


class TestWarmSubprocess:
    """First-compile isolation: an uninterruptible compile hang becomes a
    killable subprocess timeout that feeds the dead-tunnel breaker."""

    def test_warm_hang_skips_leg_and_feeds_breaker(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)
        ran = []

        def scenario():
            t0 = time.time()
            ok = runner.run("c1", lambda: ran.append("c1"), budget_s=30,
                            warm_cmd=["/bin/sleep", "30"], warm_timeout_s=0.3)
            assert not ok and time.time() - t0 < 5  # killed, not waited out
            runner.run("c2", lambda: ran.append("c2"), budget_s=30,
                       warm_cmd=["/bin/sleep", "30"], warm_timeout_s=0.3)
            # breaker tripped: subsequent TPU legs skip instantly
            runner.run("c3", lambda: ran.append("c3"), budget_s=30)
            runner.emit(status="complete")

        lines = run_capture(scenario)
        rec = parse_all(lines)[-1]
        assert ran == []  # the hung-warm legs never ran in-process
        assert rec["legs_skipped"]["c1"].startswith("warm_timeout")
        assert rec["legs_skipped"]["c2"].startswith("warm_timeout")
        assert rec["legs_skipped"]["c3"] == "tunnel_dead"
        assert rec["status"] == "complete"  # the bench still finished

    def test_warm_fast_failure_does_not_skip_leg(self):
        # rc != 0 exits fast — the tunnel answered, so no hang risk: the
        # leg must still run and the failure be recorded for the artifact
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)
        ran = []

        def scenario():
            ok = runner.run("leg", lambda: ran.append("leg"), budget_s=30,
                            warm_cmd=["/bin/false"], warm_timeout_s=5)
            assert ok

        run_capture(scenario)
        assert ran == ["leg"]
        assert "leg" in runner.result["legs_done"]
        assert runner.result["warm_failures"]["leg"].startswith("rc=1")

    def test_warm_success_resets_timeout_counter(self):
        R = {"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0}
        runner = LegRunner(R, budget_s=300, partial_path=None)
        runner.run("h1", lambda: time.sleep(30), budget_s=1)  # 1 timeout
        assert runner.consecutive_timeouts == 1
        ok = runner.run("ok", lambda: None, budget_s=30,
                        warm_cmd=["/bin/true"], warm_timeout_s=5)
        assert ok and runner.consecutive_timeouts == 0


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
