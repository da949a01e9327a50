"""The benchmark's timing plausibility guard (round-3 regression).

BENCH_r03.json's headline was 1.5e17 evals/s because device contention
drove the R-vs-R+1 difference negative and a defensive clamp turned it
into a number.  The guard must (a) pass through clean measurements,
(b) retry once, and (c) fall back to absolute timing — never emitting an
implausible rate.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

EVALS = 1.52637233e8  # headline workload evals per spectrum.


class FakeClock:
    def __init__(self, monkeypatch):
        self.now = 0.0
        monkeypatch.setattr(bench.time, "perf_counter", lambda: self.now)


def test_clean_measurement_passes_through(monkeypatch):
    clock = FakeClock(monkeypatch)
    per_true = EVALS / 2.0e10  # ~20 G evals/s: plausible
    sync = 0.030

    def run_sync(nreps):
        clock.now += sync + nreps * per_true

    per, method = bench.guarded_per_call(run_sync, 10, EVALS)
    assert method == "chained-diff"
    assert abs(per - per_true) / per_true < 1e-6


def test_contended_measurement_never_clamps(monkeypatch):
    clock = FakeClock(monkeypatch)
    calls = {"n": 0}
    per_true = EVALS / 2.0e10

    def run_sync(nreps):
        calls["n"] += 1
        # Contention: the R=1 call keeps taking *longer* than the chained
        # run (another process owns the device), so many - one < 0.
        if nreps == 1:
            clock.now += 10.0
        else:
            clock.now += 0.030 + nreps * per_true

    per, method = bench.guarded_per_call(run_sync, 10, EVALS)
    assert method == "absolute"
    rate = EVALS / per
    assert bench.RATE_LO <= rate <= bench.RATE_HI
    # The absolute fallback is an underestimate (includes the sync), never
    # an overestimate.
    assert per >= per_true


def test_compact_summary_is_small_and_parseable():
    """The LAST printed line must survive the driver's tail capture:
    rounds 2-4 lost the headline because the single ~7 KB line's head was
    truncated.  The compact record must stay tiny and carry the headline
    value, vs_baseline, parity and per-stage rates."""
    import json
    extra = {
        "parity": {"max_abs_err": 1e-9, "max_rel_err": 3.4e-6,
                   "workload_lines": 300000},
        "batched_4layer": {"evals_per_s": 2.9e10, "points_per_s": 9.6e6},
        "multigas_7gas": {"evals_per_s": 1.96e10},
        "config5": "skipped (deadline)",
        "sharded_1chip": {"evals_per_s": 2.85e10},
        "scaling_cpu_mesh": {"efficiency_at_8": 0.9997},
    }
    line = json.dumps(bench.compact_summary(3.69e10, 79.0, extra))
    assert len(line) < 600
    back = json.loads(line)
    assert back["value"] == 3.69e10 and back["vs_baseline"] == 79.0
    assert back["parity_max_rel"] == 3.4e-6
    assert back["stages"]["batched"] == 2.9e10
    assert back["stages"]["config5"].startswith("skipped")
    assert back["scaling_eff_at_8"] == 0.9997
    # Robust to missing/error stages too.
    empty = bench.compact_summary(1.0, 1.0, {})
    assert empty["parity_max_rel"] is None
    assert all(v is None for v in empty["stages"].values())


def test_implausibly_fast_rate_rejected(monkeypatch):
    clock = FakeClock(monkeypatch)

    def run_sync(nreps):
        # Pathology: the chained run returns ~instantly (hoisted / lost
        # dependence) -> differenced rate would be ~1e17.
        clock.now += 0.030 + nreps * 1e-9

    per, method = bench.guarded_per_call(run_sync, 10, EVALS)
    # Wall-derived number may still be out of band here; it must then be
    # FLAGGED, never silently passed or clamped.
    assert method in ("absolute", "invalid (implausible)")
    if method == "absolute":
        assert EVALS / per <= bench.RATE_HI
