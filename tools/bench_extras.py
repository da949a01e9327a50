#!/usr/bin/env python
"""TPU extras subprocess for bench.py.

Builds + compiles + warms the batched / config-5 / stacked stages while
the parent process pays the headline's own (highly variable, 229-998 s
observed) remote compile, then waits for the parent's "headline_done"
flag before running the timed measurements — so every timed window on
the device is exclusive, but all the compile time overlaps.

Usage: bench_extras.py <flag_dir>; prints one JSON object on stdout.
"""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import bench  # noqa: E402

WARM_DEADLINE_S = 1200.0   # total build+compile budget for all stages.
HEADLINE_WAIT_S = 1800.0   # give up waiting for the parent after this.
RUN_BUDGET_S = 240.0       # per-stage timed-measurement alarm.


def main():
    flag_dir = Path(sys.argv[1])
    t0 = time.monotonic()
    results, timings = {}, {}
    pack, grid = bench.build_workload()
    preps = []
    stages = (("batched_4layer", lambda: bench.prep_batched(pack, grid)),
              ("config5", bench.prep_config5),
              ("multigas_7gas", lambda: bench.prep_multigas(grid)))
    for key, mk in stages:
        s0 = time.monotonic()
        budget = WARM_DEADLINE_S - (time.monotonic() - t0)
        try:
            with bench.stage_alarm(budget):
                preps.append((key, mk()))
        except bench.StageTimeout:
            results[key] = "skipped (warm timeout)"
        except Exception as exc:
            results[key] = f"error: {type(exc).__name__}: {exc}"
        timings[key + "_warm_s"] = round(time.monotonic() - s0, 1)
    (flag_dir / "warm_done").touch()

    deadline = t0 + HEADLINE_WAIT_S
    while (not (flag_dir / "headline_done").exists()
           and time.monotonic() < deadline):
        time.sleep(2.0)

    for key, run in preps:
        s0 = time.monotonic()
        try:
            with bench.stage_alarm(RUN_BUDGET_S):
                results[key] = run()
        except bench.StageTimeout:
            results[key] = "skipped (run timeout)"
        except Exception as exc:
            results[key] = f"error: {type(exc).__name__}: {exc}"
        timings[key + "_s"] = round(time.monotonic() - s0, 1)
    results["_timings"] = timings
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
