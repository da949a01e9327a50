#!/usr/bin/env python
"""Multi-device scaling measurement for the line-sharded absorption step.

Runs the production sharded pipeline (parallel/lines.py) at spec = 1/2/4/8
on a forced 8-device CPU mesh and reports, per point:

- wall-clock step time and spectral-points/s (on this VM the 8 virtual
  devices share 2 physical cores, so wall time reflects TOTAL work, not
  per-device latency — it validates that sharding does not *add* work);
- work-model efficiency: ideal per-device lines (N/spec) divided by the
  largest per-device block (halo duplication + padding + load imbalance
  included).  On real multi-chip hardware, per-device wall time is
  proportional to the per-device line-point work, so this ratio IS the
  strong-scaling efficiency ceiling of the decomposition;
- max-abs-err of the sharded float32 result vs the float64 host engine.

The workload matches BASELINE config-5 geometry: a wide grid (1-5000 cm-1)
so one shard's slab (~625 cm-1 at spec=8) dwarfs the 52 cm-1 halo.

Prints one JSON line: {"scaling": [...], "efficiency_at_8": ..., ...}.
"""
import json
import os
import sys
import time
from pathlib import Path

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

NUM_LINES = 20000
GRID = (1.0, 5000.0, 0.1)
LAYERS = 2
CONDITIONS = dict(temperature=np.asarray([288.99, 227.74]),
                  pressure=np.asarray([98388.0, 1032.0]),
                  vmr=np.asarray([6.637074e-03, 4.763972e-06]))


def measure(reps=3, mode="balanced", specs=(1, 2, 4, 8)):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.models.lines import Gas, internal_grid
    from pylbl_tpu.parallel import (make_lines_sharded_step, make_mesh,
                                    shard_line_pack)
    from pylbl_tpu.parallel import distributed as dist
    from pylbl_tpu.spectroscopy import number_density

    dist.initialize()  # no-op single-process; pod entry point otherwise.
    pack = synthetic_line_pack(num_lines=NUM_LINES, nu_min=0.5,
                               nu_max=5100.0, seed=1,
                               band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(*GRID)
    v0, vn, n_per_v, num_points = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, 25)

    t = CONDITIONS["temperature"].astype(np.float32)
    p = CONDITIONS["pressure"].astype(np.float32)
    x = CONDITIONS["vmr"].astype(np.float32)

    # float64 host reference for the error column.
    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    expected = np.stack([
        number_density(CONDITIONS["temperature"][i],
                       CONDITIONS["pressure"][i], CONDITIONS["vmr"][i])
        * gas.absorption_coefficient(
            CONDITIONS["temperature"][i], CONDITIONS["pressure"][i],
            CONDITIONS["vmr"][i], grid)
        for i in range(LAYERS)])

    results = []
    for spec in specs:
        if spec > len(jax.devices()):
            break
        mesh = make_mesh(devices=jax.devices()[:spec], batch=1, spec=spec)
        blocks, q_table, static, info = shard_line_pack(pack, grid, spec,
                                                        mode=mode)
        step = make_lines_sharded_step(static, info, mesh)
        out = step(blocks, q_table, t, p, x)
        out.block_until_ready()  # compile + warmup (reliable on CPU).
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(blocks, q_table, t, p, x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        err = float(np.abs(np.asarray(out, np.float64)[:, :num_points]
                           - expected).max())
        ideal = keep / spec
        results.append({
            "spec": spec,
            "wall_s": round(dt, 4),
            "points_per_s": round(LAYERS * num_points / dt, 1),
            "work_efficiency": round(ideal / info["block_len"], 4),
            "duplication": round(info["duplication"], 4),
            "ring_steps": info["ring_steps"],
            "max_abs_err": err,
            "max_rel_err": err / float(expected.max()),
        })
    return results


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"mode": mode}
    if mode == "all":
        # Balanced is the default decomposition and carries the headline
        # efficiency; halo (duplication) and ring (ppermute step count)
        # run at the end points so the artifact records all three modes'
        # duplication/ring_steps without 12 CPU compiles.
        out["scaling"] = results = measure(mode="balanced")
        out["halo"] = measure(mode="halo", specs=(2, 8))
        out["ring"] = measure(mode="ring", specs=(2, 8))
    else:
        out["scaling"] = results = measure(mode=mode)
    at8 = [r for r in results if r["spec"] == 8]
    out["efficiency_at_8"] = at8[0]["work_efficiency"] if at8 else None
    out["note"] = ("work_efficiency = ideal per-device lines / max block; "
                   "equals the per-device strong-scaling ceiling on real "
                   "multi-chip hardware. wall_s on this VM shares 2 cores "
                   "across all virtual devices (total-work check only).")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
