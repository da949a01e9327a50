#!/usr/bin/env python
"""Headline benchmark: Voigt line-summation throughput on one TPU chip.

Workload: an H2O-scale synthetic line list (300k lines) on the quickstart
config-2 grid (1-5000 cm-1 at 0.1 cm-1; 50k points), the same shape as the
reference's hottest path (pyLBL C loop, absorption.c:76-87).  Measures the
Pallas two-pass kernel's steady-state rate in masked line-point evaluations
per second (each line covers a (2*cutoff+1) cm-1 window, reference
spectra.c:48-62), with line constants device-resident as in production.

Measurement method: R spectra are chained inside one jitted fori_loop with
a loop-carried dependence (so XLA cannot hoist the loop-invariant kernel
call), and the per-spectrum time is the difference between R=1 and R=R+1
around a single 4-byte readback sync.  Anything simpler measures the axon
tunnel (~30 ms RPC round-trip per sync), not the device.

vs_baseline: ratio against the reference C implementation's single-core
rate, measured live by running the unmodified reference voigt.c/spectra.c
(compiled via tests/oracle) on a subsample of the same workload.

Beyond the headline, "extra" carries (each guarded by a deadline so the
headline always prints):
- max abs/rel error of the Pallas float32 spectrum vs the reference C
  oracle on a 20k-line subsample of the same workload;
- the production layer-batched pipeline rate (4 layers, one launch);
- the gas-stacked pipeline rate (7 gases in ONE launch vs 7);
- multi-device scaling of the line-sharded step on a virtual 8-device CPU
  mesh (subprocess; work-model efficiency per BASELINE).

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}
"""
import json
import os
import signal
import subprocess
import sys
import time
from contextlib import contextmanager
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pylbl_tpu.database.fixtures import synthetic_line_pack  # noqa: E402
from pylbl_tpu.models.lines import internal_grid  # noqa: E402
from pylbl_tpu.models.lines.physics import (kernel_inputs,  # noqa: E402
                                            line_profile_params)
from pylbl_tpu.ops import lineshape  # noqa: E402
from pylbl_tpu.ops.lineshape_pallas import make_device_plan  # noqa: E402

TEMPERATURE = 288.99  # surface layer of the canonical test column.
PRESSURE = 98388.0
VMR = 6.637074e-03
CUT_OFF = 25
DEADLINE_S = 600.0  # extras stop starting after this much wall time.
_T0 = time.perf_counter()


def over_deadline():
    return time.perf_counter() - _T0 > DEADLINE_S


class StageTimeout(Exception):
    pass


@contextmanager
def stage_alarm(seconds):
    """Hard per-stage wall limit: a slow remote compile inside one extra
    must not run the whole process into the driver's kill window and lose
    the headline JSON."""
    def handler(signum, frame):
        raise StageTimeout()

    previous = signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(int(seconds), 1))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, previous)


def build_workload(num_lines=300000):
    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(1.0, 5000.0, 0.1)
    return pack, grid


def window_evals(keep, n_per_v):
    return keep * ((2 * CUT_OFF + 1) * n_per_v + 1)


def tpu_rate(pack, grid, reps=10):
    import jax
    import jax.numpy as jnp

    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    params = line_profile_params(pack, TEMPERATURE, PRESSURE, VMR, keep=keep)
    kin = kernel_inputs(params, v0, n_per_v, CUT_OFF)
    arrays = lineshape.prepare_kernel_arrays(kin, n_per_v, np.float32)
    # Line constants are device-resident in steady state (the production
    # Gas/batched paths keep them in HBM per gas); measure the compute
    # rate, not the tunnel's host->device bandwidth.
    plan = make_device_plan(arrays, kin, n, n_per_v, CUT_OFF)

    @jax.jit
    def chained(soa, groups, nreps):
        def body(i, carry):
            acc, s, g = carry
            s = jnp.where(acc >= -1.0, s, 0.0)  # true loop dependence
            g = jnp.where(acc >= -1.0, g, 0.0)
            out = plan.run_with(s, g)
            return (acc + out[0], s, g)
        acc, _, _ = jax.lax.fori_loop(0, nreps, body,
                                      (jnp.float32(0), soa, groups))
        return acc

    float(chained(plan.soa, plan.groups, 1))    # compile
    t0 = time.perf_counter()
    float(chained(plan.soa, plan.groups, 1))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(plan.soa, plan.groups, reps + 1))
    many = time.perf_counter() - t0
    per_spectrum = max((many - one) / reps, 1e-9)
    max_k = float(np.asarray(plan()).max())
    return window_evals(keep, n_per_v) / per_spectrum, \
        n / per_spectrum, max_k


def reference_rate(grid, num_lines=20000):
    """Single-core rate of the unmodified reference C code (lines/s scaled
    to evals/s on the same window size)."""
    try:
        import oracle
        if not oracle.available():
            return None
        pack = synthetic_line_pack(
            num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
            band_centers=(150.0, 1600.0, 3700.0, 500.0))
        v0, vn, n_per_v, _ = internal_grid(grid)
        keep = pack.compat_break_filter(v0, vn, CUT_OFF)
        best = np.inf  # min of 3: robust to host CPU contention.
        for _ in range(3):
            t0 = time.perf_counter()
            oracle.absorption(pack, TEMPERATURE, PRESSURE, VMR, v0, vn,
                              n_per_v, cut_off=CUT_OFF)
            best = min(best, time.perf_counter() - t0)
        return window_evals(keep, n_per_v) / best
    except Exception:
        return None


def parity_vs_oracle(grid, num_lines=20000):
    """Max abs/rel error of the float32 Pallas spectrum vs the compiled
    reference C on a 20k-line subsample (BASELINE's max-abs-err column)."""
    import oracle
    from pylbl_tpu.ops.lineshape_pallas import accumulate_tpu

    if not oracle.available():
        return None
    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    expected = oracle.absorption(pack, TEMPERATURE, PRESSURE, VMR, v0, vn,
                                 n_per_v, cut_off=CUT_OFF)
    params = line_profile_params(pack, TEMPERATURE, PRESSURE, VMR, keep=keep)
    kin = kernel_inputs(params, v0, n_per_v, CUT_OFF)
    arrays = lineshape.prepare_kernel_arrays(kin, n_per_v, np.float32)
    got = np.asarray(accumulate_tpu(arrays, kin, n, n_per_v, CUT_OFF),
                     np.float64)
    err = np.abs(got - expected)
    return {"max_abs_err": float(err.max()),
            "max_rel_err": float(err.max() / expected.max())}


def chained_rate(inner, args, per_call_points, per_call_evals, reps=5):
    """Steady-state rate of a jitted [B]-batched pipeline via the same
    loop-carried fori chaining as the headline."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(t, p, x, nreps):
        def body(i, carry):
            acc, tt = carry
            out = inner(tt, p, x)
            acc = acc + out.ravel()[0]
            return (acc, tt + acc * 0)
        acc, _ = jax.lax.fori_loop(0, nreps, body, (jnp.float32(0), t))
        return acc

    t, p, x = args
    float(chained(t, p, x, 1))
    t0 = time.perf_counter()
    float(chained(t, p, x, 1))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(t, p, x, reps + 1))
    many = time.perf_counter() - t0
    per_call = max((many - one) / reps, 1e-9)
    return {"points_per_s": round(per_call_points / per_call, 1),
            "evals_per_s": round(per_call_evals / per_call, 1),
            "wall_s_per_call": round(per_call, 5)}


def batched_rate(pack, grid, num_layers=4):
    from pylbl_tpu.parallel.lines import derive_envelope, make_batched_tpu_fn

    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    x = np.full(num_layers, VMR, np.float32)
    # Atmosphere-derived kernel envelope, as the production Spectroscopy
    # path uses (shrinks the layer-independent core-instance windows).
    t_max, p_max_atm = derive_envelope(t, p)
    fn = make_batched_tpu_fn(pack, grid, t_max=t_max, p_max_atm=p_max_atm)
    result = chained_rate(fn.inner, (t, p, x), num_layers * n,
                          num_layers * window_evals(keep, n_per_v))
    # Parity of the batched f32 device-physics path vs the compiled
    # reference C oracle on a 20k-line subsample (quantified per
    # BASELINE), across warm and cold layers.
    import oracle
    if oracle.available():
        sub = synthetic_line_pack(num_lines=20000, nu_min=0.5,
                                  nu_max=5100.0, seed=1,
                                  band_centers=(150.0, 1600.0, 3700.0,
                                                500.0))
        sub_fn = make_batched_tpu_fn(sub, grid, t_max=t_max,
                                     p_max_atm=p_max_atm)
        got = np.asarray(sub_fn(t, p, x), np.float64)
        errs = []
        for i in range(num_layers):
            want = oracle.absorption(sub, float(t[i]), float(p[i]),
                                     float(x[i]), v0, vn, n_per_v,
                                     cut_off=CUT_OFF)
            errs.append(np.abs(got[i] - want).max() / want.max())
        result["max_rel_err_vs_oracle"] = float(np.max(errs))
    return result


def multigas_rate(grid, num_layers=4):
    """Config-2 seven-gas quickstart shape in ONE stacked launch."""
    from pylbl_tpu.parallel.lines import (make_multigas_batched_fn,
                                          stack_device_packs)

    names = ["H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2"]
    packs = {}
    for g, name in enumerate(names):
        packs[name] = synthetic_line_pack(
            name, num_lines=300000 if name == "H2O" else 20000,
            nu_min=0.5, nu_max=5100.0, seed=g + 1,
            band_centers=(150.0 + 400 * g, 1600.0, 3700.0))
    from pylbl_tpu.parallel.lines import derive_envelope

    arrays, host, static, _ = stack_device_packs(packs, grid)
    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    t_max, p_max_atm = derive_envelope(t, p)
    fn = make_multigas_batched_fn(packs, grid, t_max=t_max,
                                  p_max_atm=p_max_atm)
    x = np.full((num_layers, len(names)), 1e-4, np.float32)
    result = chained_rate(
        fn.inner, (t, p, x),
        num_layers * len(names) * static["num_points"],
        num_layers * window_evals(static["num_lines"],
                                  static["n_per_v"]))
    result["gases"] = len(names)
    result["total_lines"] = static["num_lines"]
    return result


def start_scaling_cpu_mesh():
    """Launches tools/bench_scaling.py in a CPU subprocess (8 virtual
    devices).  Started up front: it needs no TPU, so it runs concurrently
    with the tunnel-bound TPU stages."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.Popen(
        [sys.executable, str(REPO / "tools" / "bench_scaling.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=str(REPO))


def collect_scaling(proc):
    budget = max(30.0, DEADLINE_S + 120.0 - (time.perf_counter() - _T0))
    try:
        out, _ = proc.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        return "skipped (deadline)"
    if proc.returncode != 0:
        return None
    return json.loads(out.strip().splitlines()[-1])


def main():
    timings = {}
    pack, grid = build_workload()
    # Reference C single-core rate FIRST, on an uncontended host (the
    # CPU-mesh scaling subprocess below would otherwise compete for the
    # 2 vCPUs and skew the baseline).
    ref = reference_rate(grid)
    timings["reference_c_s"] = round(time.perf_counter() - _T0, 1)
    try:
        scaling_proc = start_scaling_cpu_mesh()
    except Exception:
        scaling_proc = None
    # The axon tunnel's remote-compile RPC occasionally drops mid-read
    # ("response body closed before all bytes were read"); one retry after
    # a short pause reliably recovers.
    for attempt in range(3):
        try:
            rate, points_rate, max_k = tpu_rate(pack, grid)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20.0)
    assert np.isfinite(max_k) and max_k > 0
    timings["headline_s"] = round(time.perf_counter() - _T0, 1)
    vs_baseline = rate / ref if ref else 1.0

    extra = {"single_layer_points_per_s": round(points_rate, 1),
             "reference_c_evals_per_s": round(ref, 1) if ref else None}
    for key, fn in (("parity", lambda: parity_vs_oracle(grid)),
                    ("batched_4layer", lambda: batched_rate(pack, grid)),
                    ("multigas_7gas", lambda: multigas_rate(grid))):
        if over_deadline():
            extra[key] = "skipped (deadline)"
            continue
        t0 = time.perf_counter()
        budget = DEADLINE_S + 60.0 - (time.perf_counter() - _T0)
        try:
            with stage_alarm(budget):
                extra[key] = fn()
        except StageTimeout:
            extra[key] = "skipped (stage timeout)"
        except Exception as exc:  # never lose the headline
            extra[key] = f"error: {type(exc).__name__}: {exc}"
        timings[key + "_s"] = round(time.perf_counter() - t0, 1)
    if scaling_proc is not None:
        extra["scaling_cpu_mesh"] = collect_scaling(scaling_proc)
    extra["stage_wall_s"] = timings

    print(json.dumps({
        "metric": "voigt_line_point_evals_per_s",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
