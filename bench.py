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

vs_baseline: ratio against the PINNED reference C single-core rate on the
identical workload (BASELINE.md "Pinned C baseline"); the live-measured C
rate for this run is carried in extra (round-2 lesson: a 20k-line
subsample fits in cache and flatters the C code ~2x, so the pin uses the
full 300k-line pack).

Each stage shares its compiled program with its parity check (the chained
timing loop returns the final spectrum), so the whole run fits the driver
budget — round 2 starved the extras behind six separate remote compiles.
"extra" carries (each stage deadline-guarded so the headline always
prints):
- max abs/rel error of the Pallas float32 spectrum vs the reference C
  oracle on the FULL headline workload;
- the production layer-batched pipeline rate (4 layers, one launch) and
  its per-layer oracle parity, from the same compile;
- the gas-stacked pipeline rate (7 gases in ONE launch vs 7);
- config-5 at scale: 500k-point grid x 16 layers x 7 gases, stacked
  total-format launches streamed to a resumable file (points/s + bytes);
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
import tempfile
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
# Extras stop *starting* after this much wall time.  Sized for the
# worst observed remote-compile variance: the headline stage alone has
# ranged 229-713 s across runs on the tunneled TPU with identical code.
DEADLINE_S = 840.0
_T0 = time.perf_counter()

# Reference C single-core rate on the FULL headline workload (300k-line
# pack seed 1, grid 1-5000 @0.1, surface layer, min-of-5 on an idle
# host) — see BASELINE.md "Pinned C baseline".  vs_baseline divides by
# this constant so the headline ratio is comparable across rounds; the
# live re-measurement is reported alongside in extra.
PINNED_C_EVALS_PER_S = 4.68e8


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


def tpu_warm(pack, grid):
    """Builds + compiles + warm-runs the headline program.  Returns a
    measure() closure whose wall contains ONLY the timed chained runs, so
    the warm (compile-dominated, 229-998 s observed through the tunnel)
    can overlap the extras subprocess's own warmups."""
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
            # Full-output reduce: a single-element read would let XLA
            # dead-code-eliminate any non-Pallas stage of the program.
            return (acc + jnp.sum(out) * jnp.float32(1e-30), s, g)
        acc, _, _ = jax.lax.fori_loop(0, nreps, body,
                                      (jnp.float32(0), soa, groups))
        return acc, plan.run_with(soa, groups)

    def run(nreps):
        acc, out = chained(plan.soa, plan.groups, nreps)
        return float(acc), out

    run(1)                                      # compile + warm

    def measure(reps=10):
        t0 = time.perf_counter()
        _, out = run(1)
        one = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(reps + 1)
        many = time.perf_counter() - t0
        per_spectrum = max((many - one) / reps, 1e-9)
        spectrum = np.asarray(out, np.float64)
        assert np.isfinite(spectrum).all() and spectrum.max() > 0
        return window_evals(keep, n_per_v) / per_spectrum, \
            n / per_spectrum, spectrum

    return measure


def tpu_rate(pack, grid, reps=10):
    """Headline rate AND the float32 spectrum the timed program computed
    (one compile serves both the rate and the oracle parity)."""
    return tpu_warm(pack, grid)(reps)


def reference_rate(pack, grid):
    """Single-core rate of the unmodified reference C code on the FULL
    headline workload (identical lines + grid as the TPU stage), plus the
    oracle spectrum for parity.  Returns (rate or None, spectrum or None)."""
    try:
        import oracle
        if not oracle.available():
            return None, None
        v0, vn, n_per_v, _ = internal_grid(grid)
        keep = pack.compat_break_filter(v0, vn, CUT_OFF)
        best = np.inf  # min of 5: robust to host CPU contention.
        expected = None
        for _ in range(5):
            t0 = time.perf_counter()
            expected = oracle.absorption(pack, TEMPERATURE, PRESSURE, VMR,
                                         v0, vn, n_per_v, cut_off=CUT_OFF)
            best = min(best, time.perf_counter() - t0)
        return window_evals(keep, n_per_v) / best, expected
    except Exception:
        return None, None


def parity(spectrum, expected, num_lines):
    """Max abs/rel error of the f32 TPU spectrum vs the C oracle, both
    evaluated on the full headline workload by their own timing stages."""
    if spectrum is None or expected is None:
        return None
    err = np.abs(spectrum - expected)
    return {"max_abs_err": float(err.max()),
            "max_rel_err": float(err.max() / expected.max()),
            "workload_lines": int(num_lines)}


def make_chained(inner, args, per_call_points, per_call_evals, reps=5):
    """(warm, measure) pair for a jitted [B]-batched pipeline, timed with
    the same loop-carried fori chaining as the headline.  warm() pays the
    compile; measure() contains only the timed runs and also returns the
    final output so the caller's parity check reuses this compile."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(t, p, x, nreps):
        def body(i, carry):
            acc, tt = carry
            out = inner(tt, p, x)
            acc = acc + jnp.sum(out) * jnp.float32(1e-30)
            return (acc, tt + acc * 0)
        acc, tfin = jax.lax.fori_loop(0, nreps, body, (jnp.float32(0), t))
        return acc, inner(tfin, p, x)

    t, p, x = args

    def warm():
        float(chained(t, p, x, 1)[0])

    def measure():
        t0 = time.perf_counter()
        float(chained(t, p, x, 1)[0])
        one = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc, out = chained(t, p, x, reps + 1)
        float(acc)
        many = time.perf_counter() - t0
        per_call = max((many - one) / reps, 1e-9)
        return {"points_per_s": round(per_call_points / per_call, 1),
                "evals_per_s": round(per_call_evals / per_call, 1),
                "wall_s_per_call": round(per_call, 5)}, out

    return warm, measure


def chained_rate(inner, args, per_call_points, per_call_evals, reps=5):
    warm, measure = make_chained(inner, args, per_call_points,
                                 per_call_evals, reps)
    warm()
    return measure()


def prep_batched(pack, grid, num_layers=4):
    """Builds + compiles + warms the batched stage; the returned run()
    contains only the timed measurement (+ CPU-side oracle parity)."""
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
    warm, measure = make_chained(fn.inner, (t, p, x), num_layers * n,
                                 num_layers * window_evals(keep, n_per_v))
    warm()

    def run():
        result, out = measure()
        # Parity of the batched f32 device-physics path vs the compiled
        # reference C oracle across warm and cold layers, on the SAME full
        # pack and from the SAME compiled program as the timing (no second
        # pipeline build / remote compile).
        import oracle
        if oracle.available():
            got = np.asarray(out, np.float64)
            errs = []
            for i in range(num_layers):
                want = oracle.absorption(pack, float(t[i]), float(p[i]),
                                         float(x[i]), v0, vn, n_per_v,
                                         cut_off=CUT_OFF)
                errs.append(np.abs(got[i] - want).max() / want.max())
            result["max_rel_err_vs_oracle"] = float(np.max(errs))
        return result

    return run


def batched_rate(pack, grid, num_layers=4):
    return prep_batched(pack, grid, num_layers)()


def multigas_packs():
    names = ["H2O", "CO2", "O3", "N2O", "CO", "CH4", "O2"]
    packs = {}
    for g, name in enumerate(names):
        packs[name] = synthetic_line_pack(
            name, num_lines=300000 if name == "H2O" else 20000,
            nu_min=0.5, nu_max=5100.0, seed=g + 1,
            band_centers=(150.0 + 400 * g, 1600.0, 3700.0))
    return packs


def prep_multigas(grid, num_layers=4):
    """Config-2 seven-gas quickstart shape in ONE stacked launch."""
    from pylbl_tpu.parallel.lines import (derive_envelope,
                                          make_multigas_batched_fn,
                                          stack_device_packs)

    packs = multigas_packs()
    arrays, host, static, _ = stack_device_packs(packs, grid)
    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    t_max, p_max_atm = derive_envelope(t, p)
    fn = make_multigas_batched_fn(packs, grid, t_max=t_max,
                                  p_max_atm=p_max_atm)
    x = np.full((num_layers, len(packs)), 1e-4, np.float32)
    warm, measure = make_chained(
        fn.inner, (t, p, x),
        num_layers * len(packs) * static["num_points"],
        num_layers * window_evals(static["num_lines"],
                                  static["n_per_v"]))
    warm()

    def run():
        result, _ = measure()
        result["gases"] = len(packs)
        result["total_lines"] = static["num_lines"]
        return result

    return run


def multigas_rate(grid, num_layers=4):
    return prep_multigas(grid, num_layers)()


def prep_config5(num_layers=16, block=4):
    """Config-5 at scale: 500k-point grid x 16 layers x 7 gases, the
    stacked total-format launch (device-reduced [B, n]) streamed blockwise
    to a resumable file.  SURVEY 5 long-context / BASELINE config 5; the
    reference evaluates this shape gas-by-gas, layer-by-layer in the C
    loop (absorption.c:76-87) with no batching or device residency.

    The one-time build + remote compile measured up to ~435 s through the
    tunnel; prep pays all of it, run() is the ~3 s streamed computation.
    """
    from pylbl_tpu.parallel.lines import (derive_envelope,
                                          make_multigas_batched_fn,
                                          stack_device_packs)
    from pylbl_tpu.utils.streaming import StreamingWriter

    grid = np.arange(1.0, 5000.0, 0.01)
    packs = multigas_packs()
    _, _, static, _ = stack_device_packs(packs, grid)
    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    x = np.full((num_layers, len(packs)), 1e-4, np.float32)
    t_max, p_max_atm = derive_envelope(t, p)
    fn = make_multigas_batched_fn(packs, grid, t_max=t_max,
                                  p_max_atm=p_max_atm)
    nblocks = num_layers // block
    # Compile (first block shape) + warm, outside the timed region.
    out = fn.total(t[:block], p[:block], x[:block])
    float(np.asarray(out[0, 0]))

    def run():
        path = Path(tempfile.mkdtemp(prefix="pylbl_bench_")) / "config5.h5"
        t0 = time.perf_counter()
        with StreamingWriter(path, num_layers, grid,
                             ["absorption_total"]) as writer:
            for b in range(nblocks):
                sl = slice(b * block, (b + 1) * block)
                beta = np.asarray(fn.total(t[sl], p[sl], x[sl]),
                                  np.float64)
                for i in range(block):
                    # Internal grid -> user grid truncation (the
                    # reference's k[:grid.size] contract,
                    # spectroscopy.py:191).
                    writer.write_state(
                        b * block + i,
                        {"absorption_total": beta[i, :grid.size]})
        wall = time.perf_counter() - t0
        nbytes = path.stat().st_size
        evals = num_layers * window_evals(static["num_lines"],
                                          static["n_per_v"])
        result = {
            "grid_points": int(grid.size),
            "layers": num_layers,
            "gases": len(packs),
            "total_lines": static["num_lines"],
            "wall_s": round(wall, 2),
            "points_per_s": round(num_layers * grid.size / wall, 1),
            "evals_per_s": round(evals / wall, 1),
            "bytes_written": int(nbytes),
        }
        path.unlink()
        return result

    return run


def config5_streamed(num_layers=16, block=4):
    return prep_config5(num_layers, block)()


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


def start_extras(flag_dir):
    """Launches tools/bench_extras.py: builds + warms the TPU extra
    stages concurrently with the headline's compile, then waits for the
    headline_done flag before its timed runs (device-exclusive timing on
    both sides; remote compiles overlap)."""
    return subprocess.Popen(
        [sys.executable, str(REPO / "tools" / "bench_extras.py"),
         str(flag_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=str(REPO))


def collect_extras(proc):
    if proc is None:
        return None
    budget = max(300.0, _T0 + 1900.0 - time.perf_counter())
    try:
        out, _ = proc.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        return None
    if proc.returncode != 0:
        return None
    try:
        return json.loads(out.strip().splitlines()[-1])
    except Exception:
        return None


def main():
    timings = {}
    flag_dir = Path(tempfile.mkdtemp(prefix="pylbl_bench_flags_"))
    try:
        extras_proc = start_extras(flag_dir)
    except Exception:
        extras_proc = None
    pack, grid = build_workload()
    # Reference C single-core rate FIRST, on an uncontended host (the
    # CPU-mesh scaling subprocess below would otherwise compete for the
    # 2 vCPUs and skew the measurement), on the FULL headline workload.
    ref, expected = reference_rate(pack, grid)
    timings["reference_c_s"] = round(time.perf_counter() - _T0, 1)
    try:
        scaling_proc = start_scaling_cpu_mesh()
    except Exception:
        scaling_proc = None
    # The axon tunnel's remote-compile RPC occasionally drops mid-read
    # ("response body closed before all bytes were read"); one retry after
    # a short pause reliably recovers.  Warm (compile-dominated) first;
    # the timed measurement waits for the extras subprocess to finish its
    # own warmups so the two never execute on the device concurrently.
    for attempt in range(3):
        try:
            measure = tpu_warm(pack, grid)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20.0)
    timings["headline_warm_s"] = round(time.perf_counter() - _T0, 1)
    if extras_proc is not None:
        wait_until = time.perf_counter() + min(
            600.0, max(0.0, _T0 + 1500.0 - time.perf_counter()))
        while (extras_proc.poll() is None
               and not (flag_dir / "warm_done").exists()
               and time.perf_counter() < wait_until):
            time.sleep(2.0)
        timings["warm_wait_s"] = round(
            time.perf_counter() - _T0 - timings["headline_warm_s"], 1)
    rate, points_rate, spectrum = measure()
    (flag_dir / "headline_done").touch()
    timings["headline_s"] = round(time.perf_counter() - _T0, 1)
    vs_baseline = rate / PINNED_C_EVALS_PER_S

    extra = {"single_layer_points_per_s": round(points_rate, 1),
             "pinned_c_evals_per_s": PINNED_C_EVALS_PER_S,
             "reference_c_evals_per_s_live": round(ref, 1) if ref else None,
             "parity": parity(spectrum, expected, pack.nu.size)}
    stage_keys = ("batched_4layer", "config5", "multigas_7gas")
    extras_results = collect_extras(extras_proc)
    if extras_results is not None:
        for key in stage_keys:
            extra[key] = extras_results.get(key, "missing")
        timings.update(extras_results.get("_timings", {}))
    else:
        # Subprocess unavailable: sequential in-process fallback under
        # the original deadline logic.
        extra["extras_subprocess"] = "failed; sequential fallback"
        stages = (("batched_4layer", lambda: batched_rate(pack, grid),
                   0.0, 0.0),
                  ("config5", config5_streamed, 160.0, 0.0),
                  ("multigas_7gas", lambda: multigas_rate(grid),
                   0.0, 160.0))
        for key, fn, reserve, grace in stages:
            if time.perf_counter() - _T0 > DEADLINE_S + grace:
                extra[key] = "skipped (deadline)"
                continue
            t0 = time.perf_counter()
            budget = (DEADLINE_S + grace + 60.0 - reserve
                      - (time.perf_counter() - _T0))
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
