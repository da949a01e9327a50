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

EVERY differenced timing is plausibility-guarded (round-3 lesson: device
contention once drove the R-vs-R+1 difference negative and a defensive
clamp turned it into a 1.5e17 evals/s headline).  A measurement whose
difference is non-positive or whose implied rate falls outside
[0.1x, 3000x] of the pinned C rate is re-measured; after two failures the
stage falls back to ABSOLUTE timing (enough chained reps that the ~30 ms
sync is <3% of the wall — a slight underestimate, never garbage) and the
result carries "method": "absolute".  No number is ever clamped.

All stages run SEQUENTIALLY IN ONE PROCESS so nothing ever shares the
device with a timed section (round 3's overlapped-compile subprocess
corrupted the headline and starved the extras).  Only the CPU-mesh
scaling stage runs as a subprocess — it never touches the TPU.

vs_baseline: ratio against the PINNED reference C single-core rate on the
identical workload (BASELINE.md "Pinned C baseline"); the live-measured C
rate for this run is carried in extra.

"extra" carries (each stage alarm-guarded so the headline always prints):
- max abs/rel error of the Pallas float32 spectrum vs the reference C
  oracle on the FULL headline workload;
- the production layer-batched pipeline rate (4 layers, one launch) and
  its per-layer oracle parity, from the same compile;
- the gas-stacked pipeline rate (7 gases in ONE launch vs 7);
- config-5 at scale: 500k-point grid x 16 layers x 7 gases, stacked
  total-format launches streamed to a resumable file (points/s + bytes);
- multi-device scaling of the line-sharded step on a virtual 8-device CPU
  mesh (subprocess; work-model efficiency per BASELINE).

Prints TWO JSON lines: the full record first, then a ~300-byte compact
headline summary LAST (the driver's tail capture truncated the full
line's head in rounds 2-4; the last line always survives and parses):
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}
    {"metric": ..., "value": ..., "vs_baseline": ..., "parity_max_rel": ..., "stages": {...}}
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
# New TPU stages stop *starting* after this much wall time, so one
# pathological remote compile (observed 229-1199 s through the tunnel)
# skips a stage instead of losing the whole artifact.
DEADLINE_S = 1500.0
_T0 = time.perf_counter()

# Reference C single-core rate on the FULL headline workload (300k-line
# pack seed 1, grid 1-5000 @0.1, surface layer, min-of-5 on an idle
# host) — see BASELINE.md "Pinned C baseline".  vs_baseline divides by
# this constant so the headline ratio is comparable across rounds; the
# live re-measurement is reported alongside in extra.
PINNED_C_EVALS_PER_S = 4.68e8
# Plausibility band for any measured evals/s: [0.1x, 3000x] the pinned C
# rate.  The top of the band (~1.4e12) is ~3x a v5e's speed-of-light for
# this ~60-flop/eval kernel; anything above it is a timing artifact.
RATE_LO = PINNED_C_EVALS_PER_S * 0.1
RATE_HI = PINNED_C_EVALS_PER_S * 3000.0


def elapsed():
    return time.perf_counter() - _T0


def over_deadline():
    return elapsed() > DEADLINE_S


class StageTimeout(Exception):
    pass


@contextmanager
def stage_alarm(seconds):
    """Hard per-stage wall limit: a slow remote compile inside one stage
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


def guarded_per_call(run_sync, reps, evals_per_call, timings=None):
    """R-vs-R+1 differenced seconds-per-call with plausibility guards.

    ``run_sync(nreps)`` must execute nreps chained calls on device and
    block until done (tiny readback).  Returns (per_call_s, method).
    Never returns a clamped or implausible number: two failed differencing
    attempts fall back to absolute timing with the sync amortized over
    enough reps to be <3% of the wall.
    """
    last_many = None
    samples = []
    for attempt in range(5):
        t0 = time.perf_counter()
        run_sync(1)
        one = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_sync(reps + 1)
        many = time.perf_counter() - t0
        last_many = many
        per = (many - one) / reps
        if per > 0 and RATE_LO <= evals_per_call / per <= RATE_HI:
            # Median of 3 valid samples: the device-side rate wobbles
            # ~15% run to run (clock/queue), far above the differencing
            # noise; the median damps it without cherry-picking.
            samples.append(per)
            if len(samples) == 3:
                return float(np.median(samples)), "chained-diff"
        elif timings is not None:
            timings[f"guard_retry_{attempt}"] = {
                "one_s": round(one, 4), "many_s": round(many, 4)}
    if samples:
        return float(np.median(samples)), "chained-diff"
    # Absolute fallback: size reps so the ~30 ms sync RPC is noise.
    per_est = max(last_many / (reps + 1), 1e-3)
    abs_reps = int(np.clip(np.ceil(2.0 / per_est), reps, 2000))
    t0 = time.perf_counter()
    run_sync(abs_reps)
    wall = time.perf_counter() - t0
    per = wall / abs_reps
    if RATE_LO <= evals_per_call / per <= RATE_HI:
        return per, "absolute"
    # Even real wall-clock over many reps is out of band: something is
    # structurally wrong (lost loop dependence, contention).  Surface the
    # honest wall-derived number but FLAG it — per VERDICT r3, a flagged
    # measurement beats a clamped one.
    return per, "invalid (implausible)"


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
    measure() closure whose wall contains ONLY the timed chained runs."""
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

    def measure(reps=30, timings=None):
        # reps=30: at ~4 ms/spectrum the differenced estimate carries the
        # tunnel's ~+-5 ms RPC jitter divided by reps (reps=10 showed a
        # 33-43 G run-to-run headline spread).
        per_spectrum, method = guarded_per_call(
            lambda r: run(r), reps, window_evals(keep, n_per_v), timings)
        _, out = run(1)
        spectrum = np.asarray(out, np.float64)
        assert np.isfinite(spectrum).all() and spectrum.max() > 0
        return (window_evals(keep, n_per_v) / per_spectrum,
                n / per_spectrum, spectrum, method)

    return measure


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
    compile; measure() contains only guarded timed runs and also returns
    the final output so the caller's parity check reuses this compile."""
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

    def run_sync(nreps):
        float(chained(t, p, x, nreps)[0])

    def warm():
        run_sync(1)

    def measure(timings=None):
        per_call, method = guarded_per_call(run_sync, reps, per_call_evals,
                                            timings)
        _, out = chained(t, p, x, 1)
        result = {"points_per_s": round(per_call_points / per_call, 1),
                  "evals_per_s": round(per_call_evals / per_call, 1),
                  "wall_s_per_call": round(per_call, 5)}
        if method != "chained-diff":
            result["method"] = method
        return result, out

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
    # reps=12: at ~27 ms/call the R-vs-R+1 difference carries the RPC
    # jitter divided by reps — 5 reps showed a 13% run-to-run spread.
    warm, measure = make_chained(fn.inner, (t, p, x), num_layers * n,
                                 num_layers * window_evals(keep, n_per_v),
                                 reps=12)
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
                                  static["n_per_v"]), reps=12)
    warm()

    def run():
        result, out = measure()
        result["gases"] = len(packs)
        result["total_lines"] = static["num_lines"]
        # Driver-captured stacked parity: every (gas, layer) of the SAME
        # compiled launch vs the reference C oracle.
        import oracle
        if oracle.available():
            from pylbl_tpu.models.lines import internal_grid as igrid
            v0, vn, n_per_v, _ = igrid(grid)
            got = np.asarray(out, np.float64)     # [B, G, n]
            errs = []
            for g, (name, pk) in enumerate(packs.items()):
                for i in range(num_layers):
                    want = oracle.absorption(pk, float(t[i]), float(p[i]),
                                             float(x[i, g]), v0, vn,
                                             n_per_v, cut_off=CUT_OFF)
                    errs.append(np.abs(got[i, g] - want).max()
                                / max(want.max(), 1e-300))
            result["max_rel_err_vs_oracle"] = float(np.max(errs))
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

    # Device-only rate via the chained method: the streamed wall is
    # bounded by the TUNNEL (32 MB result fetch; ~15 MB/s on a bad day
    # puts a ~2.3 s floor under a ~1.0 s compute) — this separates the
    # device's rate from the transport so the artifact carries both.
    import jax
    import jax.numpy as jnp
    tb, pb, xb = (jnp.asarray(t[:block]), jnp.asarray(p[:block]),
                  jnp.asarray(x[:block]))

    @jax.jit
    def chained(tt, pp, xx, nreps):
        def body(i, carry):
            acc, tc = carry
            k = fn.inner(tc, pp, xx)
            return (acc + k[0, 0, 0], tc + acc * 0)
        acc, _ = jax.lax.fori_loop(0, nreps, body, (jnp.float32(0), tt))
        return acc

    def run_sync(nreps):
        float(chained(tb, pb, xb, nreps))

    run_sync(1)
    evals_blk = block * window_evals(static["num_lines"],
                                     static["n_per_v"])

    def run():
        path = Path(tempfile.mkdtemp(prefix="pylbl_bench_")) / "config5.h5"
        t0 = time.perf_counter()
        compute_s = write_s = 0.0

        def dispatch(b):
            sl = slice(b * block, (b + 1) * block)
            return fn.total(t[sl], p[sl], x[sl])

        with StreamingWriter(path, num_layers, grid,
                             ["absorption_total"]) as writer:
            # Double-buffered: block b+1 is DISPATCHED (async) before
            # block b's result is fetched over the tunnel, so the device
            # computes the next block while the previous one transfers
            # (round-4's serialized fetch cost 0.9 of 2.5 s wall).  All
            # dispatches stay inside the timed region.
            dev = dispatch(0)
            for b in range(nblocks):
                tc = time.perf_counter()
                nxt = dispatch(b + 1) if b + 1 < nblocks else None
                beta = np.asarray(dev, np.float64)
                compute_s += time.perf_counter() - tc
                dev = nxt
                tw = time.perf_counter()
                for i in range(block):
                    # Internal grid -> user grid truncation (the
                    # reference's k[:grid.size] contract,
                    # spectroscopy.py:191).
                    writer.write_state(
                        b * block + i,
                        {"absorption_total": beta[i, :grid.size]})
                write_s += time.perf_counter() - tw
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
            # compute_fetch includes the device work AND the [4, 500k]
            # f32 result transfer over the tunnel; write is the chunked
            # netCDF append.  The split shows which side moved when the
            # total varies run to run (the device work is ~constant).
            "compute_fetch_s": round(compute_s, 2),
            "write_s": round(write_s, 2),
            "points_per_s": round(num_layers * grid.size / wall, 1),
            "evals_per_s": round(evals / wall, 1),
            "bytes_written": int(nbytes),
        }
        # Streamed wall includes real device->host transfer + file IO; a
        # sub-0.3 s wall for a 64 MB write would mean the measurement
        # raced the writer, not that the device got faster.
        if wall < 0.3:
            result["note"] = "implausibly fast; treat as invalid"
        path.unlink()
        return result

    def device_rate():
        per_call, method = guarded_per_call(run_sync, 3, evals_blk)
        out = {"device_evals_per_s": round(evals_blk / per_call, 1)}
        if method != "chained-diff":
            out["device_method"] = method
        return out

    run.device_rate = device_rate
    return run


def config5_streamed(num_layers=16, block=4):
    run = prep_config5(num_layers, block)
    # The first streamed pass after the build pays one-off dispatch and
    # cold-tunnel-transfer costs (measured 5.6 s vs 1.2 s steady); report
    # the steady-state pass and carry the cold wall for transparency.
    cold = run()
    warm = run()
    warm["cold_wall_s"] = cold.get("wall_s")
    # Tunnel-independent device rate (see prep_config5.device_rate).
    # Guarded so a stage alarm firing during ITS compile keeps the
    # already-measured streamed result instead of losing the stage.
    try:
        warm.update(run.device_rate())
    except Exception as exc:
        warm["device_rate_note"] = f"skipped ({type(exc).__name__})"
    return warm


def prep_sharded_1chip(pack, grid, num_layers=4):
    """The multi-device mesh step on ONE chip (spec=1, Pallas backend).

    Every shard of the mesh path runs the same strided-wings + mixed-slot
    core kernels as the single-chip pipeline; this measures the per-shard
    rate of that composition so the scaling work-model multiplies a
    KERNEL rate, not the portable XLA fallback's.  Comparable to
    batched_4layer (same workload shape, same evals denominator)."""
    import jax
    import jax.numpy as jnp
    from pylbl_tpu.parallel import make_mesh, shard_line_pack
    from pylbl_tpu.parallel.lines import make_lines_sharded_step

    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    mesh = make_mesh(devices=jax.devices()[:1], batch=1, spec=1)
    blocks, q_table, static, info = shard_line_pack(pack, grid, 1,
                                                    mode="balanced")
    step = make_lines_sharded_step(static, info, mesh,
                                   weight_density=False, blocks=blocks,
                                   backend="pallas")
    plan = jax.tree.map(jnp.asarray, step.call_blocks)
    q_dev = jnp.asarray(q_table)
    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    x = np.full(num_layers, VMR, np.float32)

    # Plan + q threaded as ARGUMENTS (closures ride the remote-compile
    # payload; the plan is tens of MB).
    @jax.jit
    def chained(plan, q, tt, pp, xx, nreps):
        def body(i, carry):
            acc, tc = carry
            out = step(plan, q, tc, pp, xx)
            return (acc + jnp.sum(out) * jnp.float32(1e-30), tc + acc * 0)
        acc, _ = jax.lax.fori_loop(0, nreps, body, (jnp.float32(0), tt))
        return acc

    def run_sync(nreps):
        float(chained(plan, q_dev, t, p, x, nreps))

    run_sync(1)   # compile + warm
    evals = num_layers * window_evals(keep, n_per_v)

    def run():
        per_call, method = guarded_per_call(run_sync, 5, evals)
        result = {"evals_per_s": round(evals / per_call, 1),
                  "points_per_s": round(num_layers * n / per_call, 1),
                  "wall_s_per_call": round(per_call, 5),
                  "backend": step.backend}
        if method != "chained-diff":
            result["method"] = method
        return result

    return run


def sharded_1chip_rate(pack, grid, num_layers=4):
    return prep_sharded_1chip(pack, grid, num_layers)()


def start_scaling_cpu_mesh():
    """Launches tools/bench_scaling.py in a CPU subprocess (8 virtual
    devices).  Started up front: it needs no TPU, so it runs concurrently
    with the tunnel-bound TPU stages (it never shares the device with a
    timed TPU section; host-CPU overlap only perturbs untimed compile
    waits)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.Popen(
        [sys.executable, str(REPO / "tools" / "bench_scaling.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=str(REPO))


def collect_scaling(proc):
    if proc is None:
        return None
    budget = max(30.0, DEADLINE_S + 300.0 - elapsed())
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
    # 2 vCPUs and skew the measurement), on the FULL headline workload.
    ref, expected = reference_rate(pack, grid)
    timings["reference_c_s"] = round(elapsed(), 1)
    try:
        scaling_proc = start_scaling_cpu_mesh()
    except Exception:
        scaling_proc = None
    # The axon tunnel's remote-compile RPC occasionally drops mid-read
    # ("response body closed before all bytes were read"); one retry after
    # a short pause reliably recovers.
    for attempt in range(3):
        try:
            measure = tpu_warm(pack, grid)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20.0)
    timings["headline_warm_s"] = round(elapsed(), 1)
    rate, points_rate, spectrum, method = measure(timings=timings)
    timings["headline_s"] = round(elapsed(), 1)
    vs_baseline = rate / PINNED_C_EVALS_PER_S

    extra = {"single_layer_points_per_s": round(points_rate, 1),
             "pinned_c_evals_per_s": PINNED_C_EVALS_PER_S,
             "reference_c_evals_per_s_live": round(ref, 1) if ref else None,
             "parity": parity(spectrum, expected, pack.nu.size)}
    if method != "chained-diff":
        extra["headline_method"] = method
    # Provisional headline record NOW: if the process dies mid-extras
    # (driver kill window, tunnel wedge past every guard), the captured
    # tail still ends in a parseable headline line.  The final compact
    # line printed last supersedes it in an intact run.
    provisional = compact_summary(rate, vs_baseline, extra)
    provisional["stages"] = "pending"
    print(json.dumps(provisional), flush=True)

    # TPU extra stages, sequential in THIS process (exclusive device).
    # Each is deadline- and alarm-guarded so a pathological remote
    # compile skips one stage instead of losing the artifact; an alarm
    # firing mid-compile leaves no concurrent device user behind.
    stages = (("batched_4layer", lambda: batched_rate(pack, grid)),
              ("multigas_7gas", lambda: multigas_rate(grid)),
              ("config5", config5_streamed),
              ("sharded_1chip", lambda: sharded_1chip_rate(pack, grid)))
    for key, fn in stages:
        if over_deadline():
            extra[key] = "skipped (deadline)"
            continue
        t0 = time.perf_counter()
        budget = min(700.0, DEADLINE_S + 250.0 - elapsed())
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
    # The driver keeps only the TAIL of stdout; the full line above is
    # ~7 KB, so its head (the headline fields) was truncated out of the
    # round-2..4 artifacts.  Print a compact summary line LAST — any tail
    # capture retains it, and a last-line JSON parse succeeds.
    print(json.dumps(compact_summary(rate, vs_baseline, extra)),
          flush=True)


def _stage_rate(v):
    """evals/s of a stage result, or the skip/error string, or None."""
    if isinstance(v, dict):
        rate = v.get("evals_per_s")
        return round(rate, 1) if rate is not None else None
    if isinstance(v, str):
        return v[:60]
    return None


def compact_summary(rate, vs_baseline, extra):
    """~300-byte headline record: what the artifact must never lose."""
    par = extra.get("parity")
    scal = extra.get("scaling_cpu_mesh")
    return {
        "metric": "voigt_line_point_evals_per_s",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2),
        "parity_max_rel": par.get("max_rel_err") if isinstance(par, dict) else None,
        "stages": {k: _stage_rate(extra.get(full)) for k, full in
                   (("batched", "batched_4layer"),
                    ("multigas", "multigas_7gas"),
                    ("config5", "config5"),
                    ("sharded_1chip", "sharded_1chip"))},
        "scaling_eff_at_8": scal.get("efficiency_at_8") if isinstance(scal, dict) else None,
    }


if __name__ == "__main__":
    main()
