#!/usr/bin/env python
"""Microbenchmark of the Pallas line-summation passes on the live device.

Measures honest per-spectrum device time by chaining R kernel invocations
inside one jitted fori_loop with a loop-carried data dependence (so XLA
cannot hoist the call) and differencing R=1 vs R=many around a single
4-byte readback sync.  Single-call wall times through the axon tunnel are
dominated by ~30 ms RPC round-trips and say nothing about the kernel.

Usage: python tools/kernel_microbench.py [num_lines] [reps]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                     # noqa: E402
import jax.numpy as jnp        # noqa: E402

from pylbl_tpu.database.fixtures import synthetic_line_pack   # noqa: E402
from pylbl_tpu.models.lines import internal_grid              # noqa: E402
from pylbl_tpu.models.lines.physics import (kernel_inputs,    # noqa: E402
                                            line_profile_params)
from pylbl_tpu.ops import lineshape                           # noqa: E402
from pylbl_tpu.ops import lineshape_pallas as lp              # noqa: E402
from pylbl_tpu.ops.lineshape import core_halfwidth            # noqa: E402

CUT_OFF = 25


def workload(num_lines):
    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(1.0, 5000.0, 0.1)
    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    params = line_profile_params(pack, 288.99, 98388.0, 6.637074e-03,
                                 keep=keep)
    kin = kernel_inputs(params, v0, n_per_v, CUT_OFF)
    arrays = lineshape.prepare_kernel_arrays(kin, n_per_v, np.float32)
    return arrays, kin, n, n_per_v, keep


def chained_time(fn, reps):
    """Device time per call of fn (a jitted scalar-returning closure over
    an integer rep count), by differencing 1 vs reps+1 chained calls."""
    float(fn(1))
    t0 = time.perf_counter()
    float(fn(1))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(reps + 1))
    many = time.perf_counter() - t0
    return (many - one) / reps


def main():
    num_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    arrays, kin, n, n_per_v, keep = workload(num_lines)
    tile, chunk = lp.DEFAULT_TILE, lp.DEFAULT_CHUNK
    soa, _ = lp.pack_lines_soa(arrays, chunk)
    s_idx = arrays["s_idx"].astype(np.int64)
    e_idx = arrays["e_idx"].astype(np.int64)
    w_start, w_n = lp.tile_line_ranges(s_idx, e_idx, n, tile, chunk)
    core_w = core_halfwidth({"y": kin["y"], "repwid": kin["repwid"]},
                            n_per_v, CUT_OFF)
    center = np.rint(arrays["c_int"]).astype(np.int64)
    c_start, c_n = lp.tile_line_ranges(
        np.maximum(center - core_w, s_idx),
        np.minimum(center + core_w, e_idx), n, tile, chunk)
    cs_w, ce_w = lp.core_instance_windows(arrays, kin, n, n_per_v, CUT_OFF)
    inst_line, g_start, g_n = lp.build_core_groups(
        cs_w, ce_w, n, tile, sort_key=arrays["y"])
    groups = lp.gather_group_params(arrays, inst_line)
    soa_d, ws, wn, cs, cn = map(jax.device_put,
                                (soa, w_start, w_n, c_start, c_n))
    groups_d, gs, gn = map(jax.device_put, (groups, g_start, g_n))

    def make(kind, st, nc):
        @jax.jit
        def run(reps):
            def body(i, carry):
                acc, s = carry
                s = jnp.where(acc >= -1.0, s, 0.0)
                out = lp._pallas_pass(s, st, nc, int(n), tile, chunk, kind)
                return (acc + out[0], s)
            acc, _ = jax.lax.fori_loop(0, reps, body,
                                       (jnp.float32(0), soa_d))
            return acc
        return run

    @jax.jit
    def rows_core(reps):
        def body(i, carry):
            acc, g = carry
            g = jnp.where(acc >= -1.0, g, 0.0)
            out = lp._pallas_rows_pass(g, gs, gn, int(n), tile)
            return (acc + out[0], g)
        acc, _ = jax.lax.fori_loop(0, reps, body,
                                   (jnp.float32(0), groups_d))
        return acc

    seg_inst, seg0, t_start, t_chunks, c_slot = lp.build_core_segments(
        cs_w, ce_w, n, tile=tile, chunk=lp.ROWS_CHUNK,
        sort_key=arrays["y"])
    seg_params = lp.gather_segment_params(arrays, seg_inst, seg0)
    params_d, ts_d, tc_d, slot_d = map(
        jax.device_put, (seg_params, t_start, t_chunks, c_slot))

    @jax.jit
    def seg_core(reps):
        def body(i, carry):
            acc, p = carry
            p = jnp.where(acc >= -1.0, p, 0.0)
            out = lp._pallas_seg_pass(p, ts_d, tc_d, slot_d, int(n), tile,
                                      lp.ROWS_CHUNK)
            return (acc + jnp.sum(out) * jnp.float32(1e-30), p)
        acc, _ = jax.lax.fori_loop(0, reps, body,
                                   (jnp.float32(0), params_d))
        return acc

    @jax.jit
    def two_pass_seg(reps):
        def body(i, carry):
            acc, s, p = carry
            s = jnp.where(acc >= -1.0, s, 0.0)
            p = jnp.where(acc >= -1.0, p, 0.0)
            out = lp._pallas_pass(s, ws, wn, int(n), tile, chunk, "wings")
            out = out + lp._pallas_seg_pass(p, ts_d, tc_d, slot_d, int(n),
                                            tile, lp.ROWS_CHUNK)
            return (acc + jnp.sum(out) * jnp.float32(1e-30), s, p)
        acc, _, _ = jax.lax.fori_loop(0, reps, body,
                                      (jnp.float32(0), soa_d, params_d))
        return acc

    wings_stride = lp.pick_wings_stride(tile,
                                        int((e_idx - s_idx).max()) + 1)
    if wings_stride is not None:
        soa_st = soa.copy()
        num = keep
        assign = np.clip(s_idx, 0, None) // wings_stride
        soa_st[lp._PAD, :num] = assign.astype(np.float32)
        soa_st[lp._PAD, num:] = -1.0
        st2, nc2 = lp.strided_line_ranges(
            assign, (n - 1) // wings_stride + 1)
        soa_st_d, st2_d, nc2_d = map(jax.device_put, (soa_st, st2, nc2))

        @jax.jit
        def wings_strided(reps):
            def body(i, carry):
                acc, s = carry
                s = jnp.where(acc >= -1.0, s, 0.0)
                out = lp._pallas_pass_strided(s, st2_d, nc2_d, int(n),
                                              tile, wings_stride)
                return (acc + out[0], s)
            acc, _ = jax.lax.fori_loop(0, reps, body,
                                       (jnp.float32(0), soa_st_d))
            return acc

        @jax.jit
        def two_pass_strided(reps):
            def body(i, carry):
                acc, s, p = carry
                s = jnp.where(acc >= -1.0, s, 0.0)
                p = jnp.where(acc >= -1.0, p, 0.0)
                out = lp._pallas_pass_strided(s, st2_d, nc2_d, int(n),
                                              tile, wings_stride)
                out = out + lp._pallas_seg_pass(p, ts_d, tc_d, slot_d,
                                                int(n), tile,
                                                lp.ROWS_CHUNK)
                return (acc + jnp.sum(out) * jnp.float32(1e-30), s, p)
            acc, _, _ = jax.lax.fori_loop(
                0, reps, body, (jnp.float32(0), soa_st_d, params_d))
            return acc
    else:
        wings_strided = two_pass_strided = None

    ymin = lp.group_min_y(groups)
    ymin_d = jax.device_put(ymin)

    @jax.jit
    def rows_core_vmem(reps):
        def body(i, carry):
            acc, g = carry
            g = jnp.where(acc >= -1.0, g, 0.0)
            out = lp._pallas_rows_pass_vmem(g, ymin_d, gs, gn, int(n), tile)
            return (acc + out[0], g)
        acc, _ = jax.lax.fori_loop(0, reps, body,
                                   (jnp.float32(0), groups_d))
        return acc

    @jax.jit
    def two_pass(reps):
        def body(i, carry):
            acc, s, g = carry
            s = jnp.where(acc >= -1.0, s, 0.0)
            g = jnp.where(acc >= -1.0, g, 0.0)
            out = lp._pallas_pass(s, ws, wn, int(n), tile, chunk, "wings")
            out = out + lp._pallas_rows_pass(g, gs, gn, int(n), tile)
            return (acc + out[0], s, g)
        acc, _, _ = jax.lax.fori_loop(0, reps, body,
                                      (jnp.float32(0), soa_d, groups_d))
        return acc

    evals = keep * ((2 * CUT_OFF + 1) * n_per_v + 1)
    slots = int(g_n.sum()) * lp.ROWS_CHUNK * 8
    seg_slots = int(seg_inst.size)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    stages = [
        ("wings", make("wings", ws, wn), int(w_n.sum()) * chunk),
        ("core-scalar", make("core", cs, cn), int(c_n.sum()) * chunk),
        ("core-rows", rows_core, slots),
        ("core-rows-vmem", rows_core_vmem, slots),
        ("core-seg", seg_core, seg_slots),
        ("two-pass", two_pass, None),
        ("two-pass-seg", two_pass_seg, None)]
    if wings_strided is not None:
        stages += [(f"wings-strided[{wings_stride}]", wings_strided, None),
                   ("two-pass-strided", two_pass_strided, None)]
    for name, fn, visits in stages:
        if only is not None and name not in only:
            continue
        dt = chained_time(fn, reps)
        line = f"{name:12s} {dt * 1e3:8.2f} ms/spectrum"
        if visits:
            line += f"  ({visits} line-tile visits / instance slots)"
        else:
            line += f"  ({evals / dt / 1e9:.1f} G ref-evals/s)"
        print(line)


if __name__ == "__main__":
    main()
