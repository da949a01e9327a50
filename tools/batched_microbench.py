#!/usr/bin/env python
"""Stage-by-stage timing of the batched multi-layer pipeline.

Decomposes make_batched_tpu_fn into (physics + SoA/groups assembly) vs the
two Pallas passes, each timed with the chained fori_loop method (see
tools/kernel_microbench.py for why single-dispatch timing lies on axon).

Usage: python tools/batched_microbench.py [num_lines] [num_layers] [reps]
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
from pylbl_tpu.ops import lineshape_pallas as lp              # noqa: E402
from pylbl_tpu.ops.lineshape import core_halfwidths           # noqa: E402
from pylbl_tpu.parallel import lines as pl_lines              # noqa: E402
from pylbl_tpu.utils import constants as c                    # noqa: E402

CUT_OFF = 25


def chained_time(fn, reps):
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
    num_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(1.0, 5000.0, 0.1)
    v0, vn, n_per_v, n = internal_grid(grid)

    # Canonical-column-like spread of layers, surface to cold stratosphere.
    temperature = np.linspace(203.37, 288.99, num_layers).astype(np.float32)
    pressure = np.geomspace(117.0, 98388.0, num_layers).astype(np.float32)
    vmr = np.full(num_layers, 6.637074e-03, np.float32)
    t_d, p_d, x_d = map(jnp.asarray, (temperature, pressure, vmr))

    arrays_np, static = pl_lines.device_line_pack(pack, grid,
                                                  cut_off=CUT_OFF)
    keep = static["num_lines"]
    tile, chunk = lp.DEFAULT_TILE, lp.DEFAULT_CHUNK

    b0 = np.floor(pack.nu[:keep]).astype(np.int64)
    s_wide = (b0 - 1 - CUT_OFF - v0) * n_per_v
    e_wide = (b0 + 1 + CUT_OFF + 1 - v0) * n_per_v
    w_start, w_n = lp.tile_line_ranges(s_wide, e_wide, n, tile, chunk)
    alpha_ref = (pack.nu[:keep] / c.VLIGHT) * np.sqrt(
        c.R2 * 350.0 / np.maximum(pack.mass[:keep], 1.0))
    repwid_ref = c.SQRT_LN2 / np.maximum(alpha_ref, 1e-300)
    core_w = core_halfwidths(repwid_ref, n_per_v, CUT_OFF)
    shift_w = np.ceil(np.abs(pack.delta_air[:keep]) * 5.0
                      * n_per_v).astype(np.int64) + 1
    center0 = np.rint((pack.nu[:keep] - v0) * n_per_v).astype(np.int64)
    # Same envelope-widened core windows and y sort key the production
    # builder (parallel/lines.py make_batched_tpu_fn) feeds CorePlan.
    y_ref = c.SQRT_LN2 / np.maximum(
        (pack.nu[:keep] / c.VLIGHT) * np.sqrt(
            c.R2 * 275.0 / np.maximum(pack.mass[:keep], 1.0)), 1e-300
        ) * pack.gamma_air[:keep] * (296.0 / 275.0) ** pack.n_air[:keep]
    core_mode = sys.argv[4] if len(sys.argv) > 4 else None
    plan = lp.CorePlan(
        np.maximum(center0 - core_w - shift_w, s_wide),
        np.minimum(center0 + core_w + shift_w, e_wide), n, tile,
        sort_key=y_ref, mode=core_mode)
    plan._device_indices()

    arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    if plan.mode == "seg":
        arrays_inst_dev = {
            k: jnp.asarray(v)
            for k, v in plan.expand_line_arrays(arrays_np).items()}
    pad = -keep % chunk

    def assemble(t, p, x, arrays_dev):
        ka = pl_lines.line_kernel_arrays(arrays_dev, static, t, p, x)
        rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                ka["scaled_repwid"], ka["y"], ka["prefactor"],
                ka["s_idx"].astype(jnp.float32),
                ka["e_idx"].astype(jnp.float32),
                jnp.zeros_like(ka["c_frac"])]
        fill = [0.0, 0.0, 1.0, 1.0, 0.0, -1.0, -2.0, 0.0]
        padded = [jnp.pad(r, (0, pad), constant_values=v)
                  for r, v in zip(rows, fill)]
        soa = jnp.stack(padded, axis=0)
        if plan.mode == "seg":   # production: physics in instance space
            ka_i = pl_lines.line_kernel_arrays(arrays_inst_dev, static,
                                               t, p, x)
            core = plan.seg_params(ka_i, xp=jnp)
        else:
            core = plan.gather(
                {"c_int": ka["c_int"], "c_frac": ka["c_frac"],
                 "scaled_repwid": ka["scaled_repwid"], "y": ka["y"],
                 "prefactor": ka["prefactor"], "s_idx": ka["s_idx"],
                 "e_idx": ka["e_idx"]}, xp=jnp)
        return soa, core

    def physics_only(t, p, x, arrays_dev):
        ka = pl_lines.line_kernel_arrays(arrays_dev, static, t, p, x)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in ka.values())

    @jax.jit
    def assembly_stage_(arrays_dev, reps):
        def body(i, carry):
            acc, t = carry
            soa, core = jax.vmap(
                lambda a, b, c_: assemble(a, b, c_, arrays_dev))(
                    t, p_d, x_d)
            # Reduce over the FULL outputs: a single-element readback lets
            # XLA dead-code-eliminate most of the assembly (the "0.76 ms"
            # artifact documented in CLAUDE.md).
            return (acc + (jnp.sum(soa) + jnp.sum(core))
                    * jnp.float32(1e-30),
                    t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    def assembly_stage(reps):
        return assembly_stage_(arrays_dev, reps)

    @jax.jit
    def physics_stage_(arrays_dev, reps):
        def body(i, carry):
            acc, t = carry
            s = jax.vmap(
                lambda a, b, c_: physics_only(a, b, c_, arrays_dev))(
                    t, p_d, x_d)
            return (acc + s[0], t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    def physics_stage(reps):
        return physics_stage_(arrays_dev, reps)

    soa0, core0 = jax.jit(jax.vmap(
        lambda a, b, c_: assemble(a, b, c_, arrays_dev)))(t_d, p_d, x_d)
    soa0 = jax.device_put(soa0)
    core0 = jax.device_put(core0)
    ws_b = np.broadcast_to(w_start, (num_layers,) + w_start.shape).copy()
    wn_b = np.broadcast_to(w_n, (num_layers,) + w_n.shape).copy()

    ws_d, wn_d = jnp.asarray(ws_b), jnp.asarray(wn_b)

    @jax.jit
    def wings_stage_(soa0, ws_d, wn_d, reps):
        def body(i, carry):
            acc, s = carry
            s = jnp.where(acc >= -1.0, s, 0.0)
            out = lp._pallas_pass_batched(s, ws_d, wn_d, int(n), tile,
                                          chunk, "wings")
            return (acc + jnp.sum(out) * jnp.float32(1e-30), s)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), soa0))
        return acc

    def wings_stage(reps):
        return wings_stage_(soa0, ws_d, wn_d, reps)

    def core_pass(params):
        # Pallas outputs are DCE-safe (the pallas_call runs whole), so a
        # single-element carry suffices here.
        if plan.mode == "seg":
            return lp._pallas_seg_pass(params, plan.t_start, plan.t_chunks,
                                       plan.c_slot, int(n), tile, plan.chunk)
        return lp._pallas_rows_pass(params, plan.g_start, plan.g_n, int(n),
                                    tile)

    @jax.jit
    def core_stage_(core0, reps):
        def body(i, carry):
            acc, g = carry
            g = jnp.where(acc >= -1.0, g, 0.0)
            out = core_pass(g)
            return (acc + out[0, 0], g)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), core0))
        return acc

    def core_stage(reps):
        return core_stage_(core0, reps)

    @jax.jit
    def full_(arrays_dev, ws_d, wn_d, reps):
        def body(i, carry):
            acc, t = carry
            soa, core = jax.vmap(
                lambda a, b, c_: assemble(a, b, c_, arrays_dev))(
                    t, p_d, x_d)
            out = plan.wings_core(soa, ws_d, wn_d, core, chunk)
            return (acc + out[0, 0], t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    def full(reps):
        return full_(arrays_dev, ws_d, wn_d, reps)

    slots = (plan.inst_line.size if plan.mode == "seg"
             else int(plan.g_n.sum()) * lp.ROWS_CHUNK)
    print(f"lines={keep} layers={num_layers} grid={n} mode={plan.mode} "
          f"core_block={core0.shape} core_slots={slots}")
    for name, fn in [("physics", physics_stage),
                     ("assemble(phys+soa+gather)", assembly_stage),
                     ("wings-batched", wings_stage),
                     (f"core-batched[{plan.mode}]", core_stage),
                     ("full-batched", full)]:
        dt = chained_time(fn, reps)
        print(f"{name:28s} {dt * 1e3:9.2f} ms total "
              f"{dt * 1e3 / num_layers:8.2f} ms/layer")


if __name__ == "__main__":
    main()
