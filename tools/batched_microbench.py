#!/usr/bin/env python
"""Stage-by-stage timing of the batched multi-layer pipeline.

Times the PRODUCTION pipeline's stages via the handles make_batched_tpu_fn
exposes (fn.assemble_layer / fn.core_plan / fn.wings_plan / fn.inner), so
the split cannot drift from the shipped code.  Each stage is timed with
the chained fori_loop method (see tools/kernel_microbench.py for why
single-dispatch timing lies on axon).

Usage: python tools/batched_microbench.py [num_lines] [num_layers] [reps] [core_mode]
       python tools/batched_microbench.py multigas [num_layers] [reps] [core_mode] [wings_chunk] [grid_step] [tile] [wings_tail]

``core_mode`` (seg | segmix) selects the core-pass formulation and
``wings_chunk`` (multigas form; 256 default, 128) the strided wings DMA
chunk, for A/B.

The ``multigas`` form times the 7-gas stacked launch (bench.multigas_packs)
through make_multigas_batched_fn's handles instead: assembly, the strided
wings pass over the flat [G * n] grid, the seg core pass, and the full
stacked pipeline.
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
from pylbl_tpu.parallel import lines as pl_lines              # noqa: E402

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
    multigas = len(sys.argv) > 1 and sys.argv[1] == "multigas"
    num_lines = (300000 if multigas or len(sys.argv) <= 1
                 else int(sys.argv[1]))
    num_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    core_mode = sys.argv[4] if len(sys.argv) > 4 else None

    if multigas:
        wings_chunk = int(sys.argv[5]) if len(sys.argv) > 5 else None
        step = float(sys.argv[6]) if len(sys.argv) > 6 else 0.1
        tile = int(sys.argv[7]) if len(sys.argv) > 7 else None
        wings_tail = int(sys.argv[8]) if len(sys.argv) > 8 else None
        grid = np.arange(1.0, 5000.0, step)
        run_multigas_stages(grid, num_layers, reps, core_mode, wings_chunk,
                            tile, wings_tail)
        return
    grid = np.arange(1.0, 5000.0, 0.1)

    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    v0, vn, n_per_v, n = internal_grid(grid)

    # Canonical-column-like spread of layers, surface to cold stratosphere.
    temperature = np.linspace(203.37, 288.99, num_layers).astype(np.float32)
    pressure = np.geomspace(117.0, 98388.0, num_layers).astype(np.float32)
    vmr = np.full(num_layers, 6.637074e-03, np.float32)
    t_d, p_d, x_d = map(jnp.asarray, (temperature, pressure, vmr))

    fn = pl_lines.make_batched_tpu_fn(pack, grid, cut_off=CUT_OFF,
                                      core_mode=core_mode)
    assemble = fn.assemble_layer
    core_plan = fn.core_plan
    wings_stride = fn.wings_stride
    ws_d, wn_d = map(jnp.asarray, fn.wings_csr)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)

    arrays_np, static = pl_lines.device_line_pack(pack, grid,
                                                  cut_off=CUT_OFF)
    arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}

    def physics_only(t, p, x):
        ka = pl_lines.line_kernel_arrays(arrays_dev, static, t, p, x)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in ka.values())

    @jax.jit
    def physics_stage_(reps):
        def body(i, carry):
            acc, t = carry
            s = jax.vmap(physics_only)(t, p_d, x_d)
            return (acc + s[0], t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    @jax.jit
    def assembly_stage_(reps):
        def body(i, carry):
            acc, t = carry
            wings_in, core = jax.vmap(assemble)(t, p_d, x_d)
            # Reduce over the FULL outputs: a single-element readback lets
            # XLA dead-code-eliminate most of the assembly (the "0.76 ms"
            # artifact documented in CLAUDE.md).
            return (acc + (jnp.sum(wings_in) + jnp.sum(core))
                    * jnp.float32(1e-30),
                    t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    wings0, core0 = jax.jit(jax.vmap(assemble))(t_d, p_d, x_d)
    wings0 = jax.device_put(wings0)
    core0 = jax.device_put(core0)

    def chained(pass_fn, block0):
        # Pallas outputs are DCE-safe (a pallas_call runs whole), so a
        # single-element carry suffices here.
        @jax.jit
        def stage_(block0, reps):
            def body(i, carry):
                acc, g = carry
                g = jnp.where(acc >= -1.0, g, 0.0)
                out = pass_fn(g)
                return (acc + out[0, 0], g)
            acc, _ = jax.lax.fori_loop(0, reps, body,
                                       (jnp.float32(0), block0))
            return acc
        return lambda reps: stage_(block0, reps)

    if wings_stride is not None:
        def wings_pass(soa):
            return lp._pallas_pass_strided(soa, ws_d, wn_d, int(n),
                                           lp.DEFAULT_TILE, wings_stride,
                                           chunk=fn.wings_chunk,
                                           prepacked=fn.wings_prepacked)
    else:
        def wings_pass(soa):
            batch = soa.shape[0]
            return lp._pallas_pass_batched(
                soa, jnp.broadcast_to(ws_d, (batch,) + ws_d.shape),
                jnp.broadcast_to(wn_d, (batch,) + wn_d.shape), int(n),
                lp.DEFAULT_TILE, lp.DEFAULT_CHUNK, "wings")

    @jax.jit
    def full_(reps):
        def body(i, carry):
            acc, t = carry
            out = fn.inner(t, p_d, x_d)
            return (acc + out[0, 0], t + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    stages = [("physics", physics_stage_),
              ("assemble(phys+blocks)", assembly_stage_),
              (f"wings[{wings_stride or 'tile'}]",
               chained(wings_pass, wings0))]
    if core_plan.mode in ("seg", "segmix"):
        stages.append((f"core-{core_plan.mode}[{core_plan.num_instances}]",
                       chained(lambda g: core_plan.seg_pass(g), core0)))
    stages.append(("full-batched", full_))

    print(f"lines={keep} layers={num_layers} grid={n} "
          f"core_mode={core_plan.mode} "
          f"wings_stride={wings_stride}")
    for name, stage in stages:
        dt = chained_time(stage, reps)
        print(f"{name:28s} {dt * 1e3:9.2f} ms total "
              f"{dt * 1e3 / num_layers:8.2f} ms/layer")


def run_multigas_stages(grid, num_layers, reps, core_mode=None,
                        wings_chunk=None, tile=None, wings_tail=None):
    """Stage split of the 7-gas stacked launch via its production handles."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import bench

    packs = bench.multigas_packs()
    _, _, static, _ = pl_lines.stack_device_packs(packs, grid)
    flat_points = static["flat_points"]
    fn = pl_lines.make_multigas_batched_fn(packs, grid,
                                           core_mode=core_mode,
                                           wings_chunk=wings_chunk,
                                           tile=tile,
                                           wings_tail=wings_tail)
    core_plan = fn.core_plan
    wings_stride = fn.wings_stride
    ws_d, wn_d = map(jnp.asarray, fn.wings_csr)

    t = np.linspace(220.0, 300.0, num_layers).astype(np.float32)
    p = np.linspace(5000.0, 98388.0, num_layers).astype(np.float32)
    x = np.full((num_layers, len(packs)), 1e-4, np.float32)
    t_d, p_d, x_d = map(jnp.asarray, (t, p, x))

    @jax.jit
    def assembly_stage_(reps):
        def body(i, carry):
            acc, tt = carry
            wings_in, core = jax.vmap(fn.assemble_layer)(tt, p_d, x_d)
            return (acc + (jnp.sum(wings_in) + jnp.sum(core))
                    * jnp.float32(1e-30), tt + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    wings0, core0 = jax.jit(jax.vmap(fn.assemble_layer))(t_d, p_d, x_d)
    wings0 = jax.device_put(wings0)
    core0 = jax.device_put(core0)

    def chained(pass_fn, block0):
        @jax.jit
        def stage_(block0, reps):
            def body(i, carry):
                acc, g = carry
                g = jnp.where(acc >= -1.0, g, 0.0)
                out = pass_fn(g)
                return (acc + out[0, 0], g)
            acc, _ = jax.lax.fori_loop(0, reps, body,
                                       (jnp.float32(0), block0))
            return acc
        return lambda r: stage_(block0, r)

    tail_csr = fn.wings_tail_csr
    if wings_stride is not None:
        def wings_pass(soa):
            return lp._pallas_pass_strided(
                soa, ws_d, wn_d, flat_points, fn.tile, wings_stride,
                chunk=fn.wings_chunk, prepacked=fn.wings_prepacked,
                t_start=tail_csr[0] if tail_csr else None,
                t_n=tail_csr[1] if tail_csr else None,
                tail=fn.wings_tail or 128)
    else:
        def wings_pass(soa):
            batch = soa.shape[0]
            return lp._pallas_pass_batched(
                soa, jnp.broadcast_to(ws_d, (batch,) + ws_d.shape),
                jnp.broadcast_to(wn_d, (batch,) + wn_d.shape), flat_points,
                fn.tile, fn.wings_chunk, "wings_pre")

    @jax.jit
    def full_(reps):
        def body(i, carry):
            acc, tt = carry
            out = fn.inner(tt, p_d, x_d)
            return (acc + out[0, 0, 0], tt + acc * 0.0)
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), t_d))
        return acc

    stages = [("assemble(phys+blocks)", assembly_stage_),
              (f"wings[{wings_stride or 'tile'}]",
               chained(wings_pass, wings0)),
              (f"core-seg[{core_plan.num_instances}]",
               chained(lambda g: core_plan.seg_pass(g), core0)),
              ("full-stacked", full_)]
    print(f"multigas: lines={static['num_lines']} gases="
          f"{static['num_gases']} layers={num_layers} "
          f"flat={flat_points} wings_stride={wings_stride}")
    for name, stage in stages:
        dt = chained_time(stage, reps)
        print(f"{name:28s} {dt * 1e3:9.2f} ms total "
              f"{dt * 1e3 / num_layers:8.2f} ms/layer")


if __name__ == "__main__":
    main()
