"""Sharded, jittable line-absorption pipeline.

End-to-end device computation of absorption spectra for a layer batch on a
(batch, spec) mesh:

- line physics (strength scaling, broadening, TIPS interpolation — the
  jnp mirror of models/lines/physics.py, reference spectra.c:17-45) runs
  replicated per batch shard, vectorized over its local layers;
- the spectral axis is domain-decomposed: every device owns a contiguous
  slab of the wavenumber grid and accumulates exactly the lines whose
  integer-aligned windows reach its slab.  Line inputs are replicated
  (line lists are tiny next to spectra: ~10 MB vs GBs of output for
  RFMIP-scale configs), so no halo exchange of *outputs* is ever needed —
  the physics-fixed window makes every shard's sum self-contained.

Precision note: the host path (models/lines/gas.py) computes physics in
float64 and is the bit-for-tolerance-parity path.  This device path keeps
line centers accurate in float32 by storing each line's grid-coordinate
center as an exact integer part plus fractional part precomputed on the
host for the target grid; only the (tiny) pressure-shift displacement is
computed on device.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import BATCH_AXIS, SPEC_AXIS
from ..ops import lineshape
from ..utils import constants as c


def device_line_pack(pack, grid, keep=None, cut_off=c.DEFAULT_CUT_OFF):
    """Prepares device-resident per-line arrays for a target grid.

    Args:
        pack: LinePack (host, float64).
        grid: target user grid (fixes v0/n_per_v for the split-center
            representation).
        keep: optional compat-break line count
            (pack.compat_break_filter result).

    Returns:
        (arrays dict of np.float32/[int32] arrays, static dict).
    """
    from ..models.lines.gas import internal_grid
    v0, vn, n_per_v, num_points = internal_grid(grid)
    if keep is None:
        keep = pack.compat_break_filter(v0, vn, cut_off)
    sl = slice(0, keep)
    center64 = (pack.nu[sl] - v0) * n_per_v
    c_base_int = np.rint(center64)
    arrays = {
        "c_base_int": c_base_int.astype(np.float32),
        "c_base_frac": (center64 - c_base_int).astype(np.float32),
        "nu": pack.nu[sl].astype(np.float32),
        "sw": pack.sw[sl].astype(np.float32),
        "gamma_air": pack.gamma_air[sl].astype(np.float32),
        "gamma_self": pack.gamma_self[sl].astype(np.float32),
        "n_air": pack.n_air[sl].astype(np.float32),
        "delta_air": pack.delta_air[sl].astype(np.float32),
        "elower": pack.elower[sl].astype(np.float32),
        "mass": pack.mass[sl].astype(np.float32),
        "q_row": np.clip(pack.iso[sl] - 1, 0,
                         pack.q_table.shape[0] - 1).astype(np.int32),
        "q_table": pack.q_table.astype(np.float32),
    }
    static = {"v0": v0, "vn": vn, "n_per_v": n_per_v,
              "num_points": num_points, "cut_off": cut_off,
              "q_t0": float(pack.q_temperature[0]),
              "num_lines": int(keep)}
    return arrays, static


def _q_interp(q_table, q_t0, q_row, temperature):
    """Uniform-grid TIPS interpolation (reference spectral_database.c:97-104),
    per isotopologue slot then gathered per line."""
    i = jnp.clip(jnp.floor(temperature).astype(jnp.int32) - int(q_t0), 0,
                 q_table.shape[-1] - 2)
    lo = q_table[:, i]
    hi = q_table[:, i + 1]
    frac = temperature - (i + int(q_t0))
    q_slots = lo + (hi - lo) * frac
    return q_slots[q_row]


def line_kernel_arrays(arrays, static, temperature, pressure,
                       volume_mixing_ratio):
    """Jittable physics: scalar T/p/vmr -> kernel arrays for one layer.

    Mirrors reference spectra.c:17-45 and physics.kernel_inputs.
    """
    n_per_v = static["n_per_v"]
    cut_off = static["cut_off"]
    v0 = static["v0"]

    p_atm = pressure * c.PA_TO_ATM
    partial = p_atm * volume_mixing_ratio
    tfact = 296.0 / temperature

    shift = p_atm * arrays["delta_air"]
    gamma = (arrays["gamma_air"] * (p_atm - partial)
             + arrays["gamma_self"] * partial) * tfact ** arrays["n_air"]
    alpha = (arrays["nu"] / c.VLIGHT) * jnp.sqrt(
        c.R2 * temperature / arrays["mass"])

    sb = jnp.exp(arrays["elower"] * c.C2 * (temperature - 296.0)
                 / (temperature * 296.0))
    g = jnp.exp((-c.C2 * arrays["nu"]) / temperature)
    gref = jnp.exp((-c.C2 * arrays["nu"]) / 296.0)
    se = (1.0 - g) / (1.0 - gref)
    q_t = _q_interp(arrays["q_table"], static["q_t0"], arrays["q_row"],
                    temperature)
    q_ref = _q_interp(arrays["q_table"], static["q_t0"], arrays["q_row"],
                      jnp.asarray(296.0, q_t.dtype))
    sw = arrays["sw"] * sb * se * (q_ref / q_t) * 1.0e-4

    repwid = jnp.asarray(c.SQRT_LN2, gamma.dtype) / alpha
    dc = shift * n_per_v
    center = arrays["c_base_int"] + (arrays["c_base_frac"] + dc)
    bucket = jnp.floor(center / n_per_v + v0)
    s_idx = ((bucket - cut_off - v0) * n_per_v).astype(jnp.int32)
    e_idx = ((bucket + cut_off + 1 - v0) * n_per_v).astype(jnp.int32)
    return {
        "c_int": arrays["c_base_int"].astype(jnp.int32),
        "c_frac": arrays["c_base_frac"] + dc,
        "scaled_repwid": repwid / n_per_v,
        "y": repwid * gamma,
        "prefactor": sw * c.RSQRPI * repwid,
        "s_idx": s_idx,
        "e_idx": e_idx,
    }


def _pad_to_chunk(kernel_arrays, chunk):
    num = kernel_arrays["prefactor"].shape[-1]
    pad = -num % chunk
    if pad == 0:
        return kernel_arrays
    def padded(name, value):
        a = kernel_arrays[name]
        width = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, width, constant_values=value)
    return {
        "c_int": padded("c_int", 0),
        "c_frac": padded("c_frac", 0.0),
        "scaled_repwid": padded("scaled_repwid", 1.0),
        "y": padded("y", 1.0),
        "prefactor": padded("prefactor", 0.0),
        "s_idx": padded("s_idx", -1),
        "e_idx": padded("e_idx", -2),
    }


def make_batched_tpu_fn(pack, grid, cut_off=c.DEFAULT_CUT_OFF,
                        tile=None, chunk=None, t_max=350.0, p_max_atm=5.0):
    """Builds the fused single-chip batched pipeline for one (gas, grid).

    Line constants transfer to the device once (~14 MB for a 300k-line
    molecule); each call then ships only the [B] layer conditions, runs the
    jnp physics on device and feeds the layer-batched Pallas kernel.  The
    per-tile line ranges are precomputed on the host from the *unshifted*
    line positions widened by one wavenumber (pressure shifts are
    sub-0.1 cm-1), so they are layer-independent; the in-kernel window
    masks use the exact per-layer windows.

    The layer-independent core-instance windows are sized per line for the
    hottest plausible layer (``t_max``, bounding the Doppler width from
    above) plus that line's own worst-case pressure shift at ``p_max_atm``
    atmospheres; calling the returned fn with conditions outside those
    bounds loses core-correction coverage at window edges (the wings term
    stays exact).  Defaults cover any terrestrial atmosphere with wide
    margin.

    Returns:
        fn(temperature[B], pressure[B], vmr[B]) -> jnp float32 [B, n]
        absorption cross sections on the internal grid.
    """
    import jax.numpy as jnp
    from ..ops import lineshape_pallas as lp
    from ..ops.lineshape import core_halfwidths

    tile = tile or lp.DEFAULT_TILE
    chunk = chunk or lp.DEFAULT_CHUNK
    arrays_np, static = device_line_pack(pack, grid, cut_off=cut_off)
    num_points = static["num_points"]
    n_per_v = static["n_per_v"]
    v0 = static["v0"]
    keep = static["num_lines"]
    if keep == 0:
        def empty(t, p, x):
            batch = jnp.atleast_1d(t).shape[0]
            return jnp.zeros((batch, num_points), jnp.float32)
        return empty

    # Layer-independent CSR from unshifted positions, +/-1 wavenumber slop.
    b0 = np.floor(pack.nu[:keep]).astype(np.int64)
    s_wide = (b0 - 1 - cut_off - v0) * n_per_v
    e_wide = (b0 + 1 + cut_off + 1 - v0) * n_per_v
    w_start, w_n = lp.tile_line_ranges(s_wide, e_wide, num_points, tile,
                                       chunk)
    # Rows-core instance grouping, layer-independent: per-line instance
    # windows use worst-case (t_max) Doppler widths plus each line's own
    # worst-case pressure-shift displacement at p_max_atm; the in-kernel
    # per-layer masks and the |x| < xlim0 zeroing keep each layer's sum
    # exact.
    alpha_ref = (pack.nu[:keep] / c.VLIGHT) * np.sqrt(
        c.R2 * t_max / np.maximum(pack.mass[:keep], 1.0))
    repwid_ref = c.SQRT_LN2 / np.maximum(alpha_ref, 1e-300)
    core_w = core_halfwidths(repwid_ref, n_per_v, cut_off)
    shift_w = np.ceil(np.abs(pack.delta_air[:keep]) * p_max_atm
                      * n_per_v).astype(np.int64) + 1
    center0 = np.rint((pack.nu[:keep] - v0) * n_per_v).astype(np.int64)
    # Sort key for group y-class homogeneity: per-line y at a reference
    # condition (275 K, 1 atm, air-broadened).  Layer conditions rescale
    # all lines' y by near-common factors, so the *ranking* is stable; the
    # kernel's group-min-y branch stays exact regardless (sorting only
    # affects how often the cheap branches are taken).
    y_ref = (c.SQRT_LN2 / np.maximum(
        (pack.nu[:keep] / c.VLIGHT) * np.sqrt(
            c.R2 * 275.0 / np.maximum(pack.mass[:keep], 1.0)), 1e-300)
        ) * pack.gamma_air[:keep] * (296.0 / 275.0) ** pack.n_air[:keep]
    inst_line, g_start, g_n = lp.build_core_groups(
        np.maximum(center0 - core_w - shift_w, s_wide),
        np.minimum(center0 + core_w + shift_w, e_wide),
        num_points, tile, sort_key=y_ref)

    arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    inst_line_dev = jnp.asarray(inst_line)
    pad = -keep % chunk

    @jax.jit
    def fn_jit(temperature, pressure, vmr):
        def one_layer(t, p, x):
            ka = line_kernel_arrays(arrays_dev, static, t, p, x)
            rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                    ka["scaled_repwid"], ka["y"], ka["prefactor"],
                    ka["s_idx"].astype(jnp.float32),
                    ka["e_idx"].astype(jnp.float32),
                    jnp.zeros_like(ka["c_frac"])]
            fill = [0.0, 0.0, 1.0, 100.0, 0.0, -1.0, -2.0, 0.0]
            padded = [jnp.pad(r, (0, pad), constant_values=v)
                      for r, v in zip(rows, fill)]
            soa = jnp.stack(padded, axis=0)       # [8, N_pad].
            groups = lp.gather_group_params(
                {"c_int": ka["c_int"], "c_frac": ka["c_frac"],
                 "scaled_repwid": ka["scaled_repwid"], "y": ka["y"],
                 "prefactor": ka["prefactor"], "s_idx": ka["s_idx"],
                 "e_idx": ka["e_idx"]}, inst_line_dev, xp=jnp)
            return soa, groups

        soa, groups = jax.vmap(one_layer)(temperature, pressure, vmr)
        batch = soa.shape[0]
        return lp._pallas_wings_rows_batched(
            soa, np.broadcast_to(w_start, (batch,) + w_start.shape),
            np.broadcast_to(w_n, (batch,) + w_n.shape),
            groups, g_start, g_n, num_points, tile, chunk, lp.ROWS_CHUNK)

    def fn(temperature, pressure, vmr):
        # The core-instance windows were sized for (t_max, p_max_atm);
        # outside that envelope core-correction coverage silently degrades
        # at window edges, so refuse rather than lose accuracy.
        t_check = np.asarray(temperature)
        p_check = np.asarray(pressure) * c.PA_TO_ATM
        if t_check.size and float(t_check.max()) > t_max:
            raise ValueError(
                f"temperature {float(t_check.max()):.1f} K exceeds the "
                f"kernel envelope t_max={t_max} K; rebuild with a larger "
                "t_max")
        if p_check.size and float(p_check.max()) > p_max_atm:
            raise ValueError(
                f"pressure {float(p_check.max()):.2f} atm exceeds the "
                f"kernel envelope p_max_atm={p_max_atm}; rebuild with a "
                "larger p_max_atm")
        return fn_jit(temperature, pressure, vmr)

    return fn


# Per-line block keys exchanged by the ring pass / sharded by nu-bucket.
_LINE_KEYS = ("c_base_int", "c_base_frac", "nu", "sw", "gamma_air",
              "gamma_self", "n_air", "delta_air", "elower", "mass", "q_row")
# Benign pad values: sw=0 makes the physics prefactor exactly 0, so padded
# entries scatter zeros; mass/nu > 0 keep the broadening math finite.
_LINE_PAD = {"c_base_int": 0.0, "c_base_frac": 0.0, "nu": 1.0, "sw": 0.0,
             "gamma_air": 1e-3, "gamma_self": 1e-3, "n_air": 0.0,
             "delta_air": 0.0, "elower": 0.0, "mass": 1.0, "q_row": 0}


def shard_line_pack(pack, grid, spec, cut_off=c.DEFAULT_CUT_OFF,
                    mode="halo"):
    """Partitions a molecule's line list into per-shard nu-bucket blocks.

    The spectral grid is split into ``spec`` contiguous slabs; lines are
    assigned by position (SURVEY 2.8 "line-list sharding"; the reference
    holds the full list in one process, absorption.c:67-87).  Window bounds
    come from the *unshifted* positions widened by one wavenumber, so the
    assignment is layer-independent (pressure shifts are sub-0.1 cm-1).

    Args:
        spec: number of spectral shards.
        mode: "halo" — each shard's block contains every line whose widened
              window intersects its slab (lines near boundaries are
              duplicated into both neighbors; zero collectives at run
              time);
              "ring" — each line appears in exactly its owner's block
              (minimal memory) and run time circulates blocks around the
              spec axis with lax.ppermute so neighbors' boundary lines
              reach every slab they touch;
              "balanced" — equal line COUNTS per shard regardless of
              position (spectra are band-clustered, so position-based
              slabs can be 3x+ imbalanced); every device accumulates the
              full grid for its lines and one psum_scatter over "spec"
              lands each device its slab.  Perfectly load-balanced
              compute at the cost of ~num_points/spec of reduce-scatter
              traffic per device (rides ICI).

    Returns:
        (blocks, q_table, static, info): blocks is a dict of [spec, L]
        float32/int32 arrays (L = max block length, padded with inert
        lines); info carries ring_steps/local_points/duplication stats.
    """
    from ..models.lines.gas import internal_grid
    v0, vn, n_per_v, num_points = internal_grid(grid)
    arrays, static = device_line_pack(pack, grid, cut_off=cut_off)
    keep = static["num_lines"]
    local_n = -(-num_points // spec)

    b0 = np.floor(pack.nu[:keep]).astype(np.int64)
    s_wide = (b0 - 1 - cut_off - v0) * n_per_v
    e_wide = (b0 + 1 + cut_off + 1 - v0) * n_per_v
    center = np.rint((pack.nu[:keep] - v0) * n_per_v).astype(np.int64)

    if keep == 0:
        los = his = np.zeros(spec, np.int64)
        ring_steps = 0
    elif mode == "halo":
        slab_lo = np.arange(spec, dtype=np.int64) * local_n
        # s_wide/e_wide are monotone in the (sorted) line positions, so
        # each shard's overlap set is one contiguous slice.
        los = np.searchsorted(e_wide, slab_lo, side="left")
        his = np.searchsorted(s_wide, slab_lo + local_n, side="left")
        ring_steps = 0
    elif mode == "ring":
        owner = np.clip(center // local_n, 0, spec - 1)
        shards = np.arange(spec, dtype=np.int64)
        los = np.searchsorted(owner, shards, side="left")
        his = np.searchsorted(owner, shards, side="right")
        reach_l = owner - np.clip(s_wide // local_n, 0, spec - 1)
        reach_r = np.clip(e_wide // local_n, 0, spec - 1) - owner
        ring_steps = int(min(max(reach_l.max(initial=0),
                                 reach_r.max(initial=0)), spec - 1))
    elif mode == "balanced":
        bounds = np.linspace(0, keep, spec + 1).round().astype(np.int64)
        los, his = bounds[:-1], bounds[1:]
        ring_steps = 0
    else:
        raise ValueError(f"unknown line-sharding mode '{mode}'")

    lengths = his - los
    block_len = int(lengths.max(initial=0))
    blocks = {}
    for key in _LINE_KEYS:
        src = arrays[key]
        out = np.full((spec, block_len), _LINE_PAD[key], dtype=src.dtype)
        for s in range(spec):
            out[s, :lengths[s]] = src[los[s]:his[s]]
        blocks[key] = out
    info = {"ring_steps": ring_steps, "block_len": block_len,
            "local_points": local_n, "padded_points": local_n * spec,
            "duplication": float(lengths.sum() / max(keep, 1)),
            "mode": mode}
    return blocks, arrays["q_table"], static, info


def make_lines_sharded_step(static, info, mesh, weight_density=True,
                            chunk=512):
    """Builds the jitted line-sharded multi-device absorption step.

    Unlike :func:`make_sharded_step` (lines replicated; every device does
    O(N * window) work), each device touches only its own block — per-
    device compute and line memory scale ~1/spec.  In "ring" mode the
    blocks circulate over the spec axis with ``lax.ppermute`` while each
    stop accumulates the masked contributions; XLA's latency-hiding
    scheduler overlaps the permute DMA with the accumulation compute on
    TPU (the double-buffered exchange of SURVEY 2.8).

    Returns:
        step(blocks, q_table, temperature[B], pressure[B], vmr[B])
        -> [B, padded_points] float32, batch sharded over "batch",
        spectra over "spec".  Cross sections [m2], or absorption [m-1]
        when ``weight_density``.
    """
    spec = mesh.shape[SPEC_AXIS]
    num_points = static["num_points"]
    local_n = info["local_points"]
    window = (2 * static["cut_off"] + 1) * static["n_per_v"] + 1
    core_w = min(128, (static["cut_off"] + 1) * static["n_per_v"])
    ring_steps = info["ring_steps"]
    # Ring schedule: "up" step r delivers the block of shard d-r (left
    # neighbors, windows reaching right into our slab), "down" the
    # mirror.  Offsets +r and -(spec-r) coincide mod spec; capping the
    # down chain at spec-1-R keeps every visited block distinct while the
    # up chain's wrap-around covers the remainder.
    up_steps = ring_steps
    dn_steps = min(ring_steps, spec - 1 - ring_steps)
    perm_up = [(i, (i + 1) % spec) for i in range(spec)]
    perm_dn = [(i, (i - 1) % spec) for i in range(spec)]

    balanced = info.get("mode") == "balanced"
    padded_n = local_n * spec

    def shard_fn(blocks, q_table, temperature, pressure, vmr):
        origin = jax.lax.axis_index(SPEC_AXIS) * local_n
        lines = {k: v[0] for k, v in blocks.items()}
        seg_n = padded_n if balanced else local_n

        def accumulate_block(lines_blk, k_acc):
            full = dict(lines_blk)
            full["q_table"] = q_table

            def one_layer(t, p, x):
                ka = _pad_to_chunk(
                    line_kernel_arrays(full, static, t, p, x), chunk)
                # In balanced mode every device accumulates from grid
                # origin 0; the origin*0 keeps the spec-axis tag so the
                # scan carry's varying manual axes match its body.
                origin_v = (origin * 0 if balanced else origin) \
                    + (t * 0).astype(jnp.int32)
                return lineshape.accumulate_segment(
                    ka, origin_v, seg_n, num_points, window, core_w,
                    chunk)

            return k_acc + jax.vmap(one_layer)(temperature, pressure, vmr)

        batch = temperature.shape[0]
        k = accumulate_block(
            lines, jnp.zeros((batch, seg_n), jnp.float32)
            + (origin * 0).astype(jnp.float32))
        up = dn = lines
        for _ in range(up_steps):
            up = jax.tree.map(
                lambda a: jax.lax.ppermute(a, SPEC_AXIS, perm_up), up)
            k = accumulate_block(up, k)
        for _ in range(dn_steps):
            dn = jax.tree.map(
                lambda a: jax.lax.ppermute(a, SPEC_AXIS, perm_dn), dn)
            k = accumulate_block(dn, k)
        if balanced:
            # Each device holds the full grid for ITS lines; one
            # reduce-scatter sums across devices and lands each its slab.
            k = jax.lax.psum_scatter(k, SPEC_AXIS, scatter_dimension=1,
                                     tiled=True)
        if weight_density:
            n_density = pressure * vmr / (c.KB * temperature)
            k = k * n_density[:, None]
        return k

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(SPEC_AXIS), P(), P(BATCH_AXIS), P(BATCH_AXIS),
                  P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS, SPEC_AXIS))

    @jax.jit
    def step(blocks, q_table, temperature, pressure, vmr):
        return fn(blocks, q_table, temperature, pressure, vmr)

    return step


def make_sharded_pipeline(pack, grid, mesh, cut_off=c.DEFAULT_CUT_OFF,
                          mode="balanced", remove_pedestal=False,
                          weight_density=True, chunk=512):
    """End-to-end multi-device absorption with optional pedestal removal.

    The device part (line physics + windowed Voigt summation) runs fully
    sharded via :func:`make_lines_sharded_step`; pedestal removal — whose
    sequential-accumulator semantics (reference spectra.c:66-78) need a
    host scan — then runs layer-vectorized on the gathered field
    (models/lines/pedestal.py).

    Returns:
        fn(temperature[B], pressure[B], vmr[B]) -> numpy float64
        [B, num_points] cross sections [m2] (or absorption [m-1] when
        ``weight_density``).
    """
    from ..models.lines.gas import internal_grid
    from ..models.lines.pedestal import (apply_pedestal_batch,
                                         compute_pedestals_batch)
    from ..models.lines.physics import kernel_inputs, line_profile_params

    spec = mesh.shape[SPEC_AXIS]
    v0, vn, n_per_v, num_points = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, cut_off)
    blocks, q_table, static, info = shard_line_pack(pack, grid, spec,
                                                    cut_off, mode)
    step = make_lines_sharded_step(static, info, mesh,
                                   weight_density=False, chunk=chunk)
    blocks_dev = {k: jnp.asarray(v) for k, v in blocks.items()}
    q_dev = jnp.asarray(q_table)

    def fn(temperature, pressure, vmr):
        t64 = np.atleast_1d(np.asarray(temperature, np.float64))
        p64 = np.atleast_1d(np.asarray(pressure, np.float64))
        x64 = np.atleast_1d(np.asarray(vmr, np.float64))
        out = step(blocks_dev, q_dev, t64.astype(np.float32),
                   p64.astype(np.float32), x64.astype(np.float32))
        k = np.asarray(out, np.float64)[:, :num_points]
        if remove_pedestal and keep:
            params = line_profile_params(pack, t64, p64, x64, keep=keep)
            kin = kernel_inputs(params, v0, n_per_v, cut_off)
            kin["nu_raw"] = pack.nu[:keep]
            kin["nu_shift"] = params["nu_shift"]
            ped = compute_pedestals_batch(k, kin, num_points, n_per_v,
                                          cut_off)
            k = apply_pedestal_batch(k, ped, kin["s_idx"], kin["e_idx"],
                                     num_points)
        if weight_density:
            k *= (p64 * x64 / (c.KB * t64))[:, None]
        return k

    return fn


def make_sharded_step(arrays, static, mesh, kin=None, chunk=512):
    """Builds the jitted multi-device absorption step.

    Returns (step_fn, in_shardings_hint) where
    ``step_fn(arrays, temperature[B], pressure[B], vmr[B]) -> [B, n_pad]``
    computes number-density-weighted absorption [m-1] with the batch axis
    sharded over "batch" and the spectral axis over "spec".

    The grid is padded so the spectral axis divides evenly; callers slice
    to num_points.
    """
    spec = mesh.shape[SPEC_AXIS]
    num_points = static["num_points"]
    local_n = -(-num_points // spec)
    padded_n = local_n * spec
    window = (2 * static["cut_off"] + 1) * static["n_per_v"] + 1
    if kin is not None:
        core_w = lineshape.core_halfwidth(kin, static["n_per_v"],
                                          static["cut_off"])
    else:
        core_w = min(128, (static["cut_off"] + 1) * static["n_per_v"])

    def shard_fn(arrays, temperature, pressure, vmr):
        origin = jax.lax.axis_index(SPEC_AXIS) * local_n

        def one_layer(t, p, x):
            ka = _pad_to_chunk(
                line_kernel_arrays(arrays, static, t, p, x), chunk)
            # Tag the origin with the batch axis too so the scan carry's
            # varying-axes match its body under shard_map.
            origin_v = origin + (t * 0).astype(jnp.int32)
            k = lineshape.accumulate_segment(
                ka, origin_v, local_n, num_points, window, core_w, chunk)
            n_density = p * x / (c.KB * t)
            return n_density * k

        return jax.vmap(one_layer)(temperature, pressure, vmr)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS, SPEC_AXIS))

    @jax.jit
    def step(arrays, temperature, pressure, vmr):
        return fn(arrays, temperature, pressure, vmr)

    return step, {"padded_points": padded_n, "local_points": local_n}
