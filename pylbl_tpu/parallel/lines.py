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


class UnstackableError(ValueError):
    """The given molecules cannot share one stacked kernel launch.

    Raised by :func:`stack_device_packs` (flat grid too large for exact
    float32 integers, or mismatched TIPS base temperatures).  Callers that
    fall back to per-gas dispatch catch exactly this — a plain ValueError
    from a real bug propagates instead of silently degrading."""


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
    # Layer-independent physics, hoisted out of the per-layer kernel-array
    # assembly (line_kernel_arrays): the reference recomputes these per
    # call (spectra.c:33-45), but they depend only on line constants.
    #   sw_pre = sw * 1e-4 * Q(296) / (1 - exp(-c2 nu0 / 296))
    #   repwid_base = sqrt(ln 2) / ((nu0 / c) * sqrt(r2 / mass))
    # so per layer: sw = sw_pre * sb(T) * (1 - g(T)) / Q(T) and
    # repwid = repwid_base / sqrt(T).
    q32 = arrays["q_table"]
    t0q = int(float(pack.q_temperature[0]))  # matches _q_interp's int(q_t0)
    i296 = int(np.clip(296 - t0q, 0, q32.shape[1] - 2))
    # Clamp the interpolation fraction to [0, 1]: when a short TIPS table
    # tops out below 296 K, i296 was clipped and an unclamped fraction
    # would extrapolate linearly off the last two columns.  Clamping
    # matches the runtime _q_interp's behavior on the edge-padded stacked
    # table (extrapolating there is a no-op because lo == hi).
    frac296 = np.float32(np.clip(296.0 - (i296 + t0q), 0.0, 1.0))
    q_slots296 = q32[:, i296] + (q32[:, i296 + 1] - q32[:, i296]) * frac296
    q_ref = q_slots296[arrays["q_row"]].astype(np.float64)
    gref = np.exp(-c.C2 * pack.nu[sl] / 296.0)
    arrays["sw_pre"] = (pack.sw[sl] * 1.0e-4 * q_ref
                        / (1.0 - gref)).astype(np.float32)
    alpha_base = (pack.nu[sl] / c.VLIGHT) * np.sqrt(c.R2 / pack.mass[sl])
    arrays["repwid_base"] = (c.SQRT_LN2
                             / np.maximum(alpha_base,
                                          1e-300)).astype(np.float32)
    static = {"v0": v0, "vn": vn, "n_per_v": n_per_v,
              "num_points": num_points, "cut_off": cut_off,
              "q_t0": float(pack.q_temperature[0]),
              "num_lines": int(keep)}
    return arrays, static


def _one_minus_exp_neg(z):
    """1 - exp(-z) for z >= 0, accurate on TPU.

    The TPU's exp/expm1 approximations carry ~1e-6 absolute error near
    z = 0, which the radiation-denominator cancellation amplifies by 1/z
    (measured 3e-4 rel on sub-3 cm-1 lines via plain 1-exp, 1e-4 via
    expm1).  A degree-7 Taylor series in Horner form covers z < 0.5 to
    ~2e-7 rel; beyond that expm1's absolute error is no longer
    amplified.  f64 inputs (e.g. the x64 CPU-mesh test path) skip the
    series — there expm1 is correctly rounded and the degree-7 series
    would CAP accuracy at ~2.6e-7 near z = 0.5."""
    z = jnp.asarray(z)
    if z.dtype == jnp.float64:
        return -jnp.expm1(-z)
    poly = z * (1.0 - z * (1.0 / 2.0 - z * (1.0 / 6.0 - z * (
        1.0 / 24.0 - z * (1.0 / 120.0 - z * (1.0 / 720.0
                                             - z * (1.0 / 5040.0)))))))
    return jnp.where(z < 0.5, poly, -jnp.expm1(-z))


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

    ``volume_mixing_ratio`` may be a scalar (one gas) or a [G] vector for
    a gas-stacked pack (see :func:`stack_device_packs`): each line then
    broadens against its own gas's partial pressure, and the window/center
    indices are placed in the flat [G * num_points] output grid with the
    per-line ``flat_off`` offset, pre-clamped to the line's own gas
    segment (the reference clamps windows to the grid edges,
    spectra.c:48-62 — here each gas's segment IS its grid).
    """
    n_per_v = static["n_per_v"]
    cut_off = static["cut_off"]
    v0 = static["v0"]

    stacked = "flat_off" in arrays
    if stacked:
        volume_mixing_ratio = jnp.asarray(
            volume_mixing_ratio)[arrays["gas_idx"]]
    p_atm = pressure * c.PA_TO_ATM
    partial = p_atm * volume_mixing_ratio
    tfact = 296.0 / temperature

    shift = p_atm * arrays["delta_air"]
    gamma = (arrays["gamma_air"] * (p_atm - partial)
             + arrays["gamma_self"] * partial) * tfact ** arrays["n_air"]

    sb = jnp.exp(arrays["elower"] * c.C2 * (temperature - 296.0)
                 / (temperature * 296.0))
    # 1 - exp(-z): series-guarded for f32 (_one_minus_exp_neg) — low-nu
    # lines have z ~1e-2 and the cancellation amplifies the TPU
    # exp/expm1 approximations' absolute error ~1/z-fold.  (The separate
    # f64 host engine in models/lines/physics.py keeps the reference's
    # plain 1 - exp() form for bit parity with the C oracle.)
    one_minus_g = _one_minus_exp_neg(c.C2 * arrays["nu"] / temperature)
    q_t = _q_interp(arrays["q_table"], static["q_t0"], arrays["q_row"],
                    temperature)
    sw_pre = arrays.get("sw_pre")
    if sw_pre is None:  # externally built arrays without the hoisted terms
        one_minus_gref = _one_minus_exp_neg(c.C2 * arrays["nu"] / 296.0)
        q_ref = _q_interp(arrays["q_table"], static["q_t0"],
                          arrays["q_row"], jnp.asarray(296.0, q_t.dtype))
        sw_pre = arrays["sw"] * (q_ref / one_minus_gref) * 1.0e-4
    sw = sw_pre * sb * (one_minus_g / q_t)

    repwid_base = arrays.get("repwid_base")
    if repwid_base is None:
        alpha = (arrays["nu"] / c.VLIGHT) * jnp.sqrt(
            c.R2 * temperature / arrays["mass"])
        repwid = jnp.asarray(c.SQRT_LN2, gamma.dtype) / alpha
    else:
        # repwid_base / sqrt(T): one scalar rsqrt + one per-line multiply
        # instead of a per-line sqrt and divide.
        repwid = repwid_base * jax.lax.rsqrt(
            jnp.asarray(temperature, repwid_base.dtype))
    dc = shift * n_per_v
    center = arrays["c_base_int"] + (arrays["c_base_frac"] + dc)
    bucket = jnp.floor(center / n_per_v + v0)
    s_idx = ((bucket - cut_off - v0) * n_per_v).astype(jnp.int32)
    e_idx = ((bucket + cut_off + 1 - v0) * n_per_v).astype(jnp.int32)
    c_int = arrays["c_base_int"]
    if stacked:
        # Clamp to the gas segment FIRST (so no window spills into a
        # neighboring gas's span), then shift into the flat grid.
        n = static["num_points"]
        off = arrays["flat_off"]
        s_idx = off + jnp.clip(s_idx, 0, n - 1)
        e_idx = off + jnp.clip(e_idx, 0, n - 1)
        c_int = c_int + off.astype(c_int.dtype)
    return {
        "c_int": c_int.astype(jnp.int32),
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


def stack_device_packs(packs, grid, cut_off=c.DEFAULT_CUT_OFF):
    """Concatenates several molecules' line lists into one flat launch.

    Replaces the reference's serial per-gas dispatch
    (reference spectroscopy.py:166-205) with a single stacked kernel: the
    output grid is the per-gas internal grid tiled G times (flat index =
    gas_idx * num_points + local point) and every line carries its gas
    index, so one launch computes every gas's spectrum for every layer.

    Args:
        packs: dict name -> LinePack (insertion order fixes gas order).
        grid: shared user grid.

    Returns:
        (arrays, host, static, names): ``arrays`` as
        :func:`device_line_pack` plus per-line int32 ``gas_idx`` and
        ``flat_off`` and a row-stacked ``q_table``; ``host`` holds
        concatenated float64 per-line params for host-side window sizing;
        ``static["flat_points"]`` = G * num_points.
    """
    from ..models.lines.gas import internal_grid
    names = list(packs)
    v0, vn, n_per_v, num_points = internal_grid(grid)
    if len(names) * num_points >= 2 ** 24:
        raise UnstackableError(
            "flat stacked grid exceeds the float32 exact-integer range; "
            "split the gases into groups")
    keeps = {n: packs[n].compat_break_filter(v0, vn, cut_off)
             for n in names}
    per = [(n, *device_line_pack(packs[n], grid, keep=keeps[n],
                                 cut_off=cut_off)) for n in names]
    q_t0 = per[0][2]["q_t0"]
    if any(s["q_t0"] != q_t0 for _, _, s in per):
        raise UnstackableError("stacked gases must share the TIPS table "
                               "base temperature")
    n_temps = max(a["q_table"].shape[1] for _, a, _ in per)

    parts = {key: [] for key in _LINE_KEYS}
    gas_idx, flat_off, q_tables = [], [], []
    host = {key: [] for key in ("nu", "mass", "delta_air", "gamma_air",
                                "n_air")}
    row_off = 0
    for g, (name, a, s) in enumerate(per):
        num = a["nu"].shape[0]
        for key in _LINE_KEYS:
            parts[key].append(a[key] + row_off if key == "q_row"
                              else a[key])
        q_tab = a["q_table"]
        if q_tab.shape[1] < n_temps:
            q_tab = np.pad(q_tab, ((0, 0), (0, n_temps - q_tab.shape[1])),
                           mode="edge")
        q_tables.append(q_tab)
        row_off += q_tab.shape[0]
        gas_idx.append(np.full(num, g, np.int32))
        flat_off.append(np.full(num, g * num_points, np.int32))
        pack = packs[name]
        keep = keeps[name]
        host["nu"].append(pack.nu[:keep])
        host["mass"].append(pack.mass[:keep])
        host["delta_air"].append(pack.delta_air[:keep])
        host["gamma_air"].append(pack.gamma_air[:keep])
        host["n_air"].append(pack.n_air[:keep])

    arrays = {key: np.concatenate(parts[key]) for key in _LINE_KEYS}
    arrays["q_table"] = np.concatenate(q_tables, axis=0)
    arrays["gas_idx"] = np.concatenate(gas_idx)
    arrays["flat_off"] = np.concatenate(flat_off)
    host = {key: np.concatenate(val) for key, val in host.items()}
    static = dict(per[0][2])
    static["num_lines"] = int(arrays["nu"].shape[0])
    static["num_gases"] = len(names)
    static["flat_points"] = len(names) * num_points
    return arrays, host, static, names


def derive_envelope(temperature, pressure, t_quantum=5.0,
                    p_quantum_atm=0.25):
    """Smallest quantized (t_max, p_max_atm) kernel envelope covering the
    given conditions.

    The batched pipelines size their layer-independent rows-core instance
    windows for the envelope's hottest/highest-pressure layer
    (make_batched_tpu_fn / make_multigas_batched_fn).  Deriving the
    envelope from the atmosphere makes conditions beyond the wide default
    (350 K, 5 atm) computable (instead of tripping the runtime guard) and
    trims the instance windows slightly (~0.4% on the canonical column —
    see docs/performance.md "known headroom" for why most of the
    batched-vs-exact instance gap is structural, not envelope slack).
    Quantizing up (next 5 K / 0.25 atm) keeps near-identical atmospheres
    on shared compiled pipelines and guarantees max(T) <= t_max,
    max(p) <= p_max_atm so the runtime envelope guard can never fire.

    Args:
        temperature: temperatures [K], any shape.
        pressure: pressures [Pa], any shape.

    Returns:
        (t_max [K], p_max_atm [atm]) floats.
    """
    temperature = np.asarray(temperature, np.float64)
    pressure = np.asarray(pressure, np.float64)
    if temperature.size == 0 or pressure.size == 0:
        return 350.0, 5.0
    if not (np.isfinite(temperature).all() and np.isfinite(pressure).all()):
        # A NaN here would flow silently into NaN-sized instance windows
        # (the runtime guard's `> t_max` comparisons are False vs NaN).
        raise ValueError(
            "non-finite temperature or pressure in the atmosphere; "
            "cannot derive a kernel envelope")
    t_max = t_quantum * np.ceil(float(temperature.max()) / t_quantum)
    p_atm = float(pressure.max()) * c.PA_TO_ATM
    p_max_atm = p_quantum_atm * max(np.ceil(p_atm / p_quantum_atm), 1.0)
    return float(t_max), float(p_max_atm)


def make_multigas_batched_fn(packs, grid, cut_off=c.DEFAULT_CUT_OFF,
                             tile=None, chunk=None, t_max=350.0,
                             p_max_atm=5.0, backend="pallas",
                             interpret=False, core_mode=None,
                             wings_chunk=None, wings_tail=128):
    """Builds the all-gases single-launch batched pipeline for one grid.

    The 7-gas quickstart runs as ONE wings pass + ONE rows pass per layer
    batch instead of 7 separate launches (reference serial loop
    spectroscopy.py:166).  Host-side CSR/instance grouping works on the
    flat [G * num_points] grid unchanged: each gas's flat windows are
    globally nu-sorted within its segment and pre-clamped to it.

    Args:
        packs: dict name -> LinePack.
        backend: "pallas" (TPU wings+rows kernels) or "xla" (portable
            scatter-add, used for CPU parity tests).
        interpret: run Pallas kernels in interpret mode (tests).

    Returns:
        fn(temperature[B], pressure[B], vmr[B, G]) -> jnp float32
        [B, G, num_points] absorption cross sections [m2] on the internal
        grid, gases ordered as ``list(packs)``.  ``fn.total(t, p, vmr)``
        returns the density-weighted gas sum [B, num_points] in m-1,
        reduced on device (the output_format="total" fast path: G x less
        host transfer).
    """
    from ..ops import lineshape_pallas as lp
    from ..ops.lineshape import core_halfwidths

    tile = tile or lp.DEFAULT_TILE
    chunk = chunk or lp.DEFAULT_CHUNK
    arrays_np, host, static, names = stack_device_packs(packs, grid,
                                                        cut_off)
    num_points = static["num_points"]
    flat_points = static["flat_points"]
    n_per_v = static["n_per_v"]
    v0 = static["v0"]
    num_gases = static["num_gases"]
    keep = static["num_lines"]
    if keep == 0:
        def empty(t, p, x):
            batch = jnp.atleast_1d(t).shape[0]
            return jnp.zeros((batch, num_gases, num_points), jnp.float32)
        empty.inner = empty
        empty.total = lambda t, p, x: jnp.zeros(
            (jnp.atleast_1d(t).shape[0], num_points), jnp.float32)
        return empty

    # Flat windows for the CSR, from unshifted positions +/-1 wavenumber
    # slop, clamped per gas segment then offset (same convention as the
    # device physics above).
    off = arrays_np["flat_off"].astype(np.int64)
    b0 = np.floor(host["nu"]).astype(np.int64)
    s_loc = np.clip((b0 - 1 - cut_off - v0) * n_per_v, 0, num_points - 1)
    e_loc = np.clip((b0 + 1 + cut_off + 1 - v0) * n_per_v, 0,
                    num_points - 1)
    s_wide = off + s_loc
    e_wide = off + e_loc

    if backend == "xla":
        from ..ops import lineshape
        window = (2 * cut_off + 1) * n_per_v + 1
        core_w = min(128, (cut_off + 1) * n_per_v)
        arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}

        @jax.jit
        def fn_xla(temperature, pressure, vmr):
            def one_layer(t, p, x):
                ka = _pad_to_chunk(
                    line_kernel_arrays(arrays_dev, static, t, p, x), chunk)
                return lineshape.accumulate_segment(
                    ka, 0, flat_points, flat_points, window, core_w, chunk)

            k = jax.vmap(one_layer)(temperature, pressure, vmr)
            return k.reshape(k.shape[0], num_gases, num_points)

        @jax.jit
        def total_xla(temperature, pressure, vmr):
            k = fn_xla(temperature, pressure, vmr)
            n_density = pressure[:, None] * vmr / (
                jnp.asarray(c.KB, k.dtype) * temperature[:, None])
            return jnp.einsum("bgn,bg->bn", k, n_density)

        fn_xla.inner = fn_xla
        fn_xla.total = total_xla
        return fn_xla

    # Rows-core instance windows, sized exactly like make_batched_tpu_fn
    # but placed in the flat grid (clamped to the gas segment).
    alpha_ref = (host["nu"] / c.VLIGHT) * np.sqrt(
        c.R2 * t_max / np.maximum(host["mass"], 1.0))
    repwid_ref = c.SQRT_LN2 / np.maximum(alpha_ref, 1e-300)
    core_w = core_halfwidths(repwid_ref, n_per_v, cut_off)
    shift_w = np.ceil(np.abs(host["delta_air"]) * p_max_atm
                      * n_per_v).astype(np.int64) + 1
    center0 = np.rint((host["nu"] - v0) * n_per_v).astype(np.int64)
    y_ref = (c.SQRT_LN2 / np.maximum(
        (host["nu"] / c.VLIGHT) * np.sqrt(
            c.R2 * 275.0 / np.maximum(host["mass"], 1.0)), 1e-300)
        ) * host["gamma_air"] * (296.0 / 275.0) ** host["n_air"]
    core_lo = off + np.clip(center0 - core_w - shift_w, 0, num_points - 1)
    core_hi = off + np.clip(center0 + core_w + shift_w, 0, num_points - 1)
    # Strided overlapped-tile wings over the flat grid (see
    # make_batched_tpu_fn); assignment from the widened flat windows, line
    # constants in the chunk-aligned per-tile order (padded_strided_layout
    # — a bigger win here than single-gas: the small gases' tiles hold
    # ~300 lines each, so the straddle CSR wasted ~12% of chunk visits).
    planned = lp.plan_strided_stage(s_wide, e_wide, core_lo, core_hi,
                                    y_ref, flat_points, tile=tile,
                                    chunk=wings_chunk or lp.STRIDED_CHUNK,
                                    core_mode=core_mode, tail=wings_tail)
    if planned is not None:
        wings_stride, lay, core_plan = planned
        arrays_np = lp.permute_line_arrays(arrays_np, lay.perm)
        w_start, w_n = lay.w_start, lay.w_n
        tail_csr = (lay.t_start, lay.t_n) if lay.t_start is not None \
            else None
        nlines = lay.nlines
    else:
        wings_stride = None
        tail_csr = None
        # Splat CSR chunk: 512 measured AS FAST as 128 despite 1.68x
        # visit slop from the per-tile chunk rounding at 0.01 cm-1 (the
        # kernel's wall is visit-insensitive there — ~46M cycles/layer
        # at 3.0M and 4.3M visits alike); 1024 fails to compile (SMEM).
        splat_chunk = wings_chunk or chunk
        w_start, w_n = lp.tile_line_ranges(s_wide, e_wide, flat_points,
                                           tile, splat_chunk)
        nlines = keep
        core_plan = lp.CorePlan(core_lo, core_hi, flat_points, tile,
                                sort_key=y_ref, mode=core_mode)

    arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    if core_plan.mode in ("seg", "segmix"):
        # Instance-order line constants, expanded ON DEVICE (see
        # make_batched_tpu_fn): physics runs directly in instance space.
        core_inst_dev = core_plan.expand_line_arrays(arrays_dev, xp=jnp)
    else:
        core_plan._device_indices()   # in-jit gathers close over these
    pad = -nlines % chunk

    # Big device-resident inputs threaded through jit as ARGUMENTS, never
    # closures (see make_batched_tpu_fn: 413-sized compile payloads).
    big = {"arrays": arrays_dev}
    if core_plan.mode in ("seg", "segmix"):
        big["core_inst"] = core_inst_dev
        big["seg"] = core_plan._seg_device_consts()

    def _assemble(big, t, p, x):
        """One layer's kernel inputs: (wings SoA block, core block)."""
        ka = line_kernel_arrays(big["arrays"], static, t, p, x)
        if wings_stride is not None or core_plan.mode == "segmix":
            # Prepacked wings rows (the _lorentz_line_pre contract): Y
            # carries y^2, PREF carries pref*y/sqrt(pi).  Valid for the
            # private per-tile strided layout AND the straddle-CSR splat
            # fallback (neither needs an ownership row; splat masks by
            # window).
            rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                    ka["scaled_repwid"], ka["y"] * ka["y"],
                    ka["prefactor"] * ka["y"] * jnp.float32(c.RSQRPI),
                    ka["s_idx"].astype(jnp.float32),
                    ka["e_idx"].astype(jnp.float32),
                    jnp.zeros_like(ka["c_frac"])]
            fill = [0.0, 0.0, 1.0, 1.0e4, 0.0, -1.0, -2.0, 0.0]
        else:
            rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                    ka["scaled_repwid"], ka["y"], ka["prefactor"],
                    ka["s_idx"].astype(jnp.float32),
                    ka["e_idx"].astype(jnp.float32),
                    jnp.zeros_like(ka["c_frac"])]
            fill = [0.0, 0.0, 1.0, 100.0, 0.0, -1.0, -2.0, 0.0]
        padded = [jnp.pad(r, (0, pad), constant_values=v)
                  for r, v in zip(rows, fill)]
        soa = jnp.stack(padded, axis=0)
        if core_plan.mode in ("seg", "segmix"):
            ka_i = line_kernel_arrays(big["core_inst"], static, t, p, x)
            core = core_plan.seg_params(ka_i, xp=jnp, consts=big["seg"])
        else:
            core = core_plan.gather(
                {"c_int": ka["c_int"], "c_frac": ka["c_frac"],
                 "scaled_repwid": ka["scaled_repwid"], "y": ka["y"],
                 "prefactor": ka["prefactor"], "s_idx": ka["s_idx"],
                 "e_idx": ka["e_idx"]}, xp=jnp)
        return soa, core

    @jax.jit
    def _fn_impl(big, temperature, pressure, vmr):
        soa, core = jax.vmap(
            lambda a, b, c_: _assemble(big, a, b, c_))(
                temperature, pressure, vmr)
        batch = soa.shape[0]
        if wings_stride is not None:
            k = (lp._pallas_pass_strided(
                    soa, w_start, w_n, flat_points, tile, wings_stride,
                    chunk=wings_chunk or lp.STRIDED_CHUNK,
                    interpret=interpret, prepacked=True,
                    t_start=tail_csr[0] if tail_csr else None,
                    t_n=tail_csr[1] if tail_csr else None,
                    tail=wings_tail or 128)
                 + core_plan.core_pass(core, interpret))
        else:
            k = core_plan.wings_core(
                soa,
                np.broadcast_to(w_start, (batch,) + w_start.shape),
                np.broadcast_to(w_n, (batch,) + w_n.shape),
                core, splat_chunk, interpret=interpret,
                prepacked=core_plan.mode == "segmix")
        return k.reshape(batch, num_gases, num_points)

    def fn_jit(temperature, pressure, vmr):
        return _fn_impl(big, temperature, pressure, vmr)

    def assemble_layer(t, p, x):
        return _assemble(big, t, p, x)

    def _check_envelope(temperature, pressure):
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

    @jax.jit
    def _total_impl(big, temperature, pressure, vmr):
        k = _fn_impl(big, temperature, pressure, vmr)    # [B, G, n]
        n_density = pressure[:, None] * vmr / (
            jnp.float32(c.KB) * temperature[:, None])
        return jnp.einsum("bgn,bg->bn", k, n_density)

    def total_jit(temperature, pressure, vmr):
        return _total_impl(big, temperature, pressure, vmr)

    def fn(temperature, pressure, vmr):
        _check_envelope(temperature, pressure)
        return fn_jit(temperature, pressure, vmr)

    def total(temperature, pressure, vmr):
        _check_envelope(temperature, pressure)
        return total_jit(temperature, pressure, vmr)

    fn.inner = fn_jit  # jit-composable (benchmark loop chaining).
    fn.total = total
    fn.assemble_layer = assemble_layer
    fn.core_plan = core_plan
    fn.wings_stride = wings_stride
    fn.tile = tile
    fn.wings_chunk = (wings_chunk or lp.STRIDED_CHUNK) \
        if wings_stride is not None else splat_chunk
    fn.wings_prepacked = wings_stride is not None
    fn.wings_csr = (w_start, w_n)
    fn.wings_tail_csr = tail_csr
    fn.wings_tail = wings_tail
    return fn


def make_batched_tpu_fn(pack, grid, cut_off=c.DEFAULT_CUT_OFF,
                        tile=None, chunk=None, t_max=350.0, p_max_atm=5.0,
                        interpret=False, core_mode=None, wings_tail=None):
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
    core_lo = np.maximum(center0 - core_w - shift_w, s_wide)
    core_hi = np.minimum(center0 + core_w + shift_w, e_wide)
    # Strided overlapped-tile wings when the widened windows fit: each
    # line is evaluated on exactly one tile instead of every tile its
    # window touches (~3x masked-work waste at 0.1 cm-1 resolution).  The
    # assignment comes from the layer-independent wide windows; the SoA's
    # _PAD row carries it for the in-kernel ownership check.  The line
    # constants are laid out in the chunk-aligned per-tile order
    # (padded_strided_layout): each tile reads only its OWN chunks —
    # ~10% fewer chunk visits than the straddle-sharing CSR on the
    # headline pack, ~12% on the 7-gas stacked pack.
    planned = lp.plan_strided_stage(s_wide, e_wide, core_lo, core_hi,
                                    y_ref, num_points, tile=tile,
                                    core_mode=core_mode, tail=wings_tail)
    if planned is not None:
        wings_stride, lay, core_plan = planned
        # Dead slots: empty core windows (build_core_segments drops them).
        arrays_np = lp.permute_line_arrays(arrays_np, lay.perm)
        w_start, w_n = lay.w_start, lay.w_n
        tail_csr = (lay.t_start, lay.t_n) if lay.t_start is not None \
            else None
        nlines = lay.nlines
    else:
        wings_stride = None
        tail_csr = None
        splat_chunk = chunk   # see make_multigas_batched_fn
        w_start, w_n = lp.tile_line_ranges(s_wide, e_wide, num_points,
                                           tile, splat_chunk)
        nlines = keep
        core_plan = lp.CorePlan(core_lo, core_hi, num_points, tile,
                                sort_key=y_ref, mode=core_mode)

    arrays_dev = {k: jnp.asarray(v) for k, v in arrays_np.items()}
    if core_plan.mode in ("seg", "segmix"):
        # Instance-order line constants, expanded ON DEVICE (only the
        # int32 index array crosses the tunnel): core params are computed
        # directly in instance space — no per-layer gather + transpose in
        # the jitted program (assembly 4.26 -> 0.14 ms/layer measured).
        core_inst_dev = core_plan.expand_line_arrays(arrays_dev, xp=jnp)
    else:
        core_plan._device_indices()   # in-jit gathers close over these
    pad = -nlines % chunk

    # Big device-resident inputs are threaded through jit as ARGUMENTS,
    # never closures: closed-over arrays become jaxpr constants and ride
    # the remote-compile payload, which the tunnel rejects at config-5
    # scale (HTTP 413 at ~730 MB of instance-expanded constants).
    big = {"arrays": arrays_dev}
    if core_plan.mode in ("seg", "segmix"):
        big["core_inst"] = core_inst_dev
        big["seg"] = core_plan._seg_device_consts()

    def _assemble(big, t, p, x):
        """One layer's kernel inputs: (wings SoA block, core block)."""
        ka = line_kernel_arrays(big["arrays"], static, t, p, x)
        if wings_stride is not None or core_plan.mode == "segmix":
            # Prepacked wings rows (the _lorentz_line_pre contract): Y
            # carries y^2, PREF carries pref*y/sqrt(pi).  Valid for the
            # private per-tile strided layout AND the straddle-CSR splat
            # fallback (neither needs an ownership row; splat masks by
            # window).
            rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                    ka["scaled_repwid"], ka["y"] * ka["y"],
                    ka["prefactor"] * ka["y"] * jnp.float32(c.RSQRPI),
                    ka["s_idx"].astype(jnp.float32),
                    ka["e_idx"].astype(jnp.float32),
                    jnp.zeros_like(ka["c_frac"])]
            fill = [0.0, 0.0, 1.0, 1.0e4, 0.0, -1.0, -2.0, 0.0]
        else:
            rows = [ka["c_int"].astype(jnp.float32), ka["c_frac"],
                    ka["scaled_repwid"], ka["y"], ka["prefactor"],
                    ka["s_idx"].astype(jnp.float32),
                    ka["e_idx"].astype(jnp.float32),
                    jnp.zeros_like(ka["c_frac"])]
            fill = [0.0, 0.0, 1.0, 100.0, 0.0, -1.0, -2.0, 0.0]
        padded = [jnp.pad(r, (0, pad), constant_values=v)
                  for r, v in zip(rows, fill)]
        soa = jnp.stack(padded, axis=0)       # [8, N_pad].
        if core_plan.mode in ("seg", "segmix"):
            ka_i = line_kernel_arrays(big["core_inst"], static, t, p, x)
            core = core_plan.seg_params(ka_i, xp=jnp, consts=big["seg"])
        else:
            core = core_plan.gather(
                {"c_int": ka["c_int"], "c_frac": ka["c_frac"],
                 "scaled_repwid": ka["scaled_repwid"], "y": ka["y"],
                 "prefactor": ka["prefactor"], "s_idx": ka["s_idx"],
                 "e_idx": ka["e_idx"]}, xp=jnp)
        return soa, core

    @jax.jit
    def _fn_impl(big, temperature, pressure, vmr):
        soa, core = jax.vmap(
            lambda a, b, c_: _assemble(big, a, b, c_))(
                temperature, pressure, vmr)
        batch = soa.shape[0]
        if wings_stride is not None:
            wings = lp._pallas_pass_strided(
                soa, w_start, w_n, num_points, tile, wings_stride,
                interpret=interpret, prepacked=True,
                t_start=tail_csr[0] if tail_csr else None,
                t_n=tail_csr[1] if tail_csr else None,
                tail=wings_tail or 128)
            return wings + core_plan.core_pass(core, interpret)
        return core_plan.wings_core(
            soa, np.broadcast_to(w_start, (batch,) + w_start.shape),
            np.broadcast_to(w_n, (batch,) + w_n.shape),
            core, splat_chunk, interpret=interpret,
            prepacked=core_plan.mode == "segmix")

    def fn_jit(temperature, pressure, vmr):
        return _fn_impl(big, temperature, pressure, vmr)

    def assemble_layer(t, p, x):
        return _assemble(big, t, p, x)

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

    fn.inner = fn_jit  # jit-composable (benchmark loop chaining).
    # Stage handles for tools/batched_microbench.py (production-path
    # timing without duplicating builder logic).
    fn.assemble_layer = assemble_layer
    fn.core_plan = core_plan
    fn.wings_stride = wings_stride
    fn.tile = tile
    fn.wings_chunk = lp.STRIDED_CHUNK \
        if wings_stride is not None else splat_chunk
    fn.wings_prepacked = wings_stride is not None
    fn.wings_csr = (w_start, w_n)
    fn.wings_tail_csr = tail_csr
    fn.wings_tail = wings_tail
    return fn


# Per-line block keys exchanged by the ring pass / sharded by nu-bucket.
_LINE_KEYS = ("c_base_int", "c_base_frac", "nu", "sw", "gamma_air",
              "gamma_self", "n_air", "delta_air", "elower", "mass", "q_row",
              "sw_pre", "repwid_base")
# Benign pad values: sw/sw_pre=0 make the physics prefactor exactly 0, so
# padded entries scatter zeros; mass/nu/repwid_base > 0 keep the broadening
# math finite.
_LINE_PAD = {"c_base_int": 0.0, "c_base_frac": 0.0, "nu": 1.0, "sw": 0.0,
             "gamma_air": 1e-3, "gamma_self": 1e-3, "n_air": 0.0,
             "delta_air": 0.0, "elower": 0.0, "mass": 1.0, "q_row": 0,
             "sw_pre": 0.0, "repwid_base": 1.0}


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

    los, his, ring_steps = _partition_lines(s_wide, e_wide, center, keep,
                                            spec, local_n, mode)
    blocks = _slice_blocks(arrays, los, his, spec)
    info = {"ring_steps": ring_steps,
            "block_len": int((his - los).max(initial=0)),
            "local_points": local_n, "padded_points": local_n * spec,
            "duplication": float((his - los).sum() / max(keep, 1)),
            "mode": mode}
    return blocks, arrays["q_table"], static, info


def _partition_lines(s_wide, e_wide, center, keep, spec, local_n, mode):
    """Shared shard-assignment logic (window coordinates may be per-gas or
    flat/stacked — both are monotone in processing order)."""
    if keep == 0:
        return np.zeros(spec, np.int64), np.zeros(spec, np.int64), 0
    if mode == "halo":
        slab_lo = np.arange(spec, dtype=np.int64) * local_n
        # s_wide/e_wide are monotone in the (sorted) line positions, so
        # each shard's overlap set is one contiguous slice.
        los = np.searchsorted(e_wide, slab_lo, side="left")
        his = np.searchsorted(s_wide, slab_lo + local_n, side="left")
        return los, his, 0
    if mode == "ring":
        owner = np.clip(center // local_n, 0, spec - 1)
        shards = np.arange(spec, dtype=np.int64)
        los = np.searchsorted(owner, shards, side="left")
        his = np.searchsorted(owner, shards, side="right")
        reach_l = owner - np.clip(s_wide // local_n, 0, spec - 1)
        reach_r = np.clip(e_wide // local_n, 0, spec - 1) - owner
        ring_steps = int(min(max(reach_l.max(initial=0),
                                 reach_r.max(initial=0)), spec - 1))
        return los, his, ring_steps
    if mode == "balanced":
        bounds = np.linspace(0, keep, spec + 1).round().astype(np.int64)
        return bounds[:-1], bounds[1:], 0
    raise ValueError(f"unknown line-sharding mode '{mode}'")


def _slice_blocks(arrays, los, his, spec):
    lengths = his - los
    block_len = int(lengths.max(initial=0))
    blocks = {}
    for key in _LINE_KEYS + (("gas_idx", "flat_off")
                             if "flat_off" in arrays else ()):
        src = arrays[key]
        out = np.full((spec, block_len), _LINE_PAD.get(key, 0),
                      dtype=src.dtype)
        for s in range(spec):
            out[s, :lengths[s]] = src[los[s]:his[s]]
        blocks[key] = out
    return blocks


def shard_stacked_packs(packs, grid, spec, cut_off=c.DEFAULT_CUT_OFF,
                        mode="balanced"):
    """Gas-stacked AND line-sharded blocks — the full config-5 layout.

    Combines :func:`stack_device_packs` (every molecule in one launch,
    flat [G * num_points] grid) with :func:`shard_line_pack`'s
    decompositions over the flat grid: one launch computes all gases for
    all layers with lines sharded over "spec" and layers over "batch".

    Returns:
        (blocks, q_table, static, info, names) — blocks additionally
        carry per-line gas_idx/flat_off; info["flat_points"] is the flat
        output size the sharded step decomposes.
    """
    arrays, host, static, names = stack_device_packs(packs, grid, cut_off)
    flat_points = static["flat_points"]
    num_points = static["num_points"]
    n_per_v = static["n_per_v"]
    v0 = static["v0"]
    keep = static["num_lines"]
    local_n = -(-flat_points // spec)

    off = arrays["flat_off"].astype(np.int64)
    b0 = np.floor(host["nu"]).astype(np.int64)
    s_wide = off + np.clip((b0 - 1 - cut_off - v0) * n_per_v, 0,
                           num_points - 1)
    e_wide = off + np.clip((b0 + 1 + cut_off + 1 - v0) * n_per_v, 0,
                           num_points - 1)
    center = off + np.clip(
        np.rint((host["nu"] - v0) * n_per_v).astype(np.int64), 0,
        num_points - 1)

    los, his, ring_steps = _partition_lines(s_wide, e_wide, center, keep,
                                            spec, local_n, mode)
    blocks = _slice_blocks(arrays, los, his, spec)
    info = {"ring_steps": ring_steps,
            "block_len": int((his - los).max(initial=0)),
            "local_points": local_n, "padded_points": local_n * spec,
            "duplication": float((his - los).sum() / max(keep, 1)),
            "mode": mode, "flat_points": flat_points}
    return blocks, arrays["q_table"], static, info, names


def _shard_window_arrays(blk, static):
    """Host wings-window/center arrays for one shard's block.

    Derived from the exact split-center representation (c_base_int/_frac)
    so the widened windows bound the same per-layer windows the DEVICE
    physics computes (line_kernel_arrays) — blocks carry float32 nu whose
    floor can disagree with the float64 host nu near integers.
    """
    npv = static["n_per_v"]
    n = static["num_points"]
    cut = static["cut_off"]
    center = blk["c_base_int"].astype(np.int64)
    b0_rel = np.floor((blk["c_base_int"].astype(np.float64)
                       + blk["c_base_frac"]) / npv).astype(np.int64)
    s_wide = (b0_rel - 1 - cut) * npv
    e_wide = (b0_rel + 1 + cut + 1) * npv
    if "flat_off" in blk:
        off = blk["flat_off"].astype(np.int64)
        s_wide = off + np.clip(s_wide, 0, n - 1)
        e_wide = off + np.clip(e_wide, 0, n - 1)
        center = off + np.clip(center, 0, n - 1)
    return s_wide, e_wide, center


def _shard_core_windows(blk, static, s_wide, e_wide, center, t_max,
                        p_max_atm):
    """Layer-independent core-instance windows + y sort key for one
    shard's block (same envelope sizing as make_batched_tpu_fn, but from
    the block's packed constants: repwid(T) = repwid_base / sqrt(T))."""
    from ..ops.lineshape import core_halfwidths

    npv = static["n_per_v"]
    repwid_base = blk["repwid_base"].astype(np.float64)
    core_w = core_halfwidths(repwid_base / np.sqrt(t_max), npv,
                             static["cut_off"])
    shift_w = np.ceil(np.abs(blk["delta_air"].astype(np.float64))
                      * p_max_atm * npv).astype(np.int64) + 1
    y_ref = (repwid_base / np.sqrt(275.0)) * blk["gamma_air"] \
        * (296.0 / 275.0) ** blk["n_air"]
    if "flat_off" in blk:
        n = static["num_points"]
        off = blk["flat_off"].astype(np.int64)
        local_c = center - off
        core_lo = off + np.clip(local_c - core_w - shift_w, 0, n - 1)
        core_hi = off + np.clip(local_c + core_w + shift_w, 0, n - 1)
    else:
        core_lo = np.maximum(center - core_w - shift_w, s_wide)
        core_hi = np.minimum(center + core_w + shift_w, e_wide)
    return core_lo, core_hi, y_ref


def _pad_1d(v, size, fill=None):
    pad = size - v.shape[0]
    if pad <= 0:
        return v
    tail = np.full(pad, v[0] if fill is None else fill, dtype=v.dtype)
    return np.concatenate([v, tail])


def _pad_line_dict(consts, size):
    """Pad per-line constants to ``size``, repeating element 0 for the
    physics fields (keeps values in-range) but ZEROING the strength
    fields so padded slots are inert by construction — the w_start/w_n
    chunk windows never read them today, but a future consumer must not
    pick up phantom absorption."""
    return {k: _pad_1d(v, size, 0.0 if k in ("sw", "sw_pre") else None)
            for k, v in consts.items()}


def _build_shard_plans(blocks, static, info, tile, t_max, p_max_atm):
    """Per-shard Pallas execution plans for the sharded step.

    For every shard this mirrors the single-chip batched builder: a
    strided overlapped-tile wings layout over the shard's OUTPUT grid
    (full padded grid in balanced mode; the local slab, in local
    coordinates, in halo mode) plus a mixed-slot segment core plan, with
    line constants instance-expanded so the per-layer physics runs in
    instance order.  Per-shard arrays are padded to common shapes and
    stacked on a leading [spec] axis (sharded over SPEC_AXIS).

    Returns (plan dict, meta) or None when the strided layout does not
    apply (window too wide for any stride — caller falls back to XLA).
    """
    from ..ops import lineshape_pallas as lp

    spec = next(iter(blocks.values())).shape[0]
    balanced = info.get("mode") == "balanced"
    local_n = info["local_points"]
    n_out = info["padded_points"] if balanced else local_n

    shard_data = []
    window_max = 1
    for s in range(spec):
        blk = {k: v[s] for k, v in blocks.items()}
        s_wide, e_wide, center = _shard_window_arrays(blk, static)
        core_lo, core_hi, y_ref = _shard_core_windows(
            blk, static, s_wide, e_wide, center, t_max, p_max_atm)
        origin = 0 if balanced else s * local_n
        shard_data.append((blk, s_wide - origin, e_wide - origin,
                           core_lo - origin, core_hi - origin, y_ref))
        window_max = max(window_max,
                         int((e_wide - s_wide).max(initial=0)) + 1)
    stride = lp.pick_wings_stride(tile, window_max)
    if stride is None:
        return None
    # Two-class tail layout for the gas-stacked decomposition: its
    # per-gas tiles are sparse (see padded_strided_layout_tail).
    tail = 128 if "flat_points" in info else None

    per = []
    for blk, s_loc, e_loc, c_lo, c_hi, y_ref in shard_data:
        _, lay, cp = lp.plan_strided_stage(s_loc, e_loc, c_lo, c_hi,
                                           y_ref, n_out, tile=tile,
                                           core_mode="segmix",
                                           stride=stride, tail=tail)
        consts = lp.permute_line_arrays(blk, lay.perm)
        inst = cp.expand_line_arrays(consts, xp=np)
        per.append((lay, consts, cp, inst))

    m_max = max(lay.nlines for lay, _, _, _ in per)
    i_max = max(cp.inst_line.size for _, _, cp, _ in per)
    padded_lines = [_pad_line_dict(consts, m_max) for _, consts, _, _ in per]
    padded_inst = [_pad_line_dict(inst, i_max) for _, _, _, inst in per]
    plan = {
        "lines": {k: np.stack([p[k] for p in padded_lines])
                  for k in per[0][1]},
        "assign": np.stack([
            _pad_1d(lay.assign.astype(np.float32), m_max, -1.0)
            for lay, _, _, _ in per]),
        "w_start": np.stack([lay.w_start for lay, _, _, _ in per]),
        "w_n": np.stack([lay.w_n for lay, _, _, _ in per]),
        "inst": {k: np.stack([p[k] for p in padded_inst])
                 for k in per[0][3]},
        "seg0f": np.stack([
            _pad_1d(cp.seg0.astype(np.float32), i_max, 0.0)
            for _, _, cp, _ in per]),
        "dead": np.stack([
            _pad_1d(cp.inst_line < 0, i_max, True)
            for _, _, cp, _ in per]),
        "slotf": np.stack([_pad_1d(cp._slotf, i_max, 0.0)
                           for _, _, cp, _ in per]),
        "t_start": np.stack([cp.t_start for _, _, cp, _ in per]),
        "t_chunks": np.stack([cp.t_chunks for _, _, cp, _ in per]),
    }
    if tail is not None:
        # Wings tail-chunk CSR ("t_start"/"t_chunks" above are the CORE
        # plan's tile arrays; distinct keys).
        plan["tw_start"] = np.stack([lay.t_start for lay, _, _, _ in per])
        plan["tw_n"] = np.stack([lay.t_n for lay, _, _, _ in per])
    return plan, {"stride": stride, "n_out": n_out, "balanced": balanced,
                  "tail": tail}


def _build_ring_plans(blocks, static, info, tile, t_max, p_max_atm):
    """Per-(step, shard) Pallas plans for the RING decomposition.

    Ring keeps per-device line memory at ~1/spec: only each shard's own
    block of line CONSTANTS circulates over the spec axis, while every
    shard holds small resident index plans describing how each arriving
    block maps onto its own slab.  For the pair (visiting block b ->
    slab d) the plan stores the strided-wings layout and mixed-slot core
    plan built over just the block lines whose windows reach the slab,
    with ``wsel``/``isel`` gather indices into the ARRIVING block (the
    full permuted constants of the halo/balanced plans would defeat the
    ring's memory point — indices are 4 bytes/line vs ~50 for the 13
    constant fields).

    The step schedule mirrors the XLA ring path: "up" step r delivers
    block (d - r) mod spec, "down" step r block (d + r) mod spec.

    Returns (step_plans list of per-step plan dicts stacked over [spec],
    meta) or None when no stride fits.
    """
    from ..ops import lineshape_pallas as lp

    spec = next(iter(blocks.values())).shape[0]
    local_n = info["local_points"]
    n_out = local_n
    ring_steps = info["ring_steps"]
    up_steps = ring_steps
    dn_steps = min(ring_steps, spec - 1 - ring_steps)
    schedule = ([("self", 0)]
                + [("up", r) for r in range(1, up_steps + 1)]
                + [("dn", r) for r in range(1, dn_steps + 1)])

    per_block = []
    window_max = 1
    for b in range(spec):
        blk = {k: v[b] for k, v in blocks.items()}
        s_wide, e_wide, center = _shard_window_arrays(blk, static)
        core_lo, core_hi, y_ref = _shard_core_windows(
            blk, static, s_wide, e_wide, center, t_max, p_max_atm)
        per_block.append((s_wide, e_wide, core_lo, core_hi, y_ref))
        window_max = max(window_max,
                         int((e_wide - s_wide).max(initial=0)) + 1)
    stride = lp.pick_wings_stride(tile, window_max)
    if stride is None:
        return None
    tail = 128 if "flat_points" in info else None

    step_plans = []
    for kind, r in schedule:
        per = []
        for d in range(spec):
            b = (d - r) % spec if kind in ("self", "up") else (d + r) % spec
            s_wide, e_wide, core_lo, core_hi, y_ref = per_block[b]
            lo = d * local_n
            sel = np.nonzero((e_wide >= lo)
                             & (s_wide < lo + local_n))[0]
            if sel.size == 0:
                # All-dead plan: one dead chunk, zero core instances.
                m = lp.STRIDED_CHUNK
                num_tiles = (n_out - 1) // stride + 1
                entry = {
                    "wsel": np.zeros(m, np.int32),
                    "wdead": np.ones(m, bool),
                    "assign": np.full(m, -1.0, np.float32),
                    "w_start": np.zeros(num_tiles, np.int32),
                    "w_n": np.zeros(num_tiles, np.int32),
                    "isel": np.zeros(0, np.int32),
                    "idead": np.ones(0, bool),
                    "seg0f": np.zeros(0, np.float32),
                    "slotf": np.zeros(0, np.float32),
                    "t_start": np.zeros(-(-n_out // tile), np.int32),
                    "t_chunks": np.zeros(-(-n_out // tile), np.int32),
                }
                if tail is not None:
                    entry["tw_start"] = np.zeros(num_tiles, np.int32)
                    entry["tw_n"] = np.zeros(num_tiles, np.int32)
                per.append(entry)
                continue
            _, lay, cp = lp.plan_strided_stage(
                s_wide[sel] - lo, e_wide[sel] - lo,
                core_lo[sel] - lo, core_hi[sel] - lo, y_ref[sel],
                n_out, tile=tile, core_mode="segmix", stride=stride,
                tail=tail)
            wsel = sel[lay.idx].astype(np.int32)
            inst_idx = np.maximum(cp.inst_line, 0)
            entry = {
                "wsel": wsel,
                "wdead": lay.dead,
                "assign": lay.assign.astype(np.float32),
                "w_start": lay.w_start,
                "w_n": lay.w_n,
                "isel": wsel[inst_idx],
                "idead": (cp.inst_line < 0) | lay.dead[inst_idx],
                "seg0f": cp.seg0.astype(np.float32),
                "slotf": cp._slotf,
                "t_start": cp.t_start,
                "t_chunks": cp.t_chunks,
            }
            if tail is not None:
                entry["tw_start"] = lay.t_start
                entry["tw_n"] = lay.t_n
            per.append(entry)
        m_max = max(p["wsel"].size for p in per)
        # 128: lane-aligned even when every pair in a step is empty.
        i_max = max(max(p["isel"].size for p in per), 128)
        fills = {"wsel": 0, "wdead": True, "assign": -1.0, "isel": 0,
                 "idead": True, "seg0f": 0.0, "slotf": 0.0}
        sizes = {"wsel": m_max, "wdead": m_max, "assign": m_max,
                 "isel": i_max, "idead": i_max, "seg0f": i_max,
                 "slotf": i_max}
        step_plans.append({
            k: np.stack([_pad_1d(p[k], sizes[k], fills[k])
                         if k in sizes else p[k] for p in per])
            for k in per[0]})
    return step_plans, {"stride": stride, "n_out": n_out,
                        "schedule": schedule, "tail": tail}


def _make_pallas_ring_step(blocks, static, info, mesh, weight_density,
                           tile, t_max, p_max_atm, interpret):
    """The Pallas variant of the RING sharded step.

    Each shard's raw line-constant block circulates with ``ppermute``
    exactly as in the XLA ring path; at every stop the resident per-step
    plan gathers the arriving constants into strided-wings layout order
    and core instance order (one device gather per step, outside the
    layer vmap), the per-layer physics runs on the gathered constants,
    and the production strided-wings + mixed-slot-core kernels
    accumulate into the local slab.  ``step.call_blocks`` carries
    {"plans": per-step plan dicts, "blocks": the raw blocks}.
    """
    from ..ops import lineshape_pallas as lp

    built = _build_ring_plans(blocks, static, info, tile, t_max,
                              p_max_atm)
    if built is None:
        return None
    step_plans, meta = built
    stride = meta["stride"]
    n_out = meta["n_out"]
    schedule = meta["schedule"]
    tail = meta["tail"]
    local_n = info["local_points"]
    stacked = "flat_points" in info
    spec = mesh.shape[SPEC_AXIS]
    perm_up = [(i, (i + 1) % spec) for i in range(spec)]
    perm_dn = [(i, (i - 1) % spec) for i in range(spec)]
    fills = (0.0, 0.0, 1.0, 100.0, 0.0, 1.0, -1.0, 0.0)

    def shard_fn(call, q_table, temperature, pressure, vmr):
        plans = [jax.tree.map(lambda a: a[0], p) for p in call["plans"]]
        blk = {k: v[0] for k, v in call["blocks"].items()}
        origin = jax.lax.axis_index(SPEC_AXIS) * local_n
        batch = temperature.shape[0]
        k = jnp.zeros((batch, n_out), jnp.float32) \
            + (origin * 0).astype(jnp.float32)
        cur_up = cur_dn = blk

        for (kind, r), local in zip(schedule, plans):
            if kind == "up" and r >= 1:
                cur_up = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, SPEC_AXIS, perm_up),
                    cur_up)
            elif kind == "dn":
                cur_dn = jax.tree.map(
                    lambda a: jax.lax.ppermute(a, SPEC_AXIS, perm_dn),
                    cur_dn)
            cur = cur_dn if kind == "dn" else cur_up
            # Layer-independent gathers: arriving block -> layout order
            # (wings) and instance order (core); dead slots zero their
            # strength so they contribute exactly 0.
            wl = {key: jnp.take(v, local["wsel"], axis=0)
                  for key, v in cur.items()}
            il = {key: jnp.take(v, local["isel"], axis=0)
                  for key, v in cur.items()}
            for key in ("sw", "sw_pre"):
                wl[key] = jnp.where(local["wdead"], 0.0, wl[key])
                il[key] = jnp.where(local["idead"], 0.0, il[key])
            wl["q_table"] = q_table
            il["q_table"] = q_table
            seg0f, idead, slotf = (local["seg0f"], local["idead"],
                                   local["slotf"])

            def assemble(t, p, x, wl=wl, il=il, local=local,
                         seg0f=seg0f, idead=idead, slotf=slotf):
                ka = line_kernel_arrays(wl, static, t, p, x)
                rows = [(ka["c_int"] - origin).astype(jnp.float32),
                        ka["c_frac"], ka["scaled_repwid"],
                        ka["y"] * ka["y"],
                        ka["prefactor"] * ka["y"] * jnp.float32(c.RSQRPI),
                        (ka["s_idx"] - origin).astype(jnp.float32),
                        (ka["e_idx"] - origin).astype(jnp.float32),
                        local["assign"]]
                soa = jnp.stack(rows, axis=0)
                ka_i = line_kernel_arrays(il, static, t, p, x)
                rows_i = (seg0f
                          - (ka_i["c_int"] - origin).astype(jnp.float32),
                          ka_i["c_frac"], ka_i["scaled_repwid"],
                          ka_i["y"], ka_i["prefactor"],
                          (ka_i["s_idx"] - origin).astype(jnp.float32)
                          - seg0f,
                          (ka_i["e_idx"] - origin).astype(jnp.float32)
                          - seg0f,
                          slotf)
                core = jnp.stack([jnp.where(idead, jnp.float32(f), row)
                                  for f, row in zip(fills, rows_i)],
                                 axis=-2)
                return soa, core

            soa, core = jax.vmap(assemble)(temperature, pressure, vmr)
            k = k + lp._pallas_pass_strided(
                soa, local["w_start"], local["w_n"], n_out, tile, stride,
                interpret=interpret, prepacked=True,
                t_start=local.get("tw_start"), t_n=local.get("tw_n"),
                tail=tail or 128)
            k = k + lp._pallas_seg_pass_mixed(
                core, local["t_start"], local["t_chunks"], n_out, tile,
                interpret=interpret)

        if weight_density:
            if stacked:
                n_density = pressure[:, None] * vmr \
                    / (c.KB * temperature[:, None])
                pts = origin + jnp.arange(local_n)
                gas_pt = jnp.minimum(pts // static["num_points"],
                                     vmr.shape[1] - 1)
                k = k * n_density[:, gas_pt]
            else:
                n_density = pressure * vmr / (c.KB * temperature)
                k = k * n_density[:, None]
        return k

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(SPEC_AXIS), P(), P(BATCH_AXIS), P(BATCH_AXIS),
                  P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS, SPEC_AXIS),
        check_vma=False)

    @jax.jit
    def step(call, q_table, temperature, pressure, vmr):
        return fn(call, q_table, temperature, pressure, vmr)

    step.call_blocks = {"plans": step_plans, "blocks": blocks}
    step.backend = "pallas"
    return step


def _make_pallas_sharded_step(blocks, static, info, mesh, weight_density,
                              tile, t_max, p_max_atm, interpret):
    """The Pallas variant of :func:`make_lines_sharded_step`: every shard
    runs the production strided-wings + mixed-slot-core kernels on its own
    block (SURVEY 2.8 — the single-chip kernel work composes with the
    sharding instead of falling back to the portable XLA path).

    Returns a step with the same call signature, taking the plan pytree
    (exposed as ``step.call_blocks``) in place of the raw blocks.
    """
    from ..ops import lineshape_pallas as lp

    built = _build_shard_plans(blocks, static, info, tile, t_max,
                               p_max_atm)
    if built is None:
        return None
    plan, meta = built
    stride = meta["stride"]
    n_out = meta["n_out"]
    balanced = meta["balanced"]
    tail = meta["tail"]
    local_n = info["local_points"]
    stacked = "flat_points" in info
    fills = (0.0, 0.0, 1.0, 100.0, 0.0, 1.0, -1.0, 0.0)

    def shard_fn(plan, q_table, temperature, pressure, vmr):
        local = jax.tree.map(lambda a: a[0], plan)
        # Kernel coordinate origin: 0 in balanced mode (every shard
        # accumulates from grid origin; psum_scatter lands the slabs).
        # Density weighting happens AFTER the scatter, when each shard
        # holds its OWN slab — it always uses the slab origin.
        origin = 0 if balanced \
            else jax.lax.axis_index(SPEC_AXIS) * local_n
        weight_origin = jax.lax.axis_index(SPEC_AXIS) * local_n
        lines = dict(local["lines"])
        lines["q_table"] = q_table
        inst = dict(local["inst"])
        inst["q_table"] = q_table
        seg0f, dead, slotf = (local["seg0f"], local["dead"],
                              local["slotf"])

        def assemble(t, p, x):
            ka = line_kernel_arrays(lines, static, t, p, x)
            # Prepacked wings rows; see make_batched_tpu_fn._assemble.
            rows = [(ka["c_int"] - origin).astype(jnp.float32),
                    ka["c_frac"], ka["scaled_repwid"],
                    ka["y"] * ka["y"],
                    ka["prefactor"] * ka["y"] * jnp.float32(c.RSQRPI),
                    (ka["s_idx"] - origin).astype(jnp.float32),
                    (ka["e_idx"] - origin).astype(jnp.float32),
                    local["assign"]]
            soa = jnp.stack(rows, axis=0)
            ka_i = line_kernel_arrays(inst, static, t, p, x)
            rows_i = (seg0f - (ka_i["c_int"] - origin).astype(jnp.float32),
                      ka_i["c_frac"], ka_i["scaled_repwid"], ka_i["y"],
                      ka_i["prefactor"],
                      (ka_i["s_idx"] - origin).astype(jnp.float32) - seg0f,
                      (ka_i["e_idx"] - origin).astype(jnp.float32) - seg0f,
                      slotf)
            core = jnp.stack([jnp.where(dead, jnp.float32(f), r)
                              for f, r in zip(fills, rows_i)], axis=-2)
            return soa, core

        soa, core = jax.vmap(assemble)(temperature, pressure, vmr)
        k = lp._pallas_pass_strided(
            soa, local["w_start"], local["w_n"], n_out, tile, stride,
            interpret=interpret, prepacked=True,
            t_start=local.get("tw_start"), t_n=local.get("tw_n"),
            tail=tail or 128)
        k = k + lp._pallas_seg_pass_mixed(
            core, local["t_start"], local["t_chunks"], n_out, tile,
            interpret=interpret)
        if balanced:
            k = jax.lax.psum_scatter(k, SPEC_AXIS, scatter_dimension=1,
                                     tiled=True)
        if weight_density:
            if stacked:
                n_density = pressure[:, None] * vmr \
                    / (c.KB * temperature[:, None])
                pts = weight_origin + jnp.arange(local_n)
                gas_pt = jnp.minimum(pts // static["num_points"],
                                     vmr.shape[1] - 1)
                k = k * n_density[:, gas_pt]
            else:
                n_density = pressure * vmr / (c.KB * temperature)
                k = k * n_density[:, None]
        return k

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axis
    # annotation, which the default vma checker rejects inside shard_map.
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(SPEC_AXIS), P(), P(BATCH_AXIS), P(BATCH_AXIS),
                  P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS, SPEC_AXIS),
        check_vma=False)

    @jax.jit
    def step(plan, q_table, temperature, pressure, vmr):
        return fn(plan, q_table, temperature, pressure, vmr)

    step.call_blocks = plan
    step.backend = "pallas"
    return step


def make_lines_sharded_step(static, info, mesh, weight_density=True,
                            chunk=512, backend=None, blocks=None,
                            tile=None, t_max=350.0, p_max_atm=5.0,
                            interpret=False):
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

    ``backend``: "pallas" runs the production strided-wings + mixed-slot
    segment-core kernels per shard (requires ``blocks`` at build time;
    all three modes — ring circulates raw constant blocks against
    resident per-step gather plans, :func:`_make_pallas_ring_step`);
    "xla" the portable accumulate_segment path (the CPU/parity
    fallback); None auto-selects pallas on TPU when applicable.  A
    pallas step consumes its own plan pytree instead of the raw blocks —
    pass ``step.call_blocks`` (device_put by the caller) as the first
    call argument.
    """
    if backend is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        backend = "pallas" if (on_tpu or interpret) and blocks is not None \
            else "xla"
    if backend == "pallas":
        if blocks is None:
            raise ValueError("backend='pallas' needs the host blocks at "
                             "build time")
        maker = _make_pallas_ring_step if info.get("mode") == "ring" \
            else _make_pallas_sharded_step
        step = maker(blocks, static, info, mesh, weight_density,
                     tile or 1024, t_max, p_max_atm, interpret)
        if step is not None:
            return step
        # Window too wide for any stride: fall through to the XLA path.
    spec = mesh.shape[SPEC_AXIS]
    # Gas-stacked blocks (shard_stacked_packs) decompose the flat
    # [G * num_points] grid; single-gas blocks the per-gas grid.
    stacked = "flat_points" in info
    num_points = info.get("flat_points", static["num_points"])
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
            if stacked:
                # vmr is [B, G]; weight each flat point by its own gas's
                # number density.
                n_density = pressure[:, None] * vmr \
                    / (c.KB * temperature[:, None])
                pts = origin + jnp.arange(local_n)
                gas_pt = jnp.minimum(pts // static["num_points"],
                                     vmr.shape[1] - 1)
                k = k * n_density[:, gas_pt]
            else:
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

    step.call_blocks = None   # xla steps consume the raw blocks
    step.backend = "xla"
    return step


def remove_stacked_pedestal(packs, grid, k, temperature, pressure,
                            vmr_mat, cut_off=c.DEFAULT_CUT_OFF):
    """Reference-exact pedestal removal applied per gas, layer-batched.

    Args:
        packs: dict name -> LinePack in gas order.
        k: [B, G, num_points] float64 cross sections (modified copy
            returned).
        vmr_mat: [B, G] float64 mole fractions.

    Returns:
        [B, G, num_points] with each gas's pedestal subtracted
        (reference spectra.c:66-78 semantics, models/lines/pedestal.py).
    """
    from ..models.lines.gas import internal_grid
    from ..models.lines.pedestal import (apply_pedestal_batch,
                                         compute_pedestals_batch)
    from ..models.lines.physics import kernel_inputs, line_profile_params

    v0, vn, n_per_v, num_points = internal_grid(grid)
    k = np.array(k, np.float64, copy=True)
    for g, (name, pack) in enumerate(packs.items()):
        keep = pack.compat_break_filter(v0, vn, cut_off)
        if keep == 0:
            continue
        params = line_profile_params(pack, temperature, pressure,
                                     vmr_mat[:, g], keep=keep)
        kin = kernel_inputs(params, v0, n_per_v, cut_off)
        kin["nu_raw"] = pack.nu[:keep]
        kin["nu_shift"] = params["nu_shift"]
        ped = compute_pedestals_batch(k[:, g], kin, num_points, n_per_v,
                                      cut_off)
        k[:, g] = apply_pedestal_batch(k[:, g], ped, kin["s_idx"],
                                       kin["e_idx"], num_points)
    return k


@jax.jit
def _gather_points(k_flat, flat_idx):
    """Device gather of field values: k_flat [B, n_pad], flat_idx [B, M]
    int32 -> [B, M].  The only field data the pedestal scan consumes."""
    return jnp.take_along_axis(k_flat, flat_idx, axis=1)


@functools.partial(jax.jit, static_argnames=("num_gases", "num_points"))
def _apply_pedestal_device(k_flat, ped, gas_idx, s_loc, e_loc, num_gases,
                           num_points):
    """Box-subtracts per-line pedestals on device.

    The difference-array formulation of the reference's per-window loop
    (reference spectra.c:73-77): +ped at each window start, -ped past its
    end, one cumulative sum.  The cumsum runs per gas segment so float32
    rounding never leaks across gas boundaries (in exact arithmetic the
    running sum returns to zero at each segment edge).

    Args:
        k_flat: [B, n_pad] field, n_pad >= num_gases * num_points.
        ped: [B, M] float32 pedestal values (0 for dead lines).
        gas_idx: [M] int32 gas of each line.
        s_loc / e_loc: [B, M] int32 clamped per-gas window bounds.

    Returns:
        [B, n_pad] with pedestals removed (padding tail untouched).
    """
    batch, n_pad = k_flat.shape
    flat = num_gases * num_points
    k = k_flat[:, :flat].reshape(batch, num_gases, num_points)
    diff = jnp.zeros((batch, num_gases, num_points + 1), k.dtype)
    b_ix = jnp.arange(batch)[:, None]
    g_ix = jnp.broadcast_to(gas_idx[None, :], ped.shape)
    diff = diff.at[b_ix, g_ix, s_loc].add(ped)
    diff = diff.at[b_ix, g_ix, e_loc + 1].add(-ped)
    k = k - jnp.cumsum(diff[..., :num_points], axis=-1)
    out = k.reshape(batch, flat)
    if n_pad > flat:
        out = jnp.concatenate([out, k_flat[:, flat:]], axis=1)
    return out


def make_stacked_pedestal_remover(packs, grid, cut_off=c.DEFAULT_CUT_OFF):
    """Two-phase reference-exact pedestal removal for device fields.

    The sequential pedestal scan (models/lines/pedestal.py, reference
    spectra.c:66-78) needs the accumulated field only at each line's left
    window endpoint, so instead of gathering the whole [B, G, num_points]
    field to the host (prohibitive over a slow host<->device link), this:

    1. gathers the [B, N_total] endpoint values on device and fetches
       only those;
    2. runs the host physics + sequential scan per gas (float64);
    3. box-subtracts the resulting pedestals on device
       (:func:`_apply_pedestal_device`).

    Args:
        packs: dict name -> LinePack in stacked gas order (a single-gas
            dict gives the non-stacked behavior).
        grid: user wavenumber grid.

    Returns:
        remove(k_dev, temperature[B], pressure[B], vmr_mat[B, G]) -> jnp
        array of k_dev's shape with pedestals removed.  ``k_dev`` is
        [B, n_pad] flat (n_pad >= G * num_points, gas-major) or
        [B, G, num_points].
    """
    from ..models.lines.gas import internal_grid
    from ..models.lines.pedestal import compute_pedestals_batch
    from ..models.lines.physics import kernel_inputs, line_profile_params

    v0, vn, n_per_v, num_points = internal_grid(grid)
    names = list(packs)
    keeps = [packs[n].compat_break_filter(v0, vn, cut_off) for n in names]

    def remove(k_dev, temperature, pressure, vmr_mat):
        t64 = np.atleast_1d(np.asarray(temperature, np.float64))
        p64 = np.atleast_1d(np.asarray(pressure, np.float64))
        x64 = np.atleast_2d(np.asarray(vmr_mat, np.float64))
        stacked_in = k_dev.ndim == 3
        k_flat = k_dev.reshape(k_dev.shape[0], -1) if stacked_in else k_dev

        kins, ps_rows = [], []
        for g, name in enumerate(names):
            keep = keeps[g]
            if keep == 0:
                kins.append(None)
                continue
            params = line_profile_params(packs[name], t64, p64, x64[:, g],
                                         keep=keep)
            kin = kernel_inputs(params, v0, n_per_v, cut_off)
            kin["nu_raw"] = packs[name].nu[:keep]
            kin["nu_shift"] = params["nu_shift"]
            kins.append(kin)
            p_s = np.clip(kin["s_idx"], 0, num_points - 1)
            ps_rows.append(g * num_points + p_s)
        if not ps_rows:
            return k_dev
        flat_ps = np.concatenate(ps_rows, axis=1).astype(np.int32)
        k_at = np.asarray(_gather_points(k_flat, flat_ps), np.float64)

        peds, gidx, s_rows, e_rows = [], [], [], []
        col = 0
        for g, kin in enumerate(kins):
            if kin is None:
                continue
            n_g = kin["s_idx"].shape[1]
            ped = compute_pedestals_batch(
                None, kin, num_points, n_per_v, cut_off,
                k_at_ps=k_at[:, col:col + n_g])
            col += n_g
            live = (kin["s_idx"] < num_points) & (kin["e_idx"] >= 0)
            peds.append(np.where(live, ped, 0.0).astype(np.float32))
            gidx.append(np.full(n_g, g, np.int32))
            s_rows.append(np.clip(kin["s_idx"], 0,
                                  num_points - 1).astype(np.int32))
            e_rows.append(np.clip(kin["e_idx"], 0,
                                  num_points - 1).astype(np.int32))
        out = _apply_pedestal_device(
            k_flat, np.concatenate(peds, axis=1), np.concatenate(gidx),
            np.concatenate(s_rows, axis=1), np.concatenate(e_rows, axis=1),
            len(names), num_points)
        return out.reshape(k_dev.shape) if stacked_in else out

    return remove


def make_multigas_sharded_pipeline(packs, grid, mesh,
                                   cut_off=c.DEFAULT_CUT_OFF,
                                   mode="balanced", remove_pedestal=False,
                                   weight_density=False, chunk=512,
                                   backend=None, interpret=False):
    """All gases, one multi-device launch — the config-5 composition.

    Gas stacking (one kernel launch for every molecule) composed with
    line sharding over the mesh's "spec" axis and layer batching over
    "batch".  Pedestal removal and density weighting run on device (the
    scan's host part touches only [B, N] endpoint values,
    :func:`make_stacked_pedestal_remover`) — the full [B, G, num_points]
    field never round-trips to the host unless the caller materializes
    the numpy result.

    Returns:
        fn(temperature[B], pressure[B], vmr[B, G]) -> numpy float64
        [B, G, num_points] cross sections [m2] (or absorption [m-1] when
        ``weight_density``), gases ordered as ``list(packs)``.
        ``fn.device(...)`` returns the same as a device-resident jnp
        float32 array (sharded over the mesh), for callers that reduce
        or stream without a host gather.  ``fn.total(...)`` returns the
        density-weighted gas sum [B, num_points] in m-1, reduced on
        device.
    """
    spec = mesh.shape[SPEC_AXIS]
    blocks, q_table, static, info, names = shard_stacked_packs(
        packs, grid, spec, cut_off, mode)
    step = make_lines_sharded_step(static, info, mesh,
                                   weight_density=False, chunk=chunk,
                                   blocks=blocks, backend=backend,
                                   interpret=interpret)
    blocks_dev = jax.tree.map(
        jnp.asarray,
        blocks if step.call_blocks is None else step.call_blocks)
    q_dev = jnp.asarray(q_table)
    num_points = static["num_points"]
    flat_points = static["flat_points"]
    num_gases = static["num_gases"]
    remover = make_stacked_pedestal_remover(packs, grid, cut_off) \
        if remove_pedestal else None

    @functools.partial(jax.jit, static_argnames=("weight",))
    def _finalize(k_flat, temperature, pressure, vmr, weight):
        k = k_flat[:, :flat_points].reshape(
            k_flat.shape[0], num_gases, num_points)
        if weight:
            n_density = pressure[:, None] * vmr / (
                jnp.asarray(c.KB, k.dtype) * temperature[:, None])
            k = k * n_density[..., None]
        return k

    def device_fn(temperature, pressure, vmr, weight=weight_density):
        t64 = np.atleast_1d(np.asarray(temperature, np.float64))
        p64 = np.atleast_1d(np.asarray(pressure, np.float64))
        x64 = np.atleast_2d(np.asarray(vmr, np.float64))
        out = step(blocks_dev, q_dev, t64.astype(np.float32),
                   p64.astype(np.float32), x64.astype(np.float32))
        if remover is not None:
            out = remover(out, t64, p64, x64)
        return _finalize(out, t64.astype(np.float32),
                         p64.astype(np.float32), x64.astype(np.float32),
                         weight)

    @jax.jit
    def _total(k):
        return jnp.sum(k, axis=1)

    def fn(temperature, pressure, vmr):
        return np.asarray(device_fn(temperature, pressure, vmr),
                          np.float64)

    fn.device = device_fn
    fn.total = lambda t, p, x: _total(device_fn(t, p, x, weight=True))
    return fn


def make_sharded_pipeline(pack, grid, mesh, cut_off=c.DEFAULT_CUT_OFF,
                          mode="balanced", remove_pedestal=False,
                          weight_density=True, chunk=512, backend=None,
                          interpret=False):
    """End-to-end multi-device absorption with optional pedestal removal.

    The device part (line physics + windowed Voigt summation) runs fully
    sharded via :func:`make_lines_sharded_step`; pedestal removal — whose
    sequential-accumulator semantics (reference spectra.c:66-78) need a
    host scan — feeds that scan from a device endpoint gather and
    box-subtracts on device (:func:`make_stacked_pedestal_remover`), so
    the full field never round-trips to the host.

    Returns:
        fn(temperature[B], pressure[B], vmr[B]) -> numpy float64
        [B, num_points] cross sections [m2] (or absorption [m-1] when
        ``weight_density``); ``fn.device(...)`` the device-resident jnp
        float32 equivalent (sharded over the mesh).
    """
    from ..models.lines.gas import internal_grid

    spec = mesh.shape[SPEC_AXIS]
    v0, vn, n_per_v, num_points = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, cut_off)
    blocks, q_table, static, info = shard_line_pack(pack, grid, spec,
                                                    cut_off, mode)
    step = make_lines_sharded_step(static, info, mesh,
                                   weight_density=False, chunk=chunk,
                                   blocks=blocks, backend=backend,
                                   interpret=interpret)
    blocks_dev = jax.tree.map(
        jnp.asarray,
        blocks if step.call_blocks is None else step.call_blocks)
    q_dev = jnp.asarray(q_table)
    remover = make_stacked_pedestal_remover({pack.formula: pack}, grid,
                                            cut_off) \
        if remove_pedestal and keep else None

    @functools.partial(jax.jit, static_argnames=("weight",))
    def _finalize(k_flat, temperature, pressure, vmr, weight):
        k = k_flat[:, :num_points]
        if weight:
            n_density = pressure * vmr / (
                jnp.asarray(c.KB, k.dtype) * temperature)
            k = k * n_density[:, None]
        return k

    def device_fn(temperature, pressure, vmr):
        t64 = np.atleast_1d(np.asarray(temperature, np.float64))
        p64 = np.atleast_1d(np.asarray(pressure, np.float64))
        x64 = np.atleast_1d(np.asarray(vmr, np.float64))
        out = step(blocks_dev, q_dev, t64.astype(np.float32),
                   p64.astype(np.float32), x64.astype(np.float32))
        if remover is not None:
            out = remover(out, t64, p64, x64[:, None])
        return _finalize(out, t64.astype(np.float32),
                         p64.astype(np.float32), x64.astype(np.float32),
                         weight_density)

    def fn(temperature, pressure, vmr):
        return np.asarray(device_fn(temperature, pressure, vmr),
                          np.float64)

    fn.device = device_fn
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
