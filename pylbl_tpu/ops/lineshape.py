"""Windowed Voigt summation — portable JAX path.

Computes k[t] = sum_i prefactor_i * K(x_it, y_i) over each line's
integer-aligned +/-cut_off window (reference pyLBL/c_lib/spectra.c:48-62,
voigt.c:74-189) as two order-independent passes:

1. wings: the cheap region-0 Lorentzian over the full window,
2. core:  a narrow correction (K_full - K_lorentz) around each line center,
   which is identically zero outside |x| < xlim0 (see ops/voigt.py).

The passes are chunked over lines with ``lax.scan`` and accumulated with
masked scatter-adds.  This path runs anywhere (CPU float64 for parity
verification, TPU float32) and is the semantic reference for the Pallas
TPU kernel in ops/lineshape_pallas.py.

Precision note: x = (v - nu)*repwid suffers catastrophic cancellation if
evaluated naively in float32 (v, nu ~ 1e3-4e4; v - nu ~ 1e-3).  The kernels
therefore receive the line center in *grid-index units* split into an exact
integer part and a small fractional part, so the subtraction happens between
small same-scale numbers: x = ((t - c_int) - c_frac) * (repwid / n_per_v).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .voigt import XLIM0_MAX, voigt_correction, voigt_lorentz
from ..utils.constants import SQRT_LN2


def _pad_lines(arrays, multiple):
    """Pads the line axis so it divides evenly into chunks.

    Padded entries get prefactor 0 and a window placed at [-1, -1] so every
    candidate point is dropped by masking.
    """
    n = arrays["prefactor"].shape[-1]
    padded = -n % multiple
    if padded == 0:
        return arrays, n
    def pad(name, value):
        a = arrays[name]
        width = [(0, 0)] * (a.ndim - 1) + [(0, padded)]
        return np.pad(a, width, constant_values=value)
    out = {
        "c_int": pad("c_int", 0),
        "c_frac": pad("c_frac", 0.0),
        "scaled_repwid": pad("scaled_repwid", 1.0),
        "y": pad("y", 1.0),
        "prefactor": pad("prefactor", 0.0),
        "s_idx": pad("s_idx", -1),
        "e_idx": pad("e_idx", -2),
    }
    return out, n


def prepare_kernel_arrays(kin, n_per_v, dtype):
    """Converts float64 physics outputs to kernel dtype with split centers.

    Args:
        kin: dict from physics.kernel_inputs (float64, [N] or [B, N]).
        n_per_v: grid points per wavenumber.
        dtype: kernel dtype (np.float32 or np.float64).

    Returns:
        dict of arrays ready for :func:`accumulate`.
    """
    center = kin["center"]
    c_int = np.rint(center).astype(np.int32)
    c_frac = (center - c_int).astype(dtype)
    return {
        "c_int": c_int,
        "c_frac": c_frac,
        "scaled_repwid": (kin["repwid"] / n_per_v).astype(dtype),
        "y": kin["y"].astype(dtype),
        "prefactor": kin["prefactor"].astype(dtype),
        "s_idx": kin["s_idx"].astype(np.int32),
        "e_idx": kin["e_idx"].astype(np.int32),
    }


def core_halfwidth(kin, n_per_v, cut_off):
    """Static core-window half width in grid points.

    Covers |x| < XLIM0_MAX for every line with y < 70.55 (lines with larger y
    are pure Lorentzian everywhere, reference voigt.c:17-27), clipped to the
    wing window size (no correction can land outside the window).
    """
    y = np.asarray(kin["y"], dtype=np.float64)
    repwid = np.asarray(kin["repwid"], dtype=np.float64)
    needs = y < 70.55
    if not needs.any():
        return 1
    # |delta v| < XLIM0_MAX / repwid  ->  points = that * n_per_v.
    width = XLIM0_MAX / repwid[needs].min() * n_per_v
    width = int(min(np.ceil(width) + 1, (cut_off + 1) * n_per_v))
    # Round up to the next power of two: the value is a jit-static shape, so
    # quantizing it lets molecules with different Doppler widths share one
    # compiled kernel (compile costs seconds; the extra masked points are
    # nearly free).
    return int(min(2 ** int(np.ceil(np.log2(max(width, 1)))),
                   (cut_off + 1) * n_per_v))


def core_halfwidths(repwid, n_per_v, cut_off):
    """Per-line core-window half widths in grid points.

    Same coverage guarantee as :func:`core_halfwidth` (|x| < XLIM0_MAX for
    that line at the given Doppler width) but per line, for the instance-
    based rows kernel where window sizes need not be jit-static.  The core
    window scales as 1/repwid ~ alpha ~ nu, so low-nu lines get windows
    many times narrower than the global bound.
    """
    repwid = np.asarray(repwid, dtype=np.float64)
    width = np.ceil(XLIM0_MAX / np.maximum(repwid, 1e-300) * n_per_v) + 1
    return np.minimum(width, (cut_off + 1) * n_per_v).astype(np.int64)


def _accumulate_impl(arrays, origin, num_points, total_points, window,
                     core_window, chunk):
    """Two-pass masked scatter-add accumulation over line chunks.

    Args:
        arrays: dict of [N] kernel arrays (N a multiple of chunk).
        origin: first global grid index owned by this output segment
            (0 for an unsharded run; a traced offset under shard_map when
            the spectral axis is domain-decomposed).
        num_points: local output segment size.
        total_points: global grid size (the reference clamps windows to the
            *global* upper edge, spectra.c:58-62).
    """
    dtype = arrays["prefactor"].dtype
    num_lines = arrays["prefactor"].shape[0]
    num_chunks = num_lines // chunk
    chunked = {k: v.reshape((num_chunks, chunk) + v.shape[1:])
               for k, v in arrays.items()}
    origin = jnp.asarray(origin, dtype=jnp.int32)

    wing_offsets = jnp.arange(window, dtype=jnp.int32)
    core_offsets = jnp.arange(-core_window, core_window + 1, dtype=jnp.int32)

    def body(k, ch):
        c_int = ch["c_int"][:, None]
        c_frac = ch["c_frac"][:, None]
        srw = ch["scaled_repwid"][:, None]
        y = ch["y"][:, None]
        pref = ch["prefactor"][:, None]
        s = ch["s_idx"][:, None]
        e = ch["e_idx"][:, None]
        e_eff = jnp.minimum(e, total_points - 1)

        # Wings: Lorentzian over the full window [s, e].  The mask must
        # include the local segment bounds: scatter values are zeroed (not
        # just index-dropped) because negative JAX scatter indices wrap.
        idx = s + wing_offsets[None, :]
        local = idx - origin
        x = ((idx - c_int).astype(dtype) - c_frac) * srw
        vals = pref * voigt_lorentz(x, y)
        mask = (idx >= 0) & (idx <= e_eff) & (local >= 0) & \
            (local < num_points)
        k = k.at[jnp.clip(local, 0, num_points - 1).ravel()].add(
            jnp.where(mask, vals, 0).ravel(), mode="drop")

        # Core: Humlicek correction around the center, still window-masked.
        idx = c_int + core_offsets[None, :]
        local = idx - origin
        x = ((idx - c_int).astype(dtype) - c_frac) * srw
        vals = pref * voigt_correction(x, y)
        mask = (idx >= 0) & (idx <= e_eff) & (idx >= s) & (local >= 0) & \
            (local < num_points)
        k = k.at[jnp.clip(local, 0, num_points - 1).ravel()].add(
            jnp.where(mask, vals, 0).ravel(), mode="drop")
        return k, None

    # Adding origin*0 tags the carry with the same varying manual axes as
    # the body output when running under shard_map (origin derives from
    # axis_index); it is a no-op numerically and outside shard_map.
    k0 = jnp.zeros((num_points,), dtype=dtype) + origin.astype(dtype) * 0
    k, _ = jax.lax.scan(body, k0, chunked)
    return k


@functools.partial(
    jax.jit,
    static_argnames=("num_points", "window", "core_window", "chunk"))
def _accumulate_jit(arrays, num_points, window, core_window, chunk):
    return _accumulate_impl(arrays, 0, num_points, num_points, window,
                            core_window, chunk)


def accumulate_segment(arrays, origin, num_points, total_points, window,
                       core_window, chunk):
    """Jit-friendly segment accumulation over possibly-batched arrays.

    ``arrays`` leaves may carry a leading layer-batch axis [B, N]; the
    output is then [B, num_points].  Used by the sharded pipeline
    (pylbl_tpu.parallel), where ``origin`` is the shard's global offset.
    """
    if arrays["prefactor"].ndim == 2:
        return jax.vmap(
            lambda a: _accumulate_impl(a, origin, num_points, total_points,
                                       window, core_window, chunk))(arrays)
    return _accumulate_impl(arrays, origin, num_points, total_points,
                            window, core_window, chunk)


def static_params(kin, n_per_v, cut_off, chunk=2048):
    """Derives the jit-static parameters (window sizes, chunk) for a pack."""
    window = (2 * cut_off + 1) * n_per_v + 1
    core_w = core_halfwidth(
        {"y": kin["y"], "repwid": kin["repwid"]}, n_per_v, cut_off)
    chunk = int(np.clip(2 ** int(np.log2(4.0e6 / window)), 128, chunk))
    return window, core_w, chunk


def accumulate(kernel_arrays, num_points, n_per_v, cut_off, chunk=2048):
    """Sums all line contributions onto the internal spectral grid.

    Args:
        kernel_arrays: dict from :func:`prepare_kernel_arrays` ([N] arrays).
        num_points: internal grid size (vn - v0) * n_per_v.
        n_per_v: grid points per wavenumber.
        cut_off: wing cut-off [cm-1].
        chunk: lines per scan step (controls peak memory).

    Returns:
        jnp array [num_points] of absorption cross sections (same units as
        the prefactor; m2 when physics supplied SI strengths).
    """
    window = (2 * cut_off + 1) * n_per_v + 1
    repwid = np.asarray(kernel_arrays["scaled_repwid"], np.float64) * n_per_v
    core_kin = {"y": kernel_arrays["y"], "repwid": repwid}
    core_w = core_halfwidth(core_kin, n_per_v, cut_off)
    # Bound the per-chunk working set (~chunk x window) and keep the chunk
    # size a pure function of the window so every molecule sharing a grid
    # shares one compiled kernel regardless of its line count.
    chunk = int(np.clip(2 ** int(np.log2(4.0e6 / window)), 128, chunk))
    arrays, _ = _pad_lines(kernel_arrays, chunk)
    return _accumulate_jit(arrays, int(num_points), int(window),
                           int(core_w), chunk)
