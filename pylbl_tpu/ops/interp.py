"""Gather-based linear interpolation from uniform grids.

The reference interpolates each continuum band from its native coarse grid
to the user grid with ``numpy.interp`` per call (reference
mt_ckd/utils.py:157-174) and each cross-section band with
``scipy.interpolate.interp1d`` (reference arts_crossfit/cross_section.py:45).
On TPU, interpolation from a *uniform* source grid is a static gather: the
indices and fractional weights depend only on the two grids, so they are
precomputed once and every evaluation is two gathers and a fused
multiply-add — batchable over layers and shardable over the spectral axis.
"""
import numpy as np


class UniformGridInterp:
    """Precomputed linear interpolation source->target with 0 fill.

    Matches ``numpy.interp(target, source, values, left=0, right=0)`` for a
    uniform ascending source grid.
    """

    def __init__(self, lower_bound, resolution, size, target):
        target = np.asarray(target, dtype=np.float64)
        pos = (target - lower_bound) / resolution
        idx = np.floor(pos).astype(np.int64)
        frac = pos - idx
        # Points exactly on the last node interpolate with weight 0 on the
        # (clamped) right neighbor; points outside [0, size-1] get 0.
        inside = (pos >= 0.0) & (pos <= size - 1.0)
        idx_c = np.clip(idx, 0, size - 2)
        frac = np.where(inside, pos - idx_c, 0.0)
        self.idx = idx_c
        self.w1 = np.where(inside, frac, 0.0)
        self.w0 = np.where(inside, 1.0 - frac, 0.0)

    def __call__(self, values):
        """Interpolates values [..., size] onto the target grid [..., n].

        Works on numpy or jnp values (the jnp operand leads so traced
        arrays are never coerced through numpy).
        """
        lo = values[..., self.idx]
        hi = values[..., self.idx + 1]
        return lo * self.w0 + hi * self.w1


class NonuniformGridInterp:
    """Linear interpolation from an arbitrary ascending grid with 0 fill.

    Precomputes bracketing indices/weights via searchsorted; evaluation is
    again two gathers + fma (used by the cross-section backend where band
    frequency grids are stored explicitly).
    """

    def __init__(self, source, target):
        source = np.asarray(source, dtype=np.float64)
        target = np.asarray(target, dtype=np.float64)
        idx = np.searchsorted(source, target, side="right") - 1
        idx_c = np.clip(idx, 0, source.size - 2)
        x0 = source[idx_c]
        x1 = source[idx_c + 1]
        frac = (target - x0) / (x1 - x0)
        inside = (target >= source[0]) & (target <= source[-1])
        self.idx = idx_c
        self.w1 = np.where(inside, frac, 0.0)
        self.w0 = np.where(inside, 1.0 - frac, 0.0)

    def __call__(self, values):
        lo = values[..., self.idx]
        hi = values[..., self.idx + 1]
        return lo * self.w0 + hi * self.w1
