"""Molecular-lines gas optics engine (the "pyLBL" lines backend).

API-compatible with the reference's C-backed ``Gas``
(reference pyLBL/c_lib/gas_optics.py:29-92) but TPU-native: instead of a
ctypes call into a serial C loop that re-reads sqlite per call (reference
absorption.c:44-87), the line list is packed once into device-ready
structure-of-arrays (:class:`~pylbl_tpu.models.lines.physics.LinePack`) and
the spectrum is computed by vectorized JAX kernels (ops/lineshape.py, with a
Pallas TPU fast path in ops/lineshape_pallas.py).
"""
import numpy as np

from .physics import LinePack, kernel_inputs, line_profile_params
from .pedestal import (apply_pedestal, apply_pedestal_batch,
                       compute_pedestals, compute_pedestals_batch)
from ...ops import lineshape
from ...utils.constants import DEFAULT_CUT_OFF


def internal_grid(grid):
    """Derives the reference's internal-grid convention from a user grid.

    v0 = round(grid[0]), vn = round(grid[-1]) + 1,
    n_per_v = round(1/resolution); the internal grid is
    v[i] = v0 + i / n_per_v with (vn - v0) * n_per_v points and the caller
    truncates to grid.size (reference gas_optics.py:61-65,
    absorption.c:32-41, spectroscopy.py:191).
    """
    grid = np.asarray(grid)
    v0 = int(round(float(grid[0])))
    vn = int(round(float(grid[-1])) + 1)
    n_per_v = int(round(1.0 / (float(grid[1]) - float(grid[0]))))
    num_points = (vn - v0) * n_per_v
    return v0, vn, n_per_v, num_points


class Gas:
    """Gas optics calculation for one molecule.

    Attributes:
        pack: LinePack with the molecule's line list.
        formula: string chemical formula.
    """

    def __init__(self, lines_database, formula, dtype=None, backend="auto"):
        """Initializes the engine.

        Args:
            lines_database: a Database-like object exposing
                ``line_pack(formula) -> LinePack``, or a LinePack directly.
            formula: string chemical formula.
            dtype: kernel dtype; default float64 when JAX x64 is enabled,
                else float32.
            backend: "pallas" (TPU tile kernels), "xla" (portable
                scatter-add path), or "auto" (pallas on TPU devices).
        """
        if isinstance(lines_database, LinePack):
            self.pack = lines_database
        else:
            self.pack = lines_database.line_pack(formula)
        self.formula = formula
        self.database = getattr(lines_database, "path", None)
        self._dtype = dtype
        self.backend = backend

    def _resolve_backend(self):
        if self.backend != "auto":
            return self.backend
        import jax
        return "pallas" if jax.default_backend() in ("tpu", "axon") \
            else "xla"

    @property
    def dtype(self):
        if self._dtype is not None:
            return np.dtype(self._dtype)
        import jax
        return np.dtype(np.float64 if jax.config.jax_enable_x64
                        else np.float32)

    def absorption_coefficient(self, temperature, pressure,
                               volume_mixing_ratio, grid,
                               remove_pedestal=False,
                               cut_off=DEFAULT_CUT_OFF):
        """Calculates the absorption cross-section spectrum.

        Args:
            temperature: temperature [K].
            pressure: pressure [Pa].
            volume_mixing_ratio: mole fraction [mol mol-1].
            grid: spectral grid [cm-1] (must start near an integer
                wavenumber with 1/integer resolution, like the reference).
            remove_pedestal: subtract the per-line pedestal with the
                reference's sequential-accumulator semantics
                (reference spectra.c:66-78).
            cut_off: wing cut-off from line center [cm-1].

        Returns:
            numpy float64 array of absorption cross sections [m2] on the
            *internal* grid of size (vn - v0) * n_per_v; callers truncate to
            ``grid.size`` (identical contract to reference
            gas_optics.py:61-92).
        """
        from ...utils.observability import metrics

        v0, vn, n_per_v, num_points = internal_grid(grid)
        keep = self.pack.compat_break_filter(v0, vn, cut_off)
        if keep == 0:
            return np.zeros(num_points)
        with metrics.timed("lines.absorption"):
            params = line_profile_params(self.pack, temperature, pressure,
                                         volume_mixing_ratio, keep=keep)
            kin = kernel_inputs(params, v0, n_per_v, cut_off)
            if self._resolve_backend() == "pallas":
                from ...ops.lineshape_pallas import accumulate_tpu
                arrays = lineshape.prepare_kernel_arrays(kin, n_per_v,
                                                         np.float32)
                k = np.asarray(
                    accumulate_tpu(arrays, kin, num_points, n_per_v,
                                   cut_off), dtype=np.float64)
            else:
                arrays = lineshape.prepare_kernel_arrays(kin, n_per_v,
                                                         self.dtype)
                k = np.asarray(
                    lineshape.accumulate(arrays, num_points, n_per_v,
                                         cut_off), dtype=np.float64)
            if remove_pedestal:
                with metrics.timed("lines.pedestal"):
                    kin_ped = dict(kin)
                    kin_ped["nu_raw"] = self.pack.nu[:keep]
                    kin_ped["nu_shift"] = params["nu_shift"]
                    ped = compute_pedestals(k, kin_ped, num_points,
                                            n_per_v, cut_off)
                    k = apply_pedestal(k, ped, kin["s_idx"], kin["e_idx"],
                                       num_points)
        metrics.count("lines.processed", int(keep))
        metrics.count("lines.point_evals",
                      int(keep) * ((2 * cut_off + 1) * n_per_v + 1))
        metrics.count("lines.grid_points", int(num_points))
        return k

    def absorption_coefficient_batch(self, temperature, pressure,
                                     volume_mixing_ratio, grid,
                                     remove_pedestal=False,
                                     cut_off=DEFAULT_CUT_OFF,
                                     envelope=None):
        """Layer-batched absorption cross sections.

        Same semantics as :meth:`absorption_coefficient` applied per layer
        (identical to the reference's serial layer loop,
        spectroscopy.py:179-191), but computed as one batched kernel
        launch on TPU.

        Args:
            temperature / pressure / volume_mixing_ratio: [B] arrays.
            envelope: optional (t_max [K], p_max_atm [atm]) kernel
                envelope (parallel.lines.derive_envelope); tighter
                envelopes shrink the layer-independent core-instance
                windows.  Default: the pipeline's wide terrestrial bounds.
                Only the fused device (pallas) pipeline uses it — the
                portable per-layer fallback has no precomputed windows, so
                the envelope (and its out-of-range guard) is a no-op
                there.

        Returns:
            numpy float64 [B, (vn - v0) * n_per_v].
        """
        from ...utils.observability import metrics

        temperature = np.atleast_1d(np.asarray(temperature, np.float64))
        pressure = np.atleast_1d(np.asarray(pressure, np.float64))
        volume_mixing_ratio = np.atleast_1d(
            np.asarray(volume_mixing_ratio, np.float64))
        num_layers = temperature.size
        v0, vn, n_per_v, num_points = internal_grid(grid)
        keep = self.pack.compat_break_filter(v0, vn, cut_off)
        if keep == 0:
            return np.zeros((num_layers, num_points))
        backend = self._resolve_backend()
        if backend != "pallas":
            return np.stack([
                self.absorption_coefficient(
                    temperature[i], pressure[i], volume_mixing_ratio[i],
                    grid, remove_pedestal=remove_pedestal, cut_off=cut_off)
                for i in range(num_layers)])
        with metrics.timed("lines.absorption_batch"):
            # Fused device pipeline: line constants live on device; only
            # the [B] layer conditions transfer per call.
            from ...parallel.lines import make_batched_tpu_fn
            key = (float(grid[0]), float(grid[-1]), len(grid), cut_off,
                   envelope)
            fn = getattr(self, "_batched_fns", {}).get(key)
            if fn is None:
                kwargs = {} if envelope is None else \
                    {"t_max": envelope[0], "p_max_atm": envelope[1]}
                fn = make_batched_tpu_fn(self.pack, grid, cut_off=cut_off,
                                         **kwargs)
                if not hasattr(self, "_batched_fns"):
                    self._batched_fns = {}
                self._batched_fns[key] = fn
            k = np.asarray(
                fn(temperature.astype(np.float32),
                   pressure.astype(np.float32),
                   volume_mixing_ratio.astype(np.float32)),
                dtype=np.float64)
            if remove_pedestal:
                params = line_profile_params(
                    self.pack, temperature, pressure, volume_mixing_ratio,
                    keep=keep)
                kin = kernel_inputs(params, v0, n_per_v, cut_off)
                kin["nu_raw"] = self.pack.nu[:keep]
                kin["nu_shift"] = params["nu_shift"]
                with metrics.timed("lines.pedestal"):
                    ped = compute_pedestals_batch(k, kin, num_points,
                                                  n_per_v, cut_off)
                    k = apply_pedestal_batch(k, ped, kin["s_idx"],
                                             kin["e_idx"], num_points)
        metrics.count("lines.processed", int(keep) * num_layers)
        metrics.count("lines.point_evals",
                      int(keep) * num_layers
                      * ((2 * cut_off + 1) * n_per_v + 1))
        return k
