"""High-level spectroscopy API.

Drop-in equivalent of the reference ``Spectroscopy``
(reference pyLBL/spectroscopy.py:72-235): per-gas, per-mechanism absorption
assembled into a Dataset with the same dims, units, mechanism ordering and
output formats.  Structural differences are all on the compute side:

- backends are resolved from the in-package registry (plugins.py) with the
  same KeyError contract on unknown names;
- molecular data (line packs, continuum tables, cross-section fits) is
  loaded once per gas and reused across layers — the reference re-reads
  sqlite and netCDF files inside the layer loop
  (reference absorption.c:44-73, cross_section.py:30);
- the per-layer lines computation shares one compiled kernel across layers
  (identical static shapes), and a fully batched/sharded pipeline is
  available in pylbl_tpu.parallel for large layer x column batches.
"""
from collections import namedtuple

import numpy as np

from .atmosphere import Atmosphere
from .database.db import (AliasNotFoundError, CrossSectionNotFoundError,
                          IsotopologuesNotFoundError, TipsDataNotFoundError,
                          TransitionsNotFoundError)
from .plugins import continua, cross_sections, molecular_lines
from .utils.constants import KB
from .utils.xrlite import DataArray, Dataset


def number_density(temperature, pressure, volume_mixing_ratio):
    """Ideal-gas number density [m-3] (reference spectroscopy.py:18-29)."""
    return pressure * volume_mixing_ratio / (KB * temperature)


class MoleculeCache:
    """Per-molecule backend objects, loaded once and reused
    (reference spectroscopy.py:32-69)."""

    def __init__(self, name, grid, lines_database, lines_engine,
                 continua_engine, cross_sections_engine):
        try:
            self.gas = lines_engine(lines_database, name)
        except (AliasNotFoundError, IsotopologuesNotFoundError,
                TipsDataNotFoundError, TransitionsNotFoundError):
            self.gas = None
        if name == "H2O":
            names = [f"{name}{x}" for x in ["Foreign", "Self"]]
        else:
            names = [name]
        try:
            self.gas_continua = [continua_engine[x]() for x in names]
        except KeyError:
            self.gas_continua = None
        try:
            self.cross_section = cross_sections_engine(
                name, lines_database.arts_crossfit(name))
        except (AliasNotFoundError, CrossSectionNotFoundError):
            self.cross_section = None


class Spectroscopy:
    """Line-by-line gas optics (API-compatible with the reference)."""

    def __init__(self, atmosphere, grid, database, mapping=None,
                 lines_backend="pyLBL", continua_backend="mt_ckd",
                 cross_sections_backend="arts_crossfit", mesh=None,
                 sharding_mode="balanced", device_mechanisms=None):
        """Initializes the object.

        Args:
            atmosphere: dataset describing atmospheric conditions
                (xarray.Dataset or pylbl_tpu Dataset).
            grid: wavenumber grid array [cm-1].
            database: Database object.
            mapping: optional dict mapping variable names
                (reference spectroscopy.py:93-103).
            lines_backend / continua_backend / cross_sections_backend:
                string backend names; unknown names raise KeyError.
            mesh: optional jax (batch, spec) Mesh (pylbl_tpu.parallel
                make_mesh / distributed.global_mesh): lines then compute
                multi-device with the line list sharded over "spec" and
                layers over "batch" (no reference analog — the reference
                is single-process, SURVEY 2.8).
            sharding_mode: line decomposition when ``mesh`` is given —
                "balanced" (default), "halo", or "ring"
                (parallel.lines.shard_line_pack).
            device_mechanisms: evaluate continua and cross sections with
                the jitted on-device paths (BandedContinuum.device_spectra
                / CrossSection.device_absorption_fn) instead of host
                numpy; under a mesh their spectral axis is sharded over
                "spec".  Default: True on accelerator backends, False on
                CPU (where the float64 host path is the parity anchor).
                The reference evaluates these per layer in host numpy
                (reference mt_ckd/utils.py:157-174,
                arts_crossfit/cross_section.py:30-48).
        """
        self.atmosphere = Atmosphere(atmosphere, mapping=mapping)
        self.grid = np.asarray(grid)
        self.lines_database = database
        self.lines_backend = lines_backend
        self.lines_engine = molecular_lines[lines_backend]
        self.continua_backend = continua_backend
        self.continua_engine = continua[continua_backend]
        self.cross_sections_backend = cross_sections_backend
        self.cross_sections_engine = cross_sections[cross_sections_backend]
        self.cache = {}
        self._multigas_fns = {}
        self.mesh = mesh
        self.sharding_mode = sharding_mode
        self._sharded_fns = {}
        if device_mechanisms is None:
            import jax
            device_mechanisms = jax.default_backend() != "cpu"
        self.device_mechanisms = device_mechanisms
        self._mechanism_fns = {}
        # Tight kernel envelope from this atmosphere's actual conditions:
        # shrinks the batched pipelines' layer-independent core-instance
        # windows vs the wide default (350 K, 5 atm) and lets atmospheres
        # outside the default bounds compute instead of raising.
        from .parallel.lines import derive_envelope
        self._envelope = derive_envelope(
            np.asarray(self.atmosphere.temperature.data),
            np.asarray(self.atmosphere.pressure.data))

        Output = namedtuple("Output",
                            ["dims", "dim_sizes", "mechanisms", "units"])
        mechanisms = ["lines", "continuum", "cross_section"]
        dims = list(self.atmosphere.temperature.dims) + \
            ["mechanism", "wavenumber"]
        dim_sizes = [x for x in self.atmosphere.temperature.sizes.values()] \
            + [len(mechanisms), self.grid.size]
        self.output = Output(dims=dims, dim_sizes=dim_sizes,
                             mechanisms=mechanisms, units={"units": "m-1"})

    def list_molecules(self):
        """Molecules available in the spectral database."""
        return self.lines_database.molecules()

    def _batch_kwargs(self, gas):
        """Extra kwargs for a lines engine's batched entry point: the
        atmosphere-derived kernel envelope when the engine accepts one
        (third-party plugin engines may not)."""
        import inspect
        try:
            params = inspect.signature(
                gas.absorption_coefficient_batch).parameters
        except (TypeError, ValueError):
            return {}
        return {"envelope": self._envelope} if "envelope" in params else {}

    def _device_mechanism_fns(self, name):
        """Jitted on-device continuum/xsec evaluators for one gas.

        Built lazily per gas and cached; under a mesh the output spectral
        axis is sharded over "spec" (the evaluations are halo-free
        gathers + elementwise band formulas, so XLA partitions them with
        no collectives) and layers over "batch".

        Returns:
            (continua_fns or None, xsec_fn or None).
        """
        fns = self._mechanism_fns.get(name)
        if fns is not None:
            return fns
        data = self.cache[name]
        cont_fns = None
        if data.gas_continua is not None:
            cont_fns = [cont.device_spectra(self.grid)
                        for cont in data.gas_continua]
        xsec_fn = None
        if data.cross_section is not None:
            xsec_fn = data.cross_section.device_absorption_fn(self.grid)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from .parallel.mesh import SPEC_AXIS
            # Shard the spectral axis over "spec" when it divides evenly
            # (the evaluations are halo-free, so XLA partitions them with
            # no collectives); the layer axis stays unsharded — batch
            # sizes vary per call and the work is grid-dominated.
            spec = self.mesh.shape[SPEC_AXIS]
            if self.grid.size % spec == 0:
                sharding = NamedSharding(self.mesh, P(None, SPEC_AXIS))
                if cont_fns is not None:
                    cont_fns = [jax.jit(fn, out_shardings=sharding)
                                for fn in cont_fns]
                if xsec_fn is not None:
                    xsec_fn = jax.jit(xsec_fn, out_shardings=sharding)
        self._mechanism_fns[name] = (cont_fns, xsec_fn)
        return cont_fns, xsec_fn

    def _continua_batch(self, name, temperature, pressure, vmr_by_gas):
        """[B, grid] continuum extinction [m-1] for one gas, summed over
        its continuum components; device path when enabled."""
        data = self.cache[name]
        if data.gas_continua is None:
            return None
        if self.device_mechanisms:
            cont_fns, _ = self._device_mechanism_fns(name)
            total = sum(fn(temperature, pressure, vmr_by_gas)
                        for fn in cont_fns)
            return np.asarray(total, np.float64)
        return sum(continuum.spectra(temperature, pressure, vmr_by_gas,
                                     self.grid)
                   for continuum in data.gas_continua)

    def _xsec_batch(self, name, temperature, pressure):
        """[B, grid] cross sections [m2] for one gas; device path when
        enabled."""
        data = self.cache[name]
        if data.cross_section is None:
            return None
        if self.device_mechanisms:
            _, xsec_fn = self._device_mechanism_fns(name)
            return np.asarray(xsec_fn(temperature, pressure), np.float64)
        return data.cross_section.absorption_coefficient_batch(
            self.grid, temperature, pressure)

    def _pad_mesh_batch(self, temperature, pressure, vmr):
        """Pads a layer batch to a multiple of the mesh batch axis with
        copies of the last layer (shard_map needs an even split); callers
        slice the result back to the true size."""
        from .parallel.mesh import BATCH_AXIS

        pad = -temperature.size % self.mesh.shape[BATCH_AXIS]
        if not pad:
            return temperature, pressure, vmr
        temperature = np.concatenate(
            [temperature, np.repeat(temperature[-1:], pad)])
        pressure = np.concatenate(
            [pressure, np.repeat(pressure[-1:], pad)])
        if isinstance(vmr, dict):
            vmr = {x: np.concatenate([v, np.repeat(v[-1:], pad)])
                   for x, v in vmr.items()}
        else:
            vmr = np.concatenate(
                [vmr, np.repeat(vmr[-1:], pad, axis=0)], axis=0)
        return temperature, pressure, vmr

    def _compute_lines_sharded_pergas(self, temperature, pressure,
                                      vmr_by_gas, remove_pedestal):
        """Per-gas multi-device line absorption over ``self.mesh`` — the
        fallback when gases cannot share one stacked launch.

        Each gas's line list is sharded over the mesh's "spec" axis and
        the layer batch over "batch" (parallel.lines.make_sharded_pipeline,
        including reference-exact pedestal removal).

        Returns:
            dict name -> [B, num_points] float64 cross sections [m2].
        """
        from .parallel.lines import make_sharded_pipeline

        num = temperature.size
        temperature, pressure, vmr_by_gas = self._pad_mesh_batch(
            temperature, pressure, vmr_by_gas)
        out = {}
        for name, vmr in vmr_by_gas.items():
            gas = self.cache[name].gas
            if gas is None or not hasattr(gas, "pack"):
                continue
            gkey = (name, float(self.grid[0]), float(self.grid[-1]),
                    self.grid.size, bool(remove_pedestal))
            gfn = self._sharded_fns.get(gkey)
            if gfn is None:
                gfn = make_sharded_pipeline(
                    gas.pack, self.grid, self.mesh,
                    mode=self.sharding_mode,
                    remove_pedestal=remove_pedestal,
                    weight_density=False)
                self._sharded_fns[gkey] = gfn
            out[name] = gfn(temperature, pressure, vmr)[:num]
        return out

    def _lines_device_stacked(self, temperature, pressure, vmr_by_gas,
                              remove_pedestal, backend=None,
                              interpret=False):
        """One stacked kernel launch for every gas's lines, device-resident.

        Replaces the reference's serial per-gas dispatch
        (reference spectroscopy.py:166-205) on TPU: all molecules' line
        lists are concatenated with per-line gas indices and a flat
        [G * num_points] output grid, so the whole layer batch x gas
        product is 2 kernel launches (wings + rows) total.  Pedestal
        removal applies on device (parallel.lines
        make_stacked_pedestal_remover: only [B, N] endpoint values visit
        the host); under a mesh the launch is line-sharded over "spec".

        Args:
            vmr_by_gas: dict name -> [B] mole fractions (insertion order
                fixes the gas order).
            backend: override ("pallas"/"xla"); default = the gases'
                resolved backend, falling back to per-gas dispatch (None
                result) unless every stackable gas resolves to "pallas".

        Returns:
            (names, k_dev) with ``names`` the stacked gas order and
            ``k_dev`` a device [B, G, num_points] float32 array of cross
            sections [m2] on the internal grid, or None when the stacked
            path does not apply.
        """
        from .parallel.lines import (UnstackableError,
                                     make_multigas_batched_fn,
                                     make_stacked_pedestal_remover)

        packs = {}
        for name in vmr_by_gas:
            gas = self.cache[name].gas
            if gas is None:
                continue
            if not hasattr(gas, "pack"):
                # A third-party engine without packed arrays: under a mesh
                # stack the stackable gases (the per-gas paths cover the
                # rest); single-chip, defer entirely to per-gas dispatch.
                if self.mesh is None:
                    return None
                continue
            if self.mesh is None and backend is None \
                    and gas._resolve_backend() != "pallas":
                return None
            packs[name] = gas.pack
        if not packs:
            return None
        key = (float(self.grid[0]), float(self.grid[-1]), self.grid.size,
               tuple(packs), backend, interpret, self._envelope,
               bool(remove_pedestal))
        cached = self._multigas_fns.get(key)
        if cached == "unstackable":
            return None
        if cached is None:
            try:
                if self.mesh is not None:
                    from .parallel.lines import \
                        make_multigas_sharded_pipeline
                    pipeline = make_multigas_sharded_pipeline(
                        packs, self.grid, self.mesh,
                        mode=self.sharding_mode,
                        remove_pedestal=remove_pedestal,
                        weight_density=False)

                    def fn(t, p, x):
                        return pipeline.device(t, p, x)
                else:
                    fn = make_multigas_batched_fn(
                        packs, self.grid, backend=backend or "pallas",
                        t_max=self._envelope[0],
                        p_max_atm=self._envelope[1],
                        interpret=interpret)
            except UnstackableError:
                self._multigas_fns[key] = "unstackable"
                return None
            remover = make_stacked_pedestal_remover(packs, self.grid) \
                if remove_pedestal and self.mesh is None else None
            cached = (fn, remover, list(packs))
            self._multigas_fns[key] = cached
        fn, remover, names = cached
        num = temperature.size
        vmr_mat = np.stack([np.asarray(vmr_by_gas[n], np.float64)
                            for n in names], axis=1)
        if self.mesh is not None:
            temperature, pressure, vmr_mat = self._pad_mesh_batch(
                temperature, pressure, vmr_mat)
        k = fn(temperature.astype(np.float32),
               pressure.astype(np.float32),
               vmr_mat.astype(np.float32))
        if remover is not None:
            k = remover(k, temperature, pressure, vmr_mat)
        return names, k[:num]

    def _compute_lines_stacked(self, temperature, pressure, vmr_by_gas,
                               remove_pedestal, backend=None,
                               interpret=False):
        """Host-materialized view of :meth:`_lines_device_stacked`.

        Returns:
            dict name -> [B, num_points] float64 cross sections [m2] on
            the internal grid, or {} when the stacked path does not apply.
        """
        out = self._lines_device_stacked(temperature, pressure, vmr_by_gas,
                                         remove_pedestal, backend=backend,
                                         interpret=interpret)
        if out is None:
            return {}
        names, k_dev = out
        k = np.asarray(k_dev, np.float64)
        return {name: k[:, g] for g, name in enumerate(names)}

    def _compute_absorption_reduced(self, output_format, temperature,
                                    pressure, vmr_by_gas, remove_pedestal,
                                    shape):
        """Device-reduced "gas"/"total" output formats.

        Per-gas mechanism sums (lines x density + continuum + xsec x
        density) combine on device and only [B, grid] arrays reach the
        host — the per-gas [B, 3, grid] mechanism arrays of the "all"
        format are never materialized (the reference always builds them
        and sums on host, reference spectroscopy.py:208-235): host-memory
        high water and transfer drop ~3G-fold for the most common
        large-run formats.

        Returns:
            Dataset, or None when some gas's lines cannot take the
            stacked device path (the caller falls back to the host path).
        """
        import jax.numpy as jnp

        names = list(self.atmosphere.gases)
        has_lines = [n for n in names if self.cache[n].gas is not None]
        stacked = self._lines_device_stacked(temperature, pressure,
                                             vmr_by_gas, remove_pedestal)
        stacked_names, k_dev = stacked if stacked is not None else ([], None)
        if any(n not in stacked_names for n in has_lines):
            return None
        ngrid = self.grid.size
        per_gas = {}
        for name in names:
            nd = number_density(temperature, pressure, vmr_by_gas[name])
            parts = []
            if name in stacked_names:
                g = stacked_names.index(name)
                parts.append(jnp.asarray(nd[:, None], k_dev.dtype)
                             * k_dev[:, g, :ngrid])
            cont_fns, xsec_fn = self._device_mechanism_fns(name)
            if cont_fns is not None:
                for fn in cont_fns:
                    parts.append(fn(temperature, pressure, vmr_by_gas))
            if xsec_fn is not None:
                parts.append(jnp.asarray(nd[:, None])
                             * xsec_fn(temperature, pressure))
            total = parts[0] if parts else jnp.zeros(
                (temperature.size, ngrid), jnp.float32)
            for part in parts[1:]:
                total = total + part
            per_gas[name] = total

        wavenumber = DataArray(self.grid, dims=("wavenumber",),
                               attrs={"units": "cm-1"})
        data_vars = {"wavenumber": wavenumber}
        dims = list(self.output.dims)
        dims.pop(-2)
        out_shape = shape + (ngrid,)
        if output_format == "gas":
            for name, total in per_gas.items():
                data_vars[f"{name}_absorption"] = DataArray(
                    np.asarray(total, np.float64).reshape(out_shape),
                    dims=dims, attrs=self.output.units)
        else:
            total = None
            for part in per_gas.values():
                total = part if total is None else total + part
            data_vars["absorption"] = DataArray(
                np.asarray(total, np.float64).reshape(out_shape),
                dims=dims, attrs=self.output.units)
        return Dataset(data_vars=data_vars)

    def compute_absorption(self, output_format="all", remove_pedestal=None):
        """Computes absorption [m-1] for every gas/layer/mechanism.

        Args:
            output_format: "all" (per gas, per mechanism), "gas" (per gas,
                mechanism-summed), anything else = single total
                "absorption" variable (reference spectroscopy.py:144-235).
            remove_pedestal: override the default (True iff the continuum
                backend is mt_ckd, reference spectroscopy.py:163-164).

        Returns:
            Dataset of absorption coefficients [m-1].
        """
        pressure = np.asarray(self.atmosphere.pressure.data,
                              dtype=np.float64).ravel()
        temperature = np.asarray(self.atmosphere.temperature.data,
                                 dtype=np.float64).ravel()
        if remove_pedestal is None:
            remove_pedestal = self.continua_backend == "mt_ckd"
        beta = {}
        num_states = temperature.size
        shape = np.asarray(self.atmosphere.temperature.data).shape
        for name in self.atmosphere.gases:
            if name not in self.cache:
                self.cache[name] = MoleculeCache(
                    name, self.grid, self.lines_database,
                    self.lines_engine, self.continua_engine,
                    self.cross_sections_engine)
        # Lines, all gases, all layers: ONE stacked kernel launch on TPU
        # (vs the reference's gas x layer serial loops,
        # spectroscopy.py:166-191); {} when the backend is not stackable.
        vmr_by_gas = {
            name: np.asarray(mf.data, dtype=np.float64).ravel()
            for name, mf in self.atmosphere.gases.items()}
        if output_format != "all" and self.device_mechanisms:
            reduced = self._compute_absorption_reduced(
                output_format, temperature, pressure, vmr_by_gas,
                remove_pedestal, shape)
            if reduced is not None:
                return reduced
        lines_stacked = self._compute_lines_stacked(
            temperature, pressure, vmr_by_gas, remove_pedestal)
        if not lines_stacked and self.mesh is not None:
            lines_stacked = self._compute_lines_sharded_pergas(
                temperature, pressure, vmr_by_gas, remove_pedestal)
        for name, mole_fraction in self.atmosphere.gases.items():
            varname = f"{name}_absorption"
            beta[varname] = DataArray(np.zeros(self.output.dim_sizes),
                                      dims=self.output.dims,
                                      attrs=self.output.units)
            data = self.cache[name]
            fraction = vmr_by_gas[name]

            # Per-gas fallback: one batched kernel launch across all
            # layers when the engine supports it (TPU); the reference
            # loops layers serially (spectroscopy.py:179-191).
            lines_batch = lines_stacked.get(name)
            if lines_batch is None and data.gas is not None and \
                    num_states > 1 and \
                    hasattr(data.gas, "absorption_coefficient_batch"):
                lines_batch = data.gas.absorption_coefficient_batch(
                    temperature, pressure, fraction, self.grid,
                    remove_pedestal=remove_pedestal,
                    **self._batch_kwargs(data.gas))

            # Continua and cross sections evaluate layer-batched (the
            # band formulas and fit/clip/interp are vectorized over [B];
            # the reference re-evaluates per layer,
            # spectroscopy.py:194-205).
            continua_batch = self._continua_batch(name, temperature,
                                                  pressure, vmr_by_gas)
            xsec_batch = self._xsec_batch(name, temperature, pressure)

            for i in range(num_states):
                n = number_density(temperature[i], pressure[i], fraction[i])
                j = np.unravel_index(i, shape)

                if data.gas is not None:
                    if lines_batch is not None:
                        k = lines_batch[i]
                    else:
                        k = data.gas.absorption_coefficient(
                            temperature[i], pressure[i], fraction[i],
                            self.grid, remove_pedestal=remove_pedestal)
                    indices = tuple(list(j) + [0, slice(None)])
                    beta[varname].values[indices] = n * k[:self.grid.size]

                if continua_batch is not None:
                    indices = tuple(list(j) + [1, slice(None)])
                    beta[varname].values[indices] += continua_batch[i]

                if xsec_batch is not None:
                    indices = tuple(list(j) + [2, slice(None)])
                    beta[varname].values[indices] = n * xsec_batch[i]
        return self._create_output_dataset(beta, output_format)

    def compute_absorption_streamed(self, path, remove_pedestal=None,
                                    resume=True, block_layers=8):
        """Streams per-gas, per-mechanism absorption to a chunked netCDF.

        For grids/batches too large for an in-memory Dataset (the
        BASELINE's RFMIP-scale configs).  States are computed in layer
        blocks of ``block_layers`` — on TPU each block is one stacked
        all-gases kernel launch plus batched continua/xsec — and flushed
        per state; an interrupted run resumes from the first unwritten
        state.

        Returns:
            The output path.
        """
        from .utils.streaming import StreamingWriter

        pressure = np.asarray(self.atmosphere.pressure.data,
                              dtype=np.float64).ravel()
        temperature = np.asarray(self.atmosphere.temperature.data,
                                 dtype=np.float64).ravel()
        if remove_pedestal is None:
            remove_pedestal = self.continua_backend == "mt_ckd"
        names = list(self.atmosphere.gases)
        vmr_full = {x: np.asarray(y.data, dtype=np.float64).ravel()
                    for x, y in self.atmosphere.gases.items()}
        writer = StreamingWriter(
            path, temperature.size, self.grid,
            [f"{n}_absorption" for n in names],
            extra_dims={"mechanism": len(self.output.mechanisms)},
            mode="auto" if resume else "w")
        with writer:
            for name in names:
                if name not in self.cache:
                    self.cache[name] = MoleculeCache(
                        name, self.grid, self.lines_database,
                        self.lines_engine, self.continua_engine,
                        self.cross_sections_engine)
            pending = writer.pending_states()
            blocks_idx = [pending[lo:lo + block_layers]
                          for lo in range(0, pending.size, block_layers)]

            def dispatch(idx):
                """Starts one block's stacked device compute (async)."""
                t_blk = temperature[idx]
                p_blk = pressure[idx]
                vmr_blk = {x: v[idx] for x, v in vmr_full.items()}
                dev = self._lines_device_stacked(t_blk, p_blk, vmr_blk,
                                                 remove_pedestal)
                return t_blk, p_blk, vmr_blk, dev

            # Double-buffered streaming: block i+1's kernels are
            # DISPATCHED before block i's [B, G, grid] result is fetched,
            # so the device computes ahead while the previous block
            # crosses the (slow) host link and hits the file.
            prev = dispatch(blocks_idx[0]) if blocks_idx else None
            for bi, idx in enumerate(blocks_idx):
                t_blk, p_blk, vmr_blk, dev = prev
                prev = dispatch(blocks_idx[bi + 1]) \
                    if bi + 1 < len(blocks_idx) else None
                if dev is not None:
                    names_s, k_dev = dev
                    k_host = np.asarray(k_dev, np.float64)
                    lines_stacked = {n: k_host[:, g]
                                     for g, n in enumerate(names_s)}
                else:
                    lines_stacked = {}
                if not lines_stacked and self.mesh is not None:
                    lines_stacked = self._compute_lines_sharded_pergas(
                        t_blk, p_blk, vmr_blk, remove_pedestal)
                blocks = {}
                for name in names:
                    data = self.cache[name]
                    block = np.zeros((idx.size,
                                      len(self.output.mechanisms),
                                      self.grid.size))
                    n_blk = number_density(t_blk, p_blk, vmr_blk[name])
                    lines = lines_stacked.get(name)
                    if lines is None and data.gas is not None:
                        lines = data.gas.absorption_coefficient_batch(
                            t_blk, p_blk, vmr_blk[name], self.grid,
                            remove_pedestal=remove_pedestal,
                            **self._batch_kwargs(data.gas)) \
                            if hasattr(data.gas,
                                       "absorption_coefficient_batch") \
                            else np.stack([
                                data.gas.absorption_coefficient(
                                    t_blk[j], p_blk[j], vmr_blk[name][j],
                                    self.grid,
                                    remove_pedestal=remove_pedestal)
                                for j in range(idx.size)])
                    if lines is not None:
                        block[:, 0] = n_blk[:, None] \
                            * lines[:, :self.grid.size]
                    cont_blk = self._continua_batch(name, t_blk, p_blk,
                                                    vmr_blk)
                    if cont_blk is not None:
                        block[:, 1] += cont_blk
                    xsec_blk = self._xsec_batch(name, t_blk, p_blk)
                    if xsec_blk is not None:
                        block[:, 2] = n_blk[:, None] * xsec_blk
                    blocks[f"{name}_absorption"] = block
                for j, i in enumerate(idx):
                    writer.write_state(int(i), {
                        key: value[j] for key, value in blocks.items()})
        return path

    def _create_output_dataset(self, absorption, output_format):
        """Assembles the output Dataset (reference spectroscopy.py:208-235)."""
        wavenumber = DataArray(self.grid, dims=("wavenumber",),
                               attrs={"units": "cm-1"})
        data_vars = {"wavenumber": wavenumber}
        dims = list(self.output.dims)
        units = self.output.units
        if output_format == "all":
            data_vars["mechanism"] = DataArray(
                np.asarray(self.output.mechanisms), dims=("mechanism",))
            data_vars.update(absorption)
        elif output_format == "gas":
            dims.pop(-2)
            data_vars.update({
                x: DataArray(np.sum(y.values, axis=-2), dims=dims,
                             attrs=units)
                for x, y in absorption.items()})
        else:
            dims.pop(-2)
            data = [np.sum(x.values, axis=-2) for x in absorption.values()]
            data_vars["absorption"] = DataArray(sum(data), dims=dims,
                                                attrs=units)
        return Dataset(data_vars=data_vars)
