"""Device-mesh construction for the sharded gas-optics pipeline.

The problem decomposes on two axes (SURVEY parallel design):
- "batch": layers/columns — pure data parallelism (the reference loops
  layers serially, spectroscopy.py:179);
- "spec":  the wavenumber grid — sequence-style domain decomposition.
  Each shard owns a contiguous slab of grid points; a line contributes to
  a shard iff its integer-aligned +/-cutoff window intersects the slab
  (reference spectra.c:48-62), so the physics fixes the halo at
  cutoff+1 wavenumbers of *line inputs*, not output points.
"""
import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
SPEC_AXIS = "spec"


def make_mesh(devices=None, batch=None, spec=None):
    """Builds a (batch, spec) mesh over the given (or all) devices.

    If the split is not specified, favors the spectral axis (the grid is
    usually the long dimension) while keeping batch >= 2 when possible.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if batch is None and spec is None:
        batch = 2 if n % 2 == 0 and n > 2 else 1
        spec = n // batch
    elif batch is None:
        batch = n // spec
    elif spec is None:
        spec = n // batch
    if batch * spec != n:
        raise ValueError(f"mesh {batch}x{spec} does not cover {n} devices")
    return Mesh(devices.reshape(batch, spec), (BATCH_AXIS, SPEC_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh):
    return NamedSharding(mesh, P(BATCH_AXIS))


def grid_sharded(mesh):
    return NamedSharding(mesh, P(BATCH_AXIS, SPEC_AXIS))
