"""Multi-host runtime: distributed initialization and global meshes.

The reference is strictly single-process (SURVEY 2.8: no MPI/NCCL/threads
anywhere); this module is the new framework's multi-host entry point.  The
flow on a TPU pod slice (or multi-slice via DCN):

    import pylbl_tpu.parallel.distributed as dist
    dist.initialize()                     # auto-detects on TPU pods
    mesh = dist.global_mesh(spec=8)       # (batch, spec) over ALL devices
    ...make_lines_sharded_step(..., mesh) # collectives compiled by XLA

Axis layout rule: the "spec" axis (which carries the halo/ring ppermute
traffic of the line exchange) is laid out over physically adjacent devices
so its collectives ride ICI; the "batch" axis (embarrassingly parallel
layers/columns, no steady-state traffic) spans hosts/slices over DCN.
``global_mesh`` enforces this by keeping each host's local devices
contiguous along "spec".
"""
import numpy as np

import jax

from .mesh import BATCH_AXIS, SPEC_AXIS


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Initializes the JAX distributed runtime for multi-host execution.

    On TPU pods every argument auto-detects from the environment; on
    CPU/GPU clusters pass them explicitly.  Safe to call in a
    single-process run: with no coordinator and no process count it is a
    no-op, so driver scripts can call it unconditionally.

    Returns:
        True if the distributed runtime was (or already is) initialized,
        False for the single-process no-op path.
    """
    # Order matters: probing jax.process_count()/jax.devices() would
    # itself initialize the XLA backend, after which distributed
    # initialization is forbidden — so check the distributed service
    # state directly.
    from jax._src import distributed as _distributed
    if _distributed.is_initialized():
        return True
    if coordinator_address is None and num_processes is None:
        import os
        from jax._src import xla_bridge
        # TPU pod runtimes define cluster topology in the environment and
        # jax.distributed.initialize() auto-detects it; anywhere else (or
        # with a single worker, or after the backend already came up) a
        # bare call would fail, so stay single-process.
        workers = [w for w in
                   os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
                   if w]
        multi = len(workers) > 1 or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        if not multi or xla_bridge.backends_are_initialized():
            return False
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def global_mesh(batch=None, spec=None):
    """Builds a (batch, spec) mesh over all devices of all processes.

    Device order is host-major: each host's local devices lie contiguous
    along the trailing "spec" axis, so the line-exchange ppermute ring
    crosses host boundaries (DCN) at most twice per host while every other
    hop stays on ICI.  The "batch" axis then naturally spans hosts.

    Args:
        batch / spec: axis sizes; must multiply to the global device
            count.  Defaults: spec = devices per process (so "spec" never
            leaves a host) and batch = process count.
    """
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    per_proc = max(n // max(jax.process_count(), 1), 1)
    if batch is None and spec is None:
        spec = per_proc
        batch = n // spec
    elif batch is None:
        batch = n // spec
    elif spec is None:
        spec = n // batch
    if batch * spec != n:
        raise ValueError(
            f"mesh {batch}x{spec} does not cover {n} global devices")
    return Mesh(devices.reshape(batch, spec), (BATCH_AXIS, SPEC_AXIS))


def process_local_rows(num_rows, mesh=None):
    """The slice of a batch-sharded leading axis owned by this process.

    Lets each host pack/load only its own layers/columns (SURVEY 5
    "host-side data loading stays per-host").  With the host-major layout
    of :func:`global_mesh` the batch axis maps to processes in order.
    """
    procs = jax.process_count()
    pid = jax.process_index()
    per = -(-num_rows // procs)
    lo = min(pid * per, num_rows)
    return slice(lo, min(lo + per, num_rows))


def host_local_batch_array(values, mesh):
    """Assembles a global batch-sharded array from per-host local rows.

    Args:
        values: numpy array holding only this process's rows (the
            :func:`process_local_rows` slice of the global batch).
        mesh: mesh from :func:`global_mesh`.

    Returns:
        A jax.Array whose global shape stitches every process's rows,
        batch-sharded; single-process this is a plain device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(values, sharding)
    return jax.make_array_from_process_local_data(sharding, values)
