#!/usr/bin/env python
"""Worker for the multi-process distributed test (tests/test_distributed_mp.py).

Each process owns 4 virtual CPU devices; two processes form a global
(batch=2, spec=4) mesh — the batch axis spans processes (DCN analog), the
spec axis stays process-local (ICI analog), matching
parallel.distributed.global_mesh's layout rule.

Usage: distributed_worker.py <coordinator> <num_processes> <process_id>
Prints one JSON line with this process's local-shard checksums.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    from pylbl_tpu.parallel import distributed as dist

    assert dist.initialize(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes
    mesh = dist.global_mesh(spec=4)          # batch = num_processes.

    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.parallel import make_lines_sharded_step, shard_line_pack

    pack = synthetic_line_pack(num_lines=300, nu_min=0.7, nu_max=200.0,
                               seed=11)
    grid = np.arange(1.0, 180.0, 0.5)
    blocks, q_table, static, info = shard_line_pack(pack, grid, 4,
                                                    mode="balanced")
    step = make_lines_sharded_step(static, info, mesh)

    # Global batch of 2 layers; this process loads only its own row.
    t_all = np.asarray([288.99, 227.74], np.float32)
    p_all = np.asarray([98388.0, 1032.0], np.float32)
    x_all = np.asarray([6.637074e-03, 4.763972e-06], np.float32)
    rows = dist.process_local_rows(2, mesh)
    t = dist.host_local_batch_array(t_all[rows], mesh)
    p = dist.host_local_batch_array(p_all[rows], mesh)
    x = dist.host_local_batch_array(x_all[rows], mesh)
    blocks_g = {k: jax.device_put(v) for k, v in blocks.items()}
    out = step(blocks_g, q_table, t, p, x)

    # Each process reads back its addressable shards only.
    local = {}
    for shard in out.addressable_shards:
        local[str(shard.index)] = [
            float(np.asarray(shard.data).sum()),
            float(np.asarray(shard.data).max())]
    print(json.dumps({"process": process_id,
                      "num_points": static["num_points"],
                      "local": local}))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
