"""True multi-process distributed execution test (2 processes x 4 virtual
CPU devices over the gRPC coordinator), validating the multi-host entry
path end-to-end: jax.distributed.initialize, host-major global mesh,
per-process batch loading, and the line-sharded step across processes."""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

# The axon sitecustomize initializes a PJRT backend at interpreter start
# (gated on PALLAS_AXON_POOL_IPS), which forbids jax.distributed.initialize
# in the child; strip it so the workers get a clean CPU interpreter.
WORKER_ENV = {k: v for k, v in os.environ.items()
              if k != "PALLAS_AXON_POOL_IPS"}


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_step():
    port = _free_port()
    coordinator = f"localhost:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "distributed_worker.py"),
             coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(REPO), env=WORKER_ENV)
        for pid in range(2)]
    outs = []
    for proc in procs:
        try:
            out, err = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        assert proc.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # Expected: the host single-device engine, density-weighted.
    import jax
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.models.lines import Gas
    from pylbl_tpu.spectroscopy import number_density

    pack = synthetic_line_pack(num_lines=300, nu_min=0.7, nu_max=200.0,
                               seed=11)
    grid = np.arange(1.0, 180.0, 0.5)
    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    t_all = [288.99, 227.74]
    p_all = [98388.0, 1032.0]
    x_all = [6.637074e-03, 4.763972e-06]
    num_points = outs[0]["num_points"]
    local_n = -(-num_points // 4)
    padded = np.zeros((2, 4 * local_n))
    for i in range(2):
        k = gas.absorption_coefficient(t_all[i], p_all[i], x_all[i], grid)
        padded[i, :num_points] = \
            number_density(t_all[i], p_all[i], x_all[i]) * k[:num_points]

    checked = 0
    for out in outs:
        for index, (ssum, smax) in out["local"].items():
            b, s = eval(index)  # "(slice(0, 1), slice(0, 115))"
            block = padded[b, s]
            assert ssum == pytest.approx(block.sum(), rel=5e-4, abs=1e-12)
            checked += 1
    assert checked >= 4  # each process saw its own batch row's shards.
