"""CLI, observability and pack-cache tests."""
import json
import subprocess
import sys

import numpy as np

from pylbl_tpu.database.db import Database
from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import Gas, LinePack
from pylbl_tpu.utils.observability import metrics


def test_metrics_counters():
    metrics.reset()
    pack = synthetic_line_pack(num_lines=100, nu_min=0.7, nu_max=120.0,
                               seed=2)
    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    gas.absorption_coefficient(288.99, 98388.0, 6.6e-3,
                               np.arange(1.0, 100.0, 0.5))
    snap = metrics.snapshot()
    assert snap["counters"]["lines.processed"] > 0
    assert snap["counters"]["lines.point_evals"] > 0
    assert snap["timers"]["lines.absorption"]["calls"] == 1
    assert snap["timers"]["lines.absorption"]["seconds"] > 0


def test_line_pack_npz_roundtrip(tmp_path):
    pack = synthetic_line_pack(num_lines=64, seed=9)
    path = tmp_path / "H2O.lpk.npz"
    pack.save(path)
    back = LinePack.load(path)
    np.testing.assert_array_equal(back.nu, pack.nu)
    np.testing.assert_array_equal(back.q_table, pack.q_table)
    assert back.formula == pack.formula


def test_database_pack_cache(tmp_path):
    db = Database(tmp_path / "c.db", pack_cache_dir=tmp_path / "packs")
    pack = synthetic_line_pack(num_lines=64, seed=9)
    db.ingest_line_pack(pack)
    first = db.line_pack("H2O")
    assert (tmp_path / "packs" / "H2O.lpk.npz").exists()
    db2 = Database(tmp_path / "c.db", pack_cache_dir=tmp_path / "packs")
    second = db2.line_pack("H2O")
    np.testing.assert_array_equal(first.nu, second.nu)


def test_cli_compute_end_to_end(tmp_path):
    from pylbl_tpu import Dataset
    db = Database(tmp_path / "cli.db")
    db.ingest_line_pack(synthetic_line_pack(num_lines=120, seed=3))
    atm = Dataset(data_vars={
        "p": (["layer"], np.asarray([98388.0]),
              {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], np.asarray([288.99]),
              {"standard_name": "air_temperature", "units": "K"}),
        "q": (["layer"], np.asarray([6.6e-3]),
              {"standard_name": "mole_fraction_of_water_vapor_in_air",
               "units": "mol mol-1"}),
    })
    atm_path = tmp_path / "atm.nc"
    atm.to_netcdf(atm_path)
    out_path = tmp_path / "absorption.nc"
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}
    import os
    env.update({k: v for k, v in os.environ.items()
                if k not in env and k != "JAX_PLATFORMS"})
    result = subprocess.run(
        [sys.executable, "-m", "pylbl_tpu", "--platform", "cpu", "compute",
         "--atmosphere", str(atm_path), "--database", str(tmp_path / "cli.db"),
         "--grid", "1:500:0.5", "--output", str(out_path),
         "--format", "total", "--metrics"],
        capture_output=True, text=True, env=env, timeout=560,
        cwd="/root/repo")
    assert result.returncode == 0, result.stderr[-2000:]
    from pylbl_tpu import open_dataset
    back = open_dataset(out_path)
    assert back["absorption"].data.shape == (1, 998)
    assert np.isfinite(back["absorption"].data).all()


def test_cli_info():
    # --platform cpu: the child must not touch the TPU tunnel (env vars
    # alone are re-forced by the axon sitecustomize, so the CLI applies
    # the override post-import).
    result = subprocess.run(
        [sys.executable, "-m", "pylbl_tpu", "--platform", "cpu", "info"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert result.returncode == 0, result.stderr[-2000:]
    assert "lines backends" in result.stdout
    assert "pyLBL" in result.stdout
