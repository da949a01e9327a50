#!/usr/bin/env python
"""Multi-device / multi-host absorption with a sharded line list.

Runs the same ``Spectroscopy`` API over a (batch, spec) device mesh: atmospheric
layers are data-parallel over "batch", and every gas's line list is sharded
over "spec" (balanced decomposition + psum_scatter by default; "halo" and
"ring" are the collective-free and minimal-memory alternatives).

On a real TPU pod this scales to all chips; offline it runs identically on
a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multi_device.py
"""
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")

from pylbl_tpu import Database, Dataset, Spectroscopy
from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.parallel import distributed, make_mesh


def main():
    # Multi-host: no-op single-process, auto-detects on TPU pods.
    distributed.initialize()
    import jax
    n = len(jax.devices())
    mesh = make_mesh(batch=2 if n % 2 == 0 and n > 1 else 1,
                     spec=n // (2 if n % 2 == 0 and n > 1 else 1))
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    import tempfile
    db = Database(str(Path(tempfile.mkdtemp()) / "example.db"))
    for g, name in enumerate(["H2O", "CO2"]):
        db.ingest_line_pack(synthetic_line_pack(
            name, num_lines=5000, nu_min=0.5, nu_max=1100.0, seed=g + 1))

    layers = 4
    atmosphere = Dataset(data_vars={
        "p": (["layer"], np.geomspace(117.0, 98388.0, layers),
              {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], np.linspace(203.37, 288.99, layers),
              {"standard_name": "air_temperature", "units": "K"}),
        "h2o": (["layer"], np.full(layers, 6.6e-3),
                {"standard_name": "mole_fraction_of_water_vapor_in_air"}),
        "co2": (["layer"], np.full(layers, 3.9e-4),
                {"standard_name": "mole_fraction_of_carbon_dioxide_in_air"}),
    })
    grid = np.arange(1.0, 1000.0, 0.1)
    spec = Spectroscopy(atmosphere, grid, db, mesh=mesh,
                        sharding_mode="balanced")
    out = spec.compute_absorption(output_format="gas")
    for name in ("H2O", "CO2"):
        print(name, "max [m-1]:",
              float(out[f"{name}_absorption"].values.max()))


if __name__ == "__main__":
    main()
