#!/usr/bin/env python
"""Quickstart: absorption spectrum for a one-layer atmosphere.

Mirrors the reference's README quickstart (reference README.rst:31-58)
with the same API.  With a HITRAN-built database (see
``python -m pylbl_tpu create-db``) pass its path as argv[1]; without one
this falls back to a synthetic offline line list so the example runs
anywhere.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pylbl_tpu import Database, Dataset, Spectroscopy


def make_database(path=None):
    if path:
        return Database(path)
    import tempfile
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    db = Database(str(Path(tempfile.mkdtemp()) / "example.db"))
    db.ingest_line_pack(synthetic_line_pack("H2O", num_lines=30000,
                                            nu_min=0.5, nu_max=3300.0,
                                            seed=1))
    return db


def main():
    atmosphere = Dataset(data_vars={
        "p": (["layer"], np.array([98388.0]),
              {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], np.array([288.99]),
              {"standard_name": "air_temperature", "units": "K"}),
        "h2o": (["layer"], np.array([0.006637]),
                {"standard_name": "mole_fraction_of_water_vapor_in_air",
                 "units": "mol mol-1"}),
    })
    grid = np.arange(1.0, 3250.0, 0.1)
    spec = Spectroscopy(atmosphere, grid,
                        make_database(sys.argv[1] if len(sys.argv) > 1
                                      else None))
    out = spec.compute_absorption(output_format="all")
    beta = out["H2O_absorption"].values  # [layer, mechanism, wavenumber]
    print("mechanisms:", list(out["mechanism"].values))
    print("lines max [m-1]:", float(beta[0, 0].max()))
    out.to_netcdf("absorption.nc")
    print("wrote absorption.nc")


if __name__ == "__main__":
    main()
