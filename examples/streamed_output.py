#!/usr/bin/env python
"""RFMIP-scale pattern: streamed, resumable absorption output.

For grids x batches too large for one in-memory Dataset (BASELINE config 5:
100 columns x 0.01 cm-1 over 1-5000), ``compute_absorption_streamed``
computes layer blocks — each one stacked all-gases kernel launch — and
flushes them to a chunked netCDF.  Interrupt it and run again: it resumes
from the first unwritten state.
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pylbl_tpu import Database, Dataset, Spectroscopy, open_dataset
from pylbl_tpu.database.fixtures import synthetic_line_pack


def main():
    db = Database(str(Path(tempfile.mkdtemp()) / "example.db"))
    db.ingest_line_pack(synthetic_line_pack("H2O", num_lines=20000,
                                            nu_min=0.5, nu_max=2100.0,
                                            seed=1))
    layers = 24
    atmosphere = Dataset(data_vars={
        "p": (["layer"], np.geomspace(117.0, 98388.0, layers),
              {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], np.linspace(203.37, 288.99, layers),
              {"standard_name": "air_temperature", "units": "K"}),
        "h2o": (["layer"], np.full(layers, 6.6e-3),
                {"standard_name": "mole_fraction_of_water_vapor_in_air"}),
    })
    grid = np.arange(1.0, 2000.0, 0.1)
    spec = Spectroscopy(atmosphere, grid, db)
    path = spec.compute_absorption_streamed("absorption_streamed.nc",
                                            block_layers=8)
    out = open_dataset(path)
    beta = out["H2O_absorption"].values
    print("wrote", path, beta.shape, "max [m-1]:", float(beta.max()))


if __name__ == "__main__":
    main()
