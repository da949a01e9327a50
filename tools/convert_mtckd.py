#!/usr/bin/env python
"""Converts an MT-CKD coefficient netCDF into pylbl_tpu's table format.

The AER MT-CKD continuum tables ship as a netCDF4 file (the reference
packages them as pyLBL/mt_ckd/mt-ckd.nc, read via netCDF4 in
pyLBL/mt_ckd/utils.py:114-142).  pylbl_tpu stores them as an npz of
float64 arrays plus uniform-grid descriptors, loadable without any netCDF
dependency and directly usable as device arrays.

Usage:
    python tools/convert_mtckd.py <mt-ckd.nc> <output.npz>
"""
import sys

import h5py
import numpy as np

# Variables consumed by the continuum bands (reference mt_ckd/*.py).
VARIABLES = [
    "bs296", "bs260", "bfh2o", "xfac_rhu",              # H2O self/foreign
    "bfco2", "tdep_bandhead", "x_factor_co2",           # CO2
    "x_o3", "y_o3", "z_o3", "o3_hh0", "o3_hh1",         # O3
    "o3_hh2", "o3_huv",
    "o2_f", "o2_t", "o2_inf1", "o2_inf3", "o2_invis",   # O2
    "o2_infuv",
    "ct_296", "sf_296", "ct_220", "sf_220",             # N2
    "xn2_272", "xn2_228", "a_h2o", "xn2",
]


def convert(source, destination):
    out = {}
    with h5py.File(source, "r") as handle:
        for name in VARIABLES:
            dset = handle[name]
            out[f"{name}__data"] = np.asarray(dset[()], dtype=np.float64)
            for attr, key in (("wavenumber_lower_bound", "lo"),
                              ("wavenumber_upper_bound", "hi"),
                              ("wavenumber_resolution", "res")):
                value = np.asarray(dset.attrs[attr], dtype=np.float64).ravel()
                out[f"{name}__{key}"] = value[0]
    np.savez_compressed(destination, **out)
    print(f"wrote {len(VARIABLES)} tables to {destination}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
