"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
without TPU hardware) with x64 enabled so parity checks against the
reference's float64 C numerics are meaningful.  These env vars must be set
before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU *after* importing jax: the environment's axon sitecustomize
# calls register() at interpreter start and overwrites jax_platforms, so
# the JAX_PLATFORMS env var alone is silently ignored.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from collections import namedtuple  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

Atmos = namedtuple("Atmos", ["p", "t", "vmr"])


def variable(data, units, standard_name):
    return (["layer"], data, {"units": units, "standard_name": standard_name})


@pytest.fixture
def molecule_names():
    return {
        "H2O": "water_vapor",
        "CO2": "carbon_dioxide",
        "O3": "ozone",
        "N2O": "nitrous_oxide",
        "CO": "carbon_monoxide",
        "CH4": "methane",
        "O2": "oxygen",
        "N2": "nitrogen",
    }


@pytest.fixture
def spectral_grid():
    return np.arange(1.0, 3250.0, 0.1)


@pytest.fixture
def coarse_grid():
    return np.arange(1.0, 3000.0, 1.0)


@pytest.fixture
def atmosphere(molecule_names):
    """The canonical 4-layer test column (reference tests/conftest.py:54-78)."""
    pressure = np.asarray([117.0, 1032.0, 11419.0, 98388.0])  # [Pa].
    temperature = np.asarray([269.01, 227.74, 203.37, 288.99])  # [K].
    vmr = {
        molecule_names["H2O"]: np.asarray(
            [5.244536e-06, 4.763972e-06, 3.039952e-06, 6.637074e-03]),
        molecule_names["CO2"]: np.asarray(
            [0.00036, 0.00036, 0.00036, 0.00035999]),
        molecule_names["O3"]: np.asarray(
            [2.936688e-06, 7.415223e-06, 2.609510e-07, 6.859128e-08]),
        molecule_names["N2O"]: np.asarray(
            [1.050928e-08, 1.319584e-07, 2.895416e-07, 3.199949e-07]),
        molecule_names["CH4"]: np.asarray(
            [2.947482e-07, 8.817705e-07, 1.588336e-06, 1.700002e-06]),
        molecule_names["CO"]: np.asarray(
            [3.621464e-08, 1.761450e-08, 3.315927e-08, 1.482969e-07]),
        molecule_names["O2"]: np.asarray(
            [0.209, 0.209, 0.2090003, 0.208996]),
        molecule_names["N2"]: np.asarray([0.78, 0.78, 0.78, 0.78]),
    }
    return Atmos(p=pressure, t=temperature, vmr=vmr)


@pytest.fixture
def atmosphere_dataset(atmosphere):
    from pylbl_tpu import Dataset
    data_vars = {
        "pressure": variable(atmosphere.p, "Pa", "air_pressure"),
        "temperature": variable(atmosphere.t, "K", "air_temperature"),
    }
    for key, value in atmosphere.vmr.items():
        data_vars[key] = variable(value, "mol mol-1",
                                  f"mole_fraction_of_{key}_in_air")
    return Dataset(data_vars=data_vars)


@pytest.fixture
def single_layer_atmosphere(atmosphere):
    from pylbl_tpu import Dataset
    data_vars = {
        "pressure": variable(atmosphere.p[-1:], "Pa", "air_pressure"),
        "temperature": variable(atmosphere.t[-1:], "K", "air_temperature"),
    }
    for key, value in atmosphere.vmr.items():
        data_vars[key] = variable(value[-1:], "mol mol-1",
                                  f"mole_fraction_of_{key}_in_air")
    return Dataset(data_vars=data_vars)
