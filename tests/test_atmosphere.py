"""Atmosphere CF discovery tests (mirrors reference tests/test_atmosphere.py)."""
import pytest

from pylbl_tpu import Dataset
from pylbl_tpu.atmosphere import Atmosphere


def check_atmosphere(names, dataset, mapping=None):
    atm = Atmosphere(dataset, mapping=mapping)
    for name in ["pressure", "temperature"]:
        assert getattr(atm, name).equals(dataset.data_vars[name])
    for key, value in names.items():
        assert atm.gases[key].equals(dataset.data_vars[value])


def test_atmosphere_without_mapping(molecule_names, atmosphere_dataset):
    names = {v: k for k, v in molecule_names.items()}
    check_atmosphere({k: v for v, k in names.items()}, atmosphere_dataset)


def test_atmosphere_with_mapping(molecule_names, atmosphere_dataset):
    mapping = {
        "play": "pressure",
        "tlay": "temperature",
        "mole_fraction": {k: v for k, v in molecule_names.items()},
    }
    check_atmosphere(molecule_names, atmosphere_dataset, mapping=mapping)


def test_atmosphere_missing_standard_name(atmosphere_dataset):
    bad = Dataset(data_vars={
        "pressure": (["layer"], [1.0], {"units": "Pa"}),
    })
    with pytest.raises(ValueError):
        Atmosphere(bad)


def test_packed_layout(atmosphere_dataset, atmosphere):
    atm = Atmosphere(atmosphere_dataset)
    p, t, vmr = atm.packed()
    assert p.shape == (4,)
    assert t[-1] == atmosphere.t[-1]
    assert vmr["H2O"][-1] == atmosphere.vmr["water_vapor"][-1]
