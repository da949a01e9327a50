"""Dataset/DataArray container tests, including netCDF round-trip."""
import numpy as np

from pylbl_tpu import DataArray, Dataset, open_dataset


def test_dataarray_basics():
    da = DataArray(np.arange(6.0).reshape(2, 3), dims=("layer", "wavenumber"),
                   attrs={"units": "m-1"})
    assert da.sizes == {"layer": 2, "wavenumber": 3}
    assert da.attrs["units"] == "m-1"
    assert da.equals(DataArray(np.arange(6.0).reshape(2, 3),
                               dims=("layer", "wavenumber")))
    assert not da.equals(DataArray(np.zeros((2, 3)),
                                   dims=("layer", "wavenumber")))


def test_dataset_shorthand_construction():
    ds = Dataset(data_vars={
        "t": (["layer"], np.asarray([1.0, 2.0]), {"units": "K"}),
    })
    assert ds["t"].dims == ("layer",)
    assert ds["t"].attrs["units"] == "K"


def test_netcdf_roundtrip(tmp_path):
    ds = Dataset(data_vars={
        "absorption": (["layer", "wavenumber"], np.random.default_rng(0)
                       .random((2, 5)), {"units": "m-1"}),
        "wavenumber": (["wavenumber"], np.arange(5.0), {"units": "cm-1"}),
    })
    path = tmp_path / "out.nc"
    ds.to_netcdf(path)
    back = open_dataset(path)
    assert back["absorption"].dims == ("layer", "wavenumber")
    np.testing.assert_array_equal(back["absorption"].data,
                                  ds["absorption"].data)
    assert back["wavenumber"].attrs["units"] == "cm-1"
