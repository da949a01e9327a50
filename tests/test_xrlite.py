"""Dataset/DataArray container tests, including netCDF round-trip."""
import numpy as np
import pytest

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


def test_netcdf_dimension_scales(tmp_path):
    """to_netcdf must write REAL netCDF-4 dimension scales (CLASS=
    DIMENSION_SCALE + DIMENSION_LIST references + the hidden-placeholder
    NAME convention) — exactly what netCDF-C / xarray reconstruct dims
    from (reference docs/source/absorption_output.rst:15-124)."""
    import h5py

    ds = Dataset(data_vars={
        "absorption": (["layer", "wavenumber"],
                       np.arange(10.0).reshape(2, 5), {"units": "m-1"}),
        "wavenumber": (["wavenumber"], np.arange(5.0), {"units": "cm-1"}),
    }, attrs={"title": "test"})
    path = tmp_path / "scales.nc"
    ds.to_netcdf(path)
    with h5py.File(path, "r") as f:
        # Coordinate variable doubles as its dimension's scale.
        wn = f["wavenumber"]
        assert wn.attrs["CLASS"] == b"DIMENSION_SCALE"
        # Dimension without coordinate: hidden placeholder scale.
        layer = f["layer"]
        assert layer.attrs["CLASS"] == b"DIMENSION_SCALE"
        assert layer.attrs["NAME"].startswith(
            b"This is a netCDF dimension but not a netCDF variable.")
        assert layer.shape == (2,)
        # Data variable references both scales in order.
        ab = f["absorption"]
        assert "DIMENSION_LIST" in ab.attrs
        assert [d[0].name.lstrip("/")
                for d in ab.dims] == ["layer", "wavenumber"]
        assert f.attrs["_NCProperties"].startswith(b"version=2")
    # Engine-free reader: placeholder scales are NOT variables, user
    # attrs survive, _NCProperties is filtered.
    back = open_dataset(path)
    assert set(back.keys()) == {"absorption", "wavenumber"}
    assert back["absorption"].dims == ("layer", "wavenumber")
    assert back.attrs["title"] == "test"
    assert "_NCProperties" not in back.attrs


def test_netcdf_conflicting_dim_sizes_rejected(tmp_path):
    ds = Dataset(data_vars={
        "a": (["x"], np.arange(3.0)),
        "b": (["x"], np.arange(4.0)),
    })
    try:
        ds.to_netcdf(tmp_path / "bad.nc")
    except ValueError as exc:
        assert "conflicting sizes" in str(exc)
    else:
        raise AssertionError("conflicting dim sizes must raise")


def test_netcdf_xarray_roundtrip(tmp_path):
    """Full interop check when the real xarray + a netCDF engine are
    importable (not shipped in this environment; runs wherever the user
    has the reference's dependency stack)."""
    xr = pytest.importorskip("xarray")
    ds = Dataset(data_vars={
        "absorption": (["layer", "wavenumber"],
                       np.arange(10.0).reshape(2, 5), {"units": "m-1"}),
        "wavenumber": (["wavenumber"], np.arange(5.0), {"units": "cm-1"}),
    })
    path = tmp_path / "xr.nc"
    ds.to_netcdf(path)
    with xr.open_dataset(path) as back:
        assert tuple(back["absorption"].dims) == ("layer", "wavenumber")
        np.testing.assert_array_equal(back["absorption"].values,
                                      ds["absorption"].data)
        np.testing.assert_array_equal(back.coords["wavenumber"].values,
                                      np.arange(5.0))
