"""End-to-end Spectroscopy tests with a synthetic offline database,
including full-pipeline lines parity against the reference C oracle."""
import h5py
import numpy as np
import pytest

from pylbl_tpu import Spectroscopy
from pylbl_tpu.database.db import Database
from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import internal_grid
from pylbl_tpu.spectroscopy import number_density

import oracle


@pytest.fixture
def database(tmp_path):
    db = Database(tmp_path / "spec.db")
    packs = {}
    for formula, seed, num in [("H2O", 11, 600), ("CO2", 12, 400),
                               ("CH4", 13, 300)]:
        pack = synthetic_line_pack(formula=formula, num_lines=num,
                                   seed=seed)
        db.ingest_line_pack(pack)
        packs[formula] = pack
    # A synthetic cross-section file for CH4.
    xsec_dir = tmp_path / "coefficients"
    xsec_dir.mkdir()
    with h5py.File(xsec_dir / "CH4.nc", "w") as handle:
        handle.create_dataset("bands", data=np.array([0]))
        fgrid = np.linspace(2.0e13, 6.0e13, 300)
        handle.create_dataset("band0_fgrid", data=fgrid)
        coeffs = np.zeros((300, 4))
        coeffs[:, 0] = 1.0e-27
        handle.create_dataset("band0_coeffs", data=coeffs)
    db.ingest_arts_crossfit_directory(str(xsec_dir))
    return db, packs


def test_compute_absorption_all(database, atmosphere_dataset, coarse_grid):
    db, packs = database
    spec = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    result = spec.compute_absorption(output_format="all")
    var = result.data_vars["H2O_absorption"]
    assert var.dims == ("layer", "mechanism", "wavenumber")
    assert var.data.shape == (4, 3, coarse_grid.size)
    assert var.attrs["units"] == "m-1"
    assert np.array_equal(result["wavenumber"].data, coarse_grid)
    assert result["wavenumber"].attrs["units"] == "cm-1"
    # H2O has lines + 2 continua, no xsec file.
    assert np.max(var.data[:, 0, :]) > 0
    assert np.max(var.data[:, 1, :]) > 0
    assert np.max(var.data[:, 2, :]) == 0
    # CH4 has lines + xsec, no mt_ckd continuum.
    ch4 = result.data_vars["CH4_absorption"]
    assert np.max(ch4.data[:, 0, :]) > 0
    assert np.max(ch4.data[:, 1, :]) == 0
    assert np.max(ch4.data[:, 2, :]) > 0


def test_output_formats(database, single_layer_atmosphere, coarse_grid):
    db, _ = database
    spec = Spectroscopy(single_layer_atmosphere, coarse_grid, db)
    full = spec.compute_absorption(output_format="all")
    per_gas = spec.compute_absorption(output_format="gas")
    total = spec.compute_absorption(output_format="total")
    summed = sum(np.sum(full.data_vars[f"{g}_absorption"].data, axis=-2)
                 for g in ["H2O", "CO2", "CH4"])
    other = sum(np.sum(full.data_vars[f"{g}_absorption"].data, axis=-2)
                for g in ["O3", "N2O", "CO", "O2", "N2"])
    np.testing.assert_allclose(
        total.data_vars["absorption"].data, summed + other, rtol=1e-12)
    np.testing.assert_allclose(
        per_gas.data_vars["H2O_absorption"].data,
        np.sum(full.data_vars["H2O_absorption"].data, axis=-2), rtol=1e-12)
    assert per_gas.data_vars["H2O_absorption"].dims == \
        ("layer", "wavenumber")


def test_device_mechanisms_parity(database, atmosphere_dataset,
                                  coarse_grid):
    """The jitted on-device continua/xsec paths (the default on
    accelerator backends) match the float64 host paths on every gas and
    layer.  On this forced-CPU x64 test mesh both trace the same formulas
    in float64, so agreement is tight."""
    db, _ = database
    host = Spectroscopy(atmosphere_dataset, coarse_grid, db,
                        device_mechanisms=False)
    dev = Spectroscopy(atmosphere_dataset, coarse_grid, db,
                       device_mechanisms=True)
    k_host = host.compute_absorption(output_format="all")
    k_dev = dev.compute_absorption(output_format="all")
    for name in ["H2O", "CO2", "CH4", "O2", "N2", "O3"]:
        a = k_host.data_vars[f"{name}_absorption"].data
        b = k_dev.data_vars[f"{name}_absorption"].data
        # mechanisms 1 (continuum) and 2 (cross sections) are the ones
        # rerouted; lines (0) shares one path.
        np.testing.assert_allclose(b[:, 1:], a[:, 1:], rtol=1e-12,
                                   atol=a.max() * 1e-14)


def test_reduced_formats_device(database, atmosphere_dataset, coarse_grid):
    """Under a mesh with device mechanisms, "gas"/"total" reduce on device
    (per-gas mechanism arrays never materialize on host) and match the
    host-summed "all" output within the f32 lines tolerance."""
    from pylbl_tpu.parallel import make_mesh

    db, _ = database
    mesh = make_mesh(batch=2, spec=4)
    dev = Spectroscopy(atmosphere_dataset, coarse_grid, db, mesh=mesh,
                       device_mechanisms=True)
    host = Spectroscopy(atmosphere_dataset, coarse_grid, db,
                        device_mechanisms=False)
    full = host.compute_absorption(output_format="all")
    gases = ["H2O", "CO2", "CH4", "O3", "N2O", "CO", "O2", "N2"]
    want_total = sum(np.sum(full.data_vars[f"{g}_absorption"].data,
                            axis=-2) for g in gases)
    got_total = dev.compute_absorption(output_format="total")
    got_gas = dev.compute_absorption(output_format="gas")
    scale = np.abs(want_total).max()
    rel = np.abs(got_total.data_vars["absorption"].data - want_total) \
        / np.maximum(np.abs(want_total), scale * 1e-6)
    assert rel.max() < 5e-4
    assert got_total.data_vars["absorption"].dims == \
        ("layer", "wavenumber")
    want_h2o = np.sum(full.data_vars["H2O_absorption"].data, axis=-2)
    scale = np.abs(want_h2o).max()
    rel = np.abs(got_gas.data_vars["H2O_absorption"].data - want_h2o) \
        / np.maximum(np.abs(want_h2o), scale * 1e-6)
    assert rel.max() < 5e-4


def test_bad_backend_names(database, atmosphere_dataset, coarse_grid):
    db, _ = database
    for kwargs in [dict(lines_backend="foo"), dict(continua_backend="foo"),
                   dict(cross_sections_backend="foo")]:
        with pytest.raises(KeyError):
            Spectroscopy(atmosphere_dataset, coarse_grid, db, **kwargs)


def test_list_molecules(database, atmosphere_dataset, coarse_grid):
    db, _ = database
    spec = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    assert spec.list_molecules() == ["H2O", "CO2", "CH4"]


@pytest.mark.skipif(not oracle.available(),
                    reason="reference sources not present")
def test_lines_mechanism_oracle_parity(database, single_layer_atmosphere,
                                       coarse_grid, atmosphere):
    """The lines slice of the end-to-end output equals n * k_oracle
    (pedestal on, the mt_ckd default, reference spectroscopy.py:163-191)."""
    db, packs = database
    spec = Spectroscopy(single_layer_atmosphere, coarse_grid, db)
    result = spec.compute_absorption(output_format="all")
    v0, vn, n_per_v, _ = internal_grid(coarse_grid)
    t, p = atmosphere.t[-1], atmosphere.p[-1]
    vmr = atmosphere.vmr["water_vapor"][-1]
    k = oracle.absorption(packs["H2O"], t, p, vmr, v0, vn, n_per_v,
                          remove_pedestal=True)
    expected = number_density(t, p, vmr) * k[:coarse_grid.size]
    got = result.data_vars["H2O_absorption"].data[0, 0, :]
    np.testing.assert_allclose(got, expected, rtol=1e-8,
                               atol=np.max(expected) * 1e-12)
