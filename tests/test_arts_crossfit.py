"""Cross-section backend tests against synthetic coefficient files.

The real arts-crossfit coefficient files need network access (reference
tests/test_artscrossfit.py downloads them); these tests generate synthetic
files with the same structure and validate the fit evaluation, the
integral-conserving negative clipping, and the Hz-grid interpolation
against an independent scipy-based evaluation of the reference formulas.
"""
import h5py
import numpy as np
import pytest
from scipy.interpolate import interp1d

from pylbl_tpu.models.arts_crossfit import (CrossSection, calculate_xsec,
                                            calculate_xsec_fullmodel)

C0 = 299792458.0


def make_coeff_file(path, bands=2, seed=0):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as handle:
        handle.create_dataset("bands", data=np.arange(bands))
        lo = 2.0e13
        for m in range(bands):
            nfreq = 200 + 50 * m
            fgrid = np.linspace(lo, lo * (1.5 + m), nfreq)
            coeffs = np.zeros((nfreq, 4))
            coeffs[:, 0] = rng.uniform(-1e-23, 5e-22, nfreq)   # p00
            coeffs[:, 1] = rng.uniform(-1e-25, 1e-25, nfreq)   # p10 * T
            coeffs[:, 2] = rng.uniform(-1e-28, 1e-28, nfreq)   # p01 * P
            coeffs[:, 3] = rng.uniform(-1e-28, 1e-28, nfreq)   # p20 * T^2
            handle.create_dataset(f"band{m}_fgrid", data=fgrid)
            handle.create_dataset(f"band{m}_coeffs", data=coeffs)
            lo = fgrid[-1] * 1.1


def reference_eval(path, grid, temperature, pressure):
    """Direct transcription of the reference algorithm
    (cross_section.py:30-48) using scipy interp1d."""
    freq_user = grid * C0 * 100.0
    out = np.zeros(grid.size)
    with h5py.File(path, "r") as handle:
        for m in np.asarray(handle["bands"][()]):
            fgrid = handle[f"band{m}_fgrid"][()]
            coeffs = handle[f"band{m}_coeffs"][()].T
            xsec = calculate_xsec(temperature, pressure, coeffs)
            if np.sum(xsec < 0) > 0:
                total = np.sum(xsec)
                xsec[xsec < 0] = 0.0
                if total >= 0:
                    xsec = xsec * (total / np.sum(xsec))
            out += interp1d(fgrid, xsec, fill_value=0.0,
                            bounds_error=False)(freq_user)
    return out


def test_cross_section_matches_reference_algorithm(tmp_path):
    path = tmp_path / "XYZ.nc"
    make_coeff_file(path, bands=3, seed=42)
    xsec = CrossSection("XYZ", str(path))
    grid = np.arange(600.0, 1500.0, 0.7)
    for t, p in [(288.99, 98388.0), (203.37, 11419.0)]:
        got = xsec.absorption_coefficient(grid, t, p)
        expected = reference_eval(path, grid, t, p)
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-300)


def test_negative_clipping_conserves_integral():
    rng = np.random.default_rng(3)
    coeffs = np.zeros((4, 50))
    coeffs[0] = rng.uniform(-2e-22, 5e-22, 50)
    raw = calculate_xsec(250.0, 5e4, coeffs)
    assert np.sum(raw < 0) > 0 and np.sum(raw) >= 0
    clipped = calculate_xsec_fullmodel(250.0, 5e4, coeffs)
    assert np.all(clipped >= 0)
    np.testing.assert_allclose(np.sum(clipped), np.sum(raw), rtol=1e-12)


def test_out_of_band_grid_is_zero(tmp_path):
    path = tmp_path / "Z.nc"
    make_coeff_file(path, bands=1, seed=7)
    xsec = CrossSection("Z", str(path))
    grid = np.arange(1.0, 10.0, 1.0)  # far below the band frequencies
    got = xsec.absorption_coefficient(grid, 288.0, 1e5)
    assert np.array_equal(got, np.zeros(grid.size))


def test_batched_and_device_xsec_match_scalar(tmp_path):
    """Layer-batched and jitted-device evaluation both reproduce the
    per-layer reference algorithm, including clip-rescale layers."""
    path = tmp_path / "xsb.nc"
    make_coeff_file(path, bands=3, seed=7)
    xs = CrossSection("CFC11", str(path))
    grid = np.arange(1.0, 3000.0, 2.0)
    t = np.asarray([288.99, 203.37, 1000.0])  # hot layer forces clipping
    p = np.asarray([98388.0, 11419.0, 101300.0])
    want = np.stack([xs.absorption_coefficient(grid, t[i], p[i])
                     for i in range(t.size)])
    got = xs.absorption_coefficient_batch(grid, t, p)
    np.testing.assert_allclose(got, want, rtol=1e-13)
    fn = xs.device_absorption_fn(grid)
    dev = np.asarray(fn(t, p))
    np.testing.assert_allclose(dev, want, rtol=1e-12,
                               atol=np.abs(want).max() * 1e-14)
