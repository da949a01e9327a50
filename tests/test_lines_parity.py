"""End-to-end lines-engine parity against the compiled reference C oracle."""
import numpy as np
import pytest

from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import Gas, internal_grid

import oracle


pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference sources not present")

SURFACE = dict(temperature=288.99, pressure=98388.0, vmr=6.637074e-03)
UPPER = dict(temperature=203.37, pressure=11419.0, vmr=3.039952e-06)


def run_both(pack, grid, remove_pedestal, conditions=SURFACE, cut_off=25):
    v0, vn, n_per_v, _ = internal_grid(grid)
    gas = Gas(pack, pack.formula, dtype=np.float64)
    ours = gas.absorption_coefficient(
        conditions["temperature"], conditions["pressure"],
        conditions["vmr"], grid, remove_pedestal=remove_pedestal,
        cut_off=cut_off)
    theirs = oracle.absorption(
        pack, conditions["temperature"], conditions["pressure"],
        conditions["vmr"], v0, vn, n_per_v, cut_off=cut_off,
        remove_pedestal=remove_pedestal)
    return np.asarray(ours), theirs


@pytest.mark.parametrize("conditions", [SURFACE, UPPER],
                         ids=["surface", "upper"])
def test_lines_no_pedestal(conditions):
    pack = synthetic_line_pack(num_lines=3000, seed=11)
    grid = np.arange(1.0, 3000.0, 0.1)
    ours, theirs = run_both(pack, grid, False, conditions)
    # atol floor: where K_full << K_lorentz the split summation cancels and
    # loses relative (not absolute) precision; spectrally irrelevant.
    np.testing.assert_allclose(ours, theirs, rtol=1e-9,
                               atol=theirs.max() * 1e-13)


@pytest.mark.parametrize("conditions", [SURFACE, UPPER],
                         ids=["surface", "upper"])
def test_lines_with_pedestal(conditions):
    pack = synthetic_line_pack(num_lines=3000, seed=13)
    grid = np.arange(1.0, 3000.0, 0.1)
    ours, theirs = run_both(pack, grid, True, conditions)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8,
                               atol=theirs.max() * 1e-12)


def test_lines_dense_cluster_pedestal():
    """Many overlapping windows: stresses the sequential-pedestal math."""
    pack = synthetic_line_pack(num_lines=2500, nu_min=450.0, nu_max=550.0,
                               seed=17, band_centers=(500.0,))
    grid = np.arange(400.0 - 399.0, 700.0, 0.1) + 399.0  # 400..699.9
    ours, theirs = run_both(pack, grid, True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8,
                               atol=theirs.max() * 1e-12)


def test_lines_grid_edges():
    """Lines straddling both grid edges exercise the clamped-window paths."""
    pack = synthetic_line_pack(num_lines=800, nu_min=0.1, nu_max=160.0,
                               seed=19, band_centers=(10.0, 120.0))
    grid = np.arange(30.0, 100.0, 0.2)
    for ped in (False, True):
        ours, theirs = run_both(pack, grid, ped)
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-8, atol=max(theirs.max(), 1e-300) * 1e-12)


def test_compat_break_semantics():
    """First out-of-range line stops processing entirely (absorption.c:80-83)."""
    pack = synthetic_line_pack(num_lines=500, nu_min=0.5, nu_max=400.0,
                               seed=23)
    grid = np.arange(50.0, 300.0, 0.5)
    ours, theirs = run_both(pack, grid, False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9,
                               atol=max(theirs.max(), 1e-300) * 1e-14)
    # A grid starting above the first line reproduces the reference's
    # break-not-continue quirk: nothing is computed at all.
    v0, vn, n_per_v, num_points = internal_grid(grid)
    assert pack.nu.min() < v0 - 26
    assert np.array_equal(ours, np.zeros(num_points))


def test_coarse_grid_resolution():
    pack = synthetic_line_pack(num_lines=1500, seed=29)
    grid = np.arange(1.0, 2500.0, 1.0)
    ours, theirs = run_both(pack, grid, True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8,
                               atol=theirs.max() * 1e-12)


@pytest.mark.parametrize("cut_off", [5, 60])
def test_nondefault_cutoff(cut_off):
    """Window indices, break semantics and pedestal endpoints all scale
    with cut_off (reference spectra.c:48-62, absorption.c:80-83); parity
    must hold away from the default 25 cm-1."""
    pack = synthetic_line_pack(num_lines=600, nu_min=0.5, nu_max=450.0,
                               seed=37)
    grid = np.arange(20.0, 400.0, 0.25)
    for ped in (False, True):
        ours, theirs = run_both(pack, grid, ped, cut_off=cut_off)
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-8, atol=max(theirs.max(), 1e-300) * 1e-12)


def test_fine_grid_resolution():
    """n_per_v = 25 (0.04 cm-1): resolutions finer than the quickstart's."""
    pack = synthetic_line_pack(num_lines=400, nu_min=0.5, nu_max=260.0,
                               seed=41)
    grid = np.arange(10.0, 200.0, 0.04)
    ours, theirs = run_both(pack, grid, True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-8,
                               atol=theirs.max() * 1e-12)


def test_hot_high_pressure_conditions():
    """Outside the terrestrial envelope (340 K, ~3 atm): stresses the
    T-scaling, pressure broadening/shift and TIPS interpolation ranges."""
    pack = synthetic_line_pack(num_lines=800, nu_min=0.5, nu_max=900.0,
                               seed=43)
    grid = np.arange(5.0, 800.0, 0.2)
    hot = dict(temperature=340.0, pressure=3.0e5, vmr=0.02)
    for ped in (False, True):
        ours, theirs = run_both(pack, grid, ped, conditions=hot)
        np.testing.assert_allclose(ours, theirs, rtol=1e-8,
                                   atol=theirs.max() * 1e-12)


def test_batch_xla_fallback_envelope_is_noop():
    """The non-fused (xla-backend) batch branch has no precomputed
    instance windows, so the ``envelope`` argument is documented as a
    no-op there (gas.py absorption_coefficient_batch docstring): passing
    one must neither change the result nor trip the pallas pipeline's
    out-of-envelope guard."""
    pack = synthetic_line_pack(num_lines=400, nu_min=0.5, nu_max=260.0,
                               seed=47)
    grid = np.arange(5.0, 200.0, 0.5)
    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    t = np.asarray([203.37, 288.99])
    p = np.asarray([11419.0, 98388.0])
    x = np.asarray([3.0e-6, 6.6e-3])
    plain = gas.absorption_coefficient_batch(t, p, x, grid)
    # Envelope far BELOW the actual conditions: the pallas pipeline would
    # refuse (out-of-envelope guard); the fallback documents it away.
    enveloped = gas.absorption_coefficient_batch(t, p, x, grid,
                                                 envelope=(150.0, 0.01))
    np.testing.assert_array_equal(plain, enveloped)
