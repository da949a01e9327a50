"""Unit-level parity of the branchless Voigt against the reference C kernel."""
import numpy as np
import pytest

from pylbl_tpu.ops.voigt import voigt_correction, voigt_full, voigt_lorentz
from pylbl_tpu.utils.constants import RSQRPI, SQRT_LN2

import oracle


pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference sources not present")


def reference_k(wavenumbers, nu, alpha, gamma):
    """K(x, y) extracted from the reference voigt() accumulation
    (voigt.c:188: k += sw * rsqrpi * repwid * K)."""
    sw = 1.0
    k = oracle.voigt(wavenumbers, 0, wavenumbers.size - 1, nu, alpha, gamma,
                     sw)
    repwid = SQRT_LN2 / alpha
    return k / (sw * RSQRPI * repwid)


@pytest.mark.parametrize("gamma", [1e-7, 1e-4, 0.005, 0.08, 0.5, 3.0, 80.0])
@pytest.mark.parametrize("alpha", [5e-4, 0.005, 0.05])
def test_voigt_full_matches_reference(gamma, alpha):
    nu = 1000.0
    # Points spanning every region: dense near center, far into the wings.
    offsets = np.concatenate([
        np.linspace(-30.0, 30.0, 2001),
        np.linspace(-0.05, 0.05, 501),
        np.linspace(-1.0, 1.0, 801),
    ])
    wavenumbers = np.sort(nu + offsets)
    expected = reference_k(wavenumbers, nu, alpha, gamma)
    repwid = SQRT_LN2 / alpha
    x = (wavenumbers - nu) * repwid
    y = repwid * gamma
    got = voigt_full(x, np.full_like(x, y))
    np.testing.assert_allclose(got, expected, rtol=1e-13, atol=1e-300)


@pytest.mark.parametrize("gamma,alpha", [(0.07, 0.004), (1e-5, 0.01),
                                         (2.0, 0.02)])
def test_lorentz_plus_correction_equals_full(gamma, alpha):
    repwid = SQRT_LN2 / alpha
    y = np.full(1, repwid * gamma)
    x = np.linspace(-200.0, 200.0, 40001)
    full = voigt_full(x, y)
    split = voigt_lorentz(x, y) + voigt_correction(x, y)
    # 1-2 ulp slack: (k0 + (inner - k0)) rounds differently than inner.
    np.testing.assert_allclose(split, full, rtol=1e-12,
                               atol=np.max(np.abs(full)) * 1e-15)


def test_correction_zero_outside_core():
    alpha, gamma = 0.004, 0.07
    repwid = SQRT_LN2 / alpha
    y = np.full(1, repwid * gamma)
    from pylbl_tpu.ops.voigt import XLIM0_MAX
    x = np.linspace(XLIM0_MAX + 1e-6, 10 * XLIM0_MAX, 1000)
    assert np.all(voigt_correction(x, y) == 0.0)
    assert np.all(voigt_correction(-x, y) == 0.0)


def test_voigt_float32_relative_accuracy():
    """The f32 evaluation should track f64 to ~1e-5 relative."""
    alpha, gamma = 0.004, 0.07
    repwid = SQRT_LN2 / alpha
    x = np.linspace(-5000.0, 5000.0, 100001)
    y64 = np.full(1, repwid * gamma)
    k64 = voigt_full(x, y64)
    k32 = voigt_full(x.astype(np.float32), y64.astype(np.float32))
    rel = np.abs(k32.astype(np.float64) - k64) / np.abs(k64)
    assert np.max(rel) < 5e-5


def test_correction_class_specializations_match_general():
    """The y-class-gated corrections (used per line inside the Pallas core
    pass) must equal the general correction exactly on their domains."""
    from pylbl_tpu.ops.voigt import (voigt_correction_k1,
                                     voigt_correction_k12,
                                     voigt_correction_k123)
    rng = np.random.default_rng(7)
    x = np.concatenate([np.linspace(-130.0, 130.0, 20001),
                        rng.uniform(-5.0, 5.0, 2000)])
    for y_val in [6.8, 7.3, 8.425, 9.0, 40.0, 70.54, 70.55, 200.0]:
        y = np.full(1, y_val)
        np.testing.assert_array_equal(voigt_correction_k12(x, y),
                                      voigt_correction(x, y))
    for y_val in [2.0, 2.5, 3.7, 4.8, 6.0, 6.799]:
        y = np.full(1, y_val)
        np.testing.assert_array_equal(voigt_correction_k123(x, y),
                                      voigt_correction(x, y))
    # k1 uses the analytically combined single-division form of K1 - K0
    # (an algebraic rearrangement: ~1e-10 f64 rounding difference, and in
    # f32 it *removes* the K1 - K0 cancellation, making it strictly more
    # accurate than the subtractive general form).
    for y_val in [8.425, 9.0, 20.0, 40.0, 70.54, 70.55, 200.0]:
        y = np.full(1, y_val)
        a = voigt_correction_k1(x, y)
        b = voigt_correction(x, y)
        # atol covers the correction's zero crossing, where both forms
        # cancel and the relative measure is meaningless.
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-15)
        np.testing.assert_array_equal(a == 0.0, b == 0.0)
