"""MT-CKD golden parity: the 17 band sums pinned by the reference test-suite
(reference tests/test_mt_ckd.py:15-46), evaluated at the canonical surface
layer against the real coefficient tables."""
import numpy as np
import pytest

from pylbl_tpu.models.mt_ckd import (CarbonDioxideContinuum,
                                     NitrogenContinuum, OxygenContinuum,
                                     OzoneContinuum,
                                     WaterVaporForeignContinuum,
                                     WaterVaporSelfContinuum)

GOLDEN = {
    "CO2": [21.284607102488753],
    "H2OForeign": [131.87162317621952],
    "H2OSelf": [13.482864611247933],
    "N2": [0.7612890022253513, 0.5875825355004741, 0.00414557543788256],
    "O2": [0.24690308716508605, 0.11052072297118236, 0.03200556021322852,
           0.04514938962400228, 0.03897535512343981, 285.7607588975901,
           4419601.794329887],
    "O3": [0.0006562127133778276, 1.7334221226752753, 0.05197265302394795],
}

CONTINUA = {
    "CO2": CarbonDioxideContinuum,
    "H2OForeign": WaterVaporForeignContinuum,
    "H2OSelf": WaterVaporSelfContinuum,
    "N2": NitrogenContinuum,
    "O2": OxygenContinuum,
    "O3": OzoneContinuum,
}


def surface_vmr(atmosphere, molecule_names, index=-1):
    return {key: atmosphere.vmr[value][index]
            for key, value in molecule_names.items()}


@pytest.mark.parametrize("molecule", list(GOLDEN))
def test_band_golden_sums(molecule, atmosphere, molecule_names):
    index = -1
    vmr = surface_vmr(atmosphere, molecule_names, index)
    continuum = CONTINUA[molecule]()
    for band_index, band in enumerate(continuum.bands):
        # The reference goldens pass the surface pressure in Pa straight to
        # the band-level spectra (which nominally takes mb) — reference
        # tests/test_mt_ckd.py:43-46 — so these sums pin the formulas at
        # pressure/P0 ~ 97, not the physical layer.  Replicated verbatim.
        native = band.spectra(atmosphere.t[index], atmosphere.p[index], vmr)
        assert np.sum(native) == pytest.approx(GOLDEN[molecule][band_index])


def test_user_grid_interpolation(atmosphere, molecule_names, spectral_grid):
    """m-1 output on the user grid equals numpy.interp of the native band
    spectra, x100 (reference utils.py:157-174)."""
    index = -1
    vmr = surface_vmr(atmosphere, molecule_names, index)
    continuum = CarbonDioxideContinuum()
    got = continuum.spectra(atmosphere.t[index], atmosphere.p[index], vmr,
                            spectral_grid)
    band = continuum.bands[0]
    native = band.spectra(atmosphere.t[index], atmosphere.p[index] * 0.01,
                          vmr)
    expected = np.interp(spectral_grid, band.grid(), native,
                         left=0.0, right=0.0) * 100.0
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-300)


def test_layer_batched_temperature(atmosphere, molecule_names):
    """Band spectra broadcast over a [B] temperature/pressure batch."""
    vmr = surface_vmr(atmosphere, molecule_names, -1)
    band = CarbonDioxideContinuum().bands[0]
    single = [band.spectra(t, p * 0.01, vmr)
              for t, p in zip(atmosphere.t, atmosphere.p)]
    batched = band.spectra(atmosphere.t, atmosphere.p * 0.01, vmr)
    np.testing.assert_allclose(batched, np.stack(single), rtol=1e-14)


def test_all_continua_batched_vmr_matches_scalar(atmosphere, molecule_names,
                                                 coarse_grid):
    """Every molecule-level continuum evaluates layer-batched (vmr as [B]
    arrays) identically to the per-layer scalar loop."""
    from pylbl_tpu.models.mt_ckd import (CarbonDioxideContinuum,
                                         NitrogenContinuum, OxygenContinuum,
                                         OzoneContinuum,
                                         WaterVaporForeignContinuum,
                                         WaterVaporSelfContinuum)

    vmr_b = {formula: np.asarray(atmosphere.vmr[name])
             for formula, name in molecule_names.items()}
    for cls in (WaterVaporSelfContinuum, WaterVaporForeignContinuum,
                CarbonDioxideContinuum, OzoneContinuum, OxygenContinuum,
                NitrogenContinuum):
        continuum = cls()
        batched = continuum.spectra(atmosphere.t, atmosphere.p, vmr_b,
                                    coarse_grid)
        for i in range(atmosphere.t.size):
            vmr_i = {k: v[i] for k, v in vmr_b.items()}
            single = continuum.spectra(atmosphere.t[i], atmosphere.p[i],
                                       vmr_i, coarse_grid)
            np.testing.assert_allclose(batched[i], single, rtol=1e-13,
                                       err_msg=cls.__name__)


def test_device_continuum_matches_numpy(atmosphere, molecule_names,
                                        coarse_grid):
    """The jitted jnp continuum evaluator reproduces the numpy (parity)
    path on every band (x64 enabled in tests)."""
    from pylbl_tpu.models.mt_ckd import (NitrogenContinuum,
                                         OxygenContinuum,
                                         WaterVaporSelfContinuum)

    vmr_b = {formula: np.asarray(atmosphere.vmr[name])
             for formula, name in molecule_names.items()}
    for cls in (WaterVaporSelfContinuum, OxygenContinuum,
                NitrogenContinuum):
        continuum = cls()
        fn = continuum.device_spectra(coarse_grid)
        got = np.asarray(fn(atmosphere.t, atmosphere.p, vmr_b))
        want = continuum.spectra(atmosphere.t, atmosphere.p, vmr_b,
                                 coarse_grid)
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   atol=np.abs(want).max() * 1e-14,
                                   err_msg=cls.__name__)
