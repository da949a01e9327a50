"""MT-CKD 3.5 molecular continua (TPU-native port).

Molecule-level continuum classes expose the same duck-typed interface as
the reference backend (reference mt_ckd/utils.py:145-174): ``spectra(T,
p_Pa, vmr, grid) -> m-1`` summed over the molecule's bands, each band
evaluated on its native grid and linearly interpolated with zero fill.
Interpolation weights are precomputed gathers (ops/interp.py) cached per
user grid.
"""
import numpy as np

from .bands import (  # noqa: F401
    CarbonDioxideHartmannContinuum,
    NitrogenCIAFirstOvertoneContinuum,
    NitrogenCIAFundamentalContinuum,
    NitrogenCIAPureRotationContinuum,
    OxygenCIAFundamentalContinuum,
    OxygenCIANIR2Continuum,
    OxygenCIANIR3Continuum,
    OxygenCIANIRContinuum,
    OxygenHerzbergContinuum,
    OxygenUVContinuum,
    OxygenVisibleContinuum,
    OzoneChappuisWulfContinuum,
    OzoneHartleyHugginsContinuum,
    OzoneUVContinuum,
    WaterVaporARMSelfContinuum,
    WaterVaporIASIForeignContinuum,
    radiation_term,
)
from .tables import Table, subgrid_bounds  # noqa: F401
from ...ops.interp import UniformGridInterp
from ...utils.constants import M_TO_CM, PA_TO_MB


class BandedContinuum:
    """All bands of one molecule's continuum (reference utils.py:145-174)."""

    band_classes = ()

    def __init__(self):
        self.bands = [cls() for cls in self.band_classes]
        self._interp_cache = {}

    def _interp(self, band_index, grid):
        key = (band_index, grid[0], grid[-1] if len(grid) else 0.0,
               len(grid))
        interp = self._interp_cache.get(key)
        if interp is None:
            band = self.bands[band_index]
            native = band.grid()
            res = native[1] - native[0]
            interp = UniformGridInterp(native[0], res, native.size, grid)
            self._interp_cache[key] = interp
        return interp

    def spectra(self, temperature, pressure, vmr, grid):
        """Continuum extinction [m-1] on the user grid [cm-1].

        Args:
            temperature: temperature [K], scalar or [B] layer batch.
            pressure: pressure [Pa] (converted to mb internally, reference
                utils.py:172), scalar or [B].
            vmr: dict of mole fractions (must include every gas the bands
                reference, e.g. "H2O" for the dry-air density); values
                scalar or [B].
            grid: user wavenumber grid [cm-1].

        Returns:
            [grid.size] (scalar inputs) or [B, grid.size] extinction.
        """
        grid = np.asarray(grid, dtype=np.float64)
        shape = np.shape(temperature) + (grid.size,)
        total = np.zeros(shape)
        for i, band in enumerate(self.bands):
            native = band.spectra(temperature, pressure * PA_TO_MB, vmr)
            total += self._interp(i, grid)(native) * M_TO_CM
        return total

    def device_spectra(self, grid):
        """Builds a jitted on-device evaluator for this continuum.

        All band formulas trace through jnp (bands.py is xp-generic) and
        the grid interpolation is two gathers + fma, so the whole layer
        batch evaluates on the accelerator with no host round trip
        (the reference evaluates per layer in numpy,
        mt_ckd/utils.py:157-174).

        Returns:
            fn(temperature[B], pressure_Pa[B], vmr dict of [B])
            -> jnp [B, grid.size] extinction [m-1].
        """
        import jax
        import jax.numpy as jnp

        grid = np.asarray(grid, dtype=np.float64)
        interps = [self._interp(i, grid) for i in range(len(self.bands))]

        @jax.jit
        def fn(temperature, pressure, vmr):
            total = jnp.zeros(temperature.shape + (grid.size,))
            for band, interp in zip(self.bands, interps):
                native = band.spectra(temperature, pressure * PA_TO_MB,
                                      vmr, xp=jnp)
                total = total + interp(native) * M_TO_CM
            return total

        return fn


class WaterVaporSelfContinuum(BandedContinuum):
    band_classes = (WaterVaporARMSelfContinuum,)


class WaterVaporForeignContinuum(BandedContinuum):
    band_classes = (WaterVaporIASIForeignContinuum,)


class CarbonDioxideContinuum(BandedContinuum):
    band_classes = (CarbonDioxideHartmannContinuum,)


class OzoneContinuum(BandedContinuum):
    band_classes = (OzoneChappuisWulfContinuum,
                    OzoneHartleyHugginsContinuum,
                    OzoneUVContinuum)


class OxygenContinuum(BandedContinuum):
    band_classes = (OxygenCIAFundamentalContinuum,
                    OxygenCIANIRContinuum,
                    OxygenCIANIR2Continuum,
                    OxygenCIANIR3Continuum,
                    OxygenVisibleContinuum,
                    OxygenHerzbergContinuum,
                    OxygenUVContinuum)


class NitrogenContinuum(BandedContinuum):
    band_classes = (NitrogenCIAPureRotationContinuum,
                    NitrogenCIAFundamentalContinuum,
                    NitrogenCIAFirstOvertoneContinuum)
