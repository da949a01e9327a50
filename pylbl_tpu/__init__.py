"""pylbl_tpu — a TPU-native line-by-line gas-optics framework.

Re-implements the full capability surface of the reference pyLBL package
(Spectroscopy / Atmosphere / Database / web APIs / lines / MT-CKD continua /
arts-crossfit cross sections) with a JAX/XLA/Pallas compute path designed
for TPU: batched layers, sharded spectral grids, and branchless Voigt
kernels instead of per-line C loops.
"""
from .atmosphere import Atmosphere  # noqa: F401
from .models.lines import Gas, LinePack  # noqa: F401
from .models.tips import TotalPartitionFunction  # noqa: F401
from .utils.xrlite import DataArray, Dataset, open_dataset  # noqa: F401

from .database import Database  # noqa: F401
from .spectroscopy import Spectroscopy  # noqa: F401
from .webapi import HitranWebApi, TipsWebApi  # noqa: F401
from .plugins import continua, cross_sections, models, molecular_lines  # noqa: F401

__version__ = "1.0.0"  # keep in sync with pyproject.toml
