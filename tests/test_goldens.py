"""Pinned absolute golden anchors on the frozen committed fixtures.

The reference pins golden scalars against a specific HITRAN snapshot
(reference tests/test_gas_optics.py:17-19, test_spectroscopy.py:21-22);
that snapshot is not vendorable offline, so this repo pins the same
*shape* of anchors on frozen LinePacks committed under tests/data/
(decoupled from the fixture generator).  The H2O values were computed
with the compiled in-place oracle of the unmodified reference C code, so
they anchor reference semantics, not merely self-consistency; the 8-gas
end-to-end totals anchor the full Spectroscopy stack (lines + MT-CKD
continua from the real packaged tables) against regression.

When the real pyLBL-2-7-23.db snapshot is available, set
PYLBL_TPU_REFERENCE_DB to its path and the final test reproduces the
reference's own published golden numbers on real HITRAN data.
"""
import os
from pathlib import Path

import numpy as np
import pytest

from pylbl_tpu import Dataset, Spectroscopy
from pylbl_tpu.database.db import Database
from pylbl_tpu.models.lines import Gas, LinePack, internal_grid

DATA = Path(__file__).parent / "data"
SURFACE = dict(temperature=288.99, pressure=98388.0)
VMR = {"H2O": 6.637074e-03, "CO2": 3.9754e-04, "O3": 6.7328e-08,
       "N2O": 3.2699e-07, "CO": 1.4385e-07, "CH4": 1.8346e-06,
       "O2": 0.209, "N2": 0.781}
STANDARD_NAMES = {
    "H2O": "mole_fraction_of_water_vapor_in_air",
    "CO2": "mole_fraction_of_carbon_dioxide_in_air",
    "O3": "mole_fraction_of_ozone_in_air",
    "N2O": "mole_fraction_of_nitrous_oxide_in_air",
    "CO": "mole_fraction_of_carbon_monoxide_in_air",
    "CH4": "mole_fraction_of_methane_in_air",
    "O2": "mole_fraction_of_oxygen_in_air",
    "N2": "mole_fraction_of_nitrogen_in_air",
}

# Oracle-computed anchors on tests/data/h2o_frozen.lpk.npz, surface layer,
# grid 1-3250 @0.1 cm-1 (the reference test_gas_optics.py:6-19 geometry).
H2O_LOG_MAX = -52.29384204610783
H2O_LOG_SUM_DV = -47.584943918810545
H2O_LOG_MAX_PEDESTAL = -52.29394886463197
H2O_LOG_SUM_DV_PEDESTAL = -47.586756746157604

# Engine-computed end-to-end anchors (8 gases, lines + MT-CKD continua,
# grid 1-3000 @1.0; analog of reference test_spectroscopy.py:15-25).
TOTAL_MAX = 26.927475162159258
TOTAL_LOG_SUM = 7.365904843742843


def frozen_gas(name):
    return LinePack.load(DATA / f"{name.lower()}_frozen.lpk.npz")


@pytest.mark.parametrize("remove_pedestal,log_max,log_sum", [
    (False, H2O_LOG_MAX, H2O_LOG_SUM_DV),
    (True, H2O_LOG_MAX_PEDESTAL, H2O_LOG_SUM_DV_PEDESTAL)])
def test_h2o_golden_scalars(remove_pedestal, log_max, log_sum):
    grid = np.arange(1.0, 3250.0, 0.1)
    gas = Gas(frozen_gas("H2O"), "H2O", dtype=np.float64, backend="xla")
    k = gas.absorption_coefficient(
        SURFACE["temperature"], SURFACE["pressure"], VMR["H2O"], grid,
        remove_pedestal=remove_pedestal)[:grid.size]
    assert np.log(k.max()) == pytest.approx(log_max, rel=1e-6)
    assert np.log(np.sum(k * 0.1)) == pytest.approx(log_sum, rel=1e-6)


def _frozen_atmosphere():
    data_vars = {
        "p": (["layer"], np.asarray([SURFACE["pressure"]]),
              {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], np.asarray([SURFACE["temperature"]]),
              {"standard_name": "air_temperature", "units": "K"}),
    }
    for name, std in STANDARD_NAMES.items():
        data_vars[name.lower()] = (
            ["layer"], np.asarray([VMR[name]]),
            {"standard_name": std, "units": "mol mol-1"})
    return Dataset(data_vars=data_vars)


def test_total_absorption_golden(tmp_path):
    db = Database(tmp_path / "frozen.db")
    for name in STANDARD_NAMES:
        db.ingest_line_pack(frozen_gas(name))
    grid = np.arange(1.0, 3000.0, 1.0)
    s = Spectroscopy(_frozen_atmosphere(), grid, db)
    out = s.compute_absorption(output_format=None)
    a = out["absorption"].data
    assert float(a.max()) == pytest.approx(TOTAL_MAX, rel=1e-6)
    assert float(np.log(a.sum())) == pytest.approx(TOTAL_LOG_SUM, rel=1e-6)


def test_h2o_frozen_fixture_matches_oracle():
    """The committed fixture anchors reference C semantics directly."""
    import oracle

    if not oracle.available():
        pytest.skip("oracle unavailable")
    pack = frozen_gas("H2O")
    grid = np.arange(1.0, 3250.0, 0.1)
    v0, vn, npv, _ = internal_grid(grid)
    ref = oracle.absorption(pack, SURFACE["temperature"],
                            SURFACE["pressure"], VMR["H2O"], v0, vn, npv,
                            remove_pedestal=False)[:grid.size]
    assert np.log(ref.max()) == pytest.approx(H2O_LOG_MAX, rel=1e-12)
    assert np.log(np.sum(ref * 0.1)) == pytest.approx(H2O_LOG_SUM_DV,
                                                      rel=1e-12)


@pytest.mark.skipif("PYLBL_TPU_REFERENCE_DB" not in os.environ,
                    reason="real HITRAN snapshot DB not available offline")
def test_real_hitran_snapshot_goldens():
    """Reproduces the reference's published golden anchors on the real
    pyLBL-2-7-23.db snapshot (reference tests/test_gas_optics.py:17-19)."""
    db = Database(os.environ["PYLBL_TPU_REFERENCE_DB"])
    grid = np.arange(1.0, 3250.0, 0.1)
    gas = Gas(db, "H2O", dtype=np.float64, backend="xla")
    k = gas.absorption_coefficient(
        SURFACE["temperature"], SURFACE["pressure"], VMR["H2O"],
        grid)[:grid.size]
    assert np.log(k.max()) == pytest.approx(-48.159224953962244, rel=1e-6)
    assert np.log(np.sum(k * 0.1)) == pytest.approx(-46.496121930910135,
                                                    rel=1e-6)
