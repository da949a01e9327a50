"""Offline verification of the pyarts bridge translation logic.

pyarts is not installable here, so a scripted stand-in module is injected
and models/arts_frontend.py is reloaded against it.  This pins the
translation semantics of the reference frontend
(reference pyLBL/pyarts_frontend/frontend.py:13-142): iso letter codes,
per-quantum-identity grouping, lineshape model structure (self+air G0/D0),
SplitVP/SFS/no-cutoff band flags, and the propmat workspace flow with the
number-density division."""
import importlib
import sys
import types

import numpy as np
import pytest


class Record(types.SimpleNamespace):
    pass


def make_fake_pyarts():
    convert = types.SimpleNamespace(
        kaycm_per_atm2hz_per_pa=lambda v: ("hzpa", round(float(v), 12)),
        kaycm2freq=lambda v: np.asarray(v, float) * 2.99792458e10,
        kaycm_per_cmsquared2hz_per_msquared=lambda v: ("i0", float(v)),
        kaycm2joule=lambda v: ("e0", float(v)))
    hitran = types.SimpleNamespace(
        ratio=lambda mid, iso: 2.0,
        quantumidentity=lambda mid, iso: f"H2O-{iso}")
    physics = types.SimpleNamespace(
        number_density=lambda p, t: p / (1.380649e-23 * t))

    class ArrayOfAbsorptionLines(list):
        def append(self, x):
            list.append(self, x)

    class Value:
        def __init__(self, data):
            self.value = types.SimpleNamespace(
                data=types.SimpleNamespace(value=np.asarray(data)))

    class Workspace:
        def __init__(self):
            self.calls = []
            self.propmat_clearsky = Value(np.full((1, 8), 3.0))
            self.rtp_nlte = "nlte"
            self.rtp_mag = "mag"
            self.rtp_los = "los"

        def __setattr__(self, name, value):
            object.__setattr__(self, name, value)

        def abs_speciesSet(self, species):
            self.calls.append(("species", tuple(species)))

        def jacobianOff(self):
            self.calls.append(("jacobianOff",))

        def Touch(self, what):
            self.calls.append(("touch", what))

        def propmat_clearsky_agendaAuto(self):
            self.calls.append(("agendaAuto",))
            self.propmat_clearsky_agenda = "agenda"

        def lbl_checkedCalc(self):
            self.calls.append(("lblChecked",))

        def AgendaExecute(self, a):
            self.calls.append(("execute", a))

    arts = types.SimpleNamespace(
        convert=convert, hitran=hitran, physics=physics,
        LineShapeModelParameters=lambda kind, *vals: (kind,) + vals,
        LineShapeSingleSpeciesModel=lambda **kw: Record(**kw),
        AbsorptionSingleLine=lambda **kw: Record(**kw),
        LineShapeModel=lambda models: tuple(models),
        ArrayOfAbsorptionLines=ArrayOfAbsorptionLines,
        AbsorptionLines=lambda **kw: Record(**kw))
    fake = types.ModuleType("pyarts")
    fake.arts = arts
    fake.workspace = types.SimpleNamespace(Workspace=Workspace)
    return fake


@pytest.fixture
def frontend(monkeypatch):
    fake = make_fake_pyarts()
    monkeypatch.setitem(sys.modules, "pyarts", fake)
    mod = importlib.import_module("pylbl_tpu.models.arts_frontend")
    mod = importlib.reload(mod)
    yield mod, fake
    monkeypatch.delitem(sys.modules, "pyarts", raising=False)
    importlib.reload(mod)


def test_iso_letter_codes(frontend):
    mod, _ = frontend
    assert mod._iso_code(11) == "A"
    assert mod._iso_code(12) == "B"
    assert mod._iso_code(1) == "1"
    assert mod._iso_code(10) == "10"


def test_absorption_line_structure(frontend):
    mod, _ = frontend
    qkey, line = mod.absorption_line(1, nu=1000.0, sw=4.0, gamma_air=0.07,
                                     gamma_self=0.3, n_air=0.6,
                                     elower=100.0, delta_air=-0.01,
                                     local_iso_id=11)
    assert qkey == "H2O-A"
    assert line.F0 == pytest.approx(1000.0 * 2.99792458e10)
    assert line.I0 == ("i0", 2.0)          # sw / hitran ratio
    assert line.E0 == ("e0", 100.0)
    self_model, air_model = line.lineshape
    assert self_model.G0 == ("T1", ("hzpa", 0.3), 0.6)
    assert self_model.D0 == ("T0", ("hzpa", -0.01))
    assert air_model.G0 == ("T1", ("hzpa", 0.07), 0.6)


def test_absorption_lines_grouping_and_flags(frontend):
    mod, _ = frontend
    rows = [
        (1000.0, 1e-22, 0.07, 0.3, 0.6, 100.0, -0.01, 1),
        (1001.0, 1e-22, 0.07, 0.3, 0.6, 100.0, -0.01, 1),
        (1002.0, 1e-22, 0.07, 0.3, 0.6, 100.0, -0.01, 2),
    ]
    bands = mod.absorption_lines(1, rows)
    assert len(bands) == 2                 # grouped by quantum identity
    by_key = {b.quantumidentity: b for b in bands}
    assert len(by_key["H2O-1"].lines) == 2
    assert len(by_key["H2O-2"].lines) == 1
    band = by_key["H2O-1"]
    # Reference frontend.py:81-97 band flags.
    assert band.lineshapetype == "SplitVP"
    assert band.normalization == "SFS"
    assert band.cutoff == "None"
    assert band.T0 == 296
    assert band.broadeningspecies == ["H2O", "Bath"]
    assert band.selfbroadening and band.bathbroadening


def test_pyarts_gas_workspace_flow(frontend):
    mod, _ = frontend
    from pylbl_tpu.database.fixtures import synthetic_line_pack

    pack = synthetic_line_pack(num_lines=10, nu_min=1.0, nu_max=50.0,
                               seed=5)
    gas = mod.PyArtsGas(pack_db(pack), "H2O")
    grid = np.linspace(1.0, 50.0, 8)
    k = gas.absorption_coefficient(288.99, 98388.0, 6.6e-3, grid)
    # propmat value / (number density * vmr)
    density = 98388.0 / (1.380649e-23 * 288.99) * 6.6e-3
    np.testing.assert_allclose(k, 3.0 / density)
    names = [c[0] for c in gas.ws.calls]
    assert names[:1] == ["species"]
    assert "agendaAuto" in names and "lblChecked" in names
    assert names[-1] == "execute"


class pack_db:
    def __init__(self, pack):
        self._pack = pack

    def line_pack(self, formula):
        return self._pack
