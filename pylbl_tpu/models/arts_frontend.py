"""Optional ARTS lines backend (pyarts bridge).

Equivalent of the reference's pyarts frontend (reference
pyLBL/pyarts_frontend/frontend.py:13-142): translates database transition
rows into ARTS absorption-line structures and evaluates a propagation-
matrix workspace agenda.  Soft dependency: everything degrades to a clear
error when pyarts is not installed, and the backend is only registered in
the plugin dicts when it is (see plugins.register_arts_backend).

Transition rows come from ``Database.gas(formula)[2]`` as tuples of
(nu, sw, gamma_air, gamma_self, n_air, elower, delta_air, local_iso_id).
"""
from logging import getLogger

logger = getLogger("pylbl_tpu.arts")

try:
    import pyarts
    ARTS_INSTALLED = True
except ImportError:  # pragma: no cover - optional dependency.
    pyarts = None
    ARTS_INSTALLED = False
    logger.info("pyarts is not installed; the 'arts' lines backend is "
                "unavailable.")


def _iso_code(local_iso_id):
    """HITRAN local isotopologue id -> ARTS code (10 -> '0' handled by the
    caller's data; 11/12 use letter codes, reference frontend.py:23-28)."""
    if local_iso_id == 11:
        return "A"
    if local_iso_id == 12:
        return "B"
    return str(local_iso_id)


def absorption_line(molecule_id, nu, sw, gamma_air, gamma_self, n_air,
                    elower, delta_air, local_iso_id):
    """One transition -> (QuantumIdentifier, AbsorptionSingleLine)."""
    iso = _iso_code(local_iso_id)
    convert = pyarts.arts.convert
    ratio = pyarts.arts.hitran.ratio(molecule_id, iso)
    qkey = pyarts.arts.hitran.quantumidentity(molecule_id, iso)
    self_model = pyarts.arts.LineShapeSingleSpeciesModel(
        G0=pyarts.arts.LineShapeModelParameters(
            "T1", convert.kaycm_per_atm2hz_per_pa(gamma_self), n_air),
        D0=pyarts.arts.LineShapeModelParameters(
            "T0", convert.kaycm_per_atm2hz_per_pa(delta_air)))
    air_model = pyarts.arts.LineShapeSingleSpeciesModel(
        G0=pyarts.arts.LineShapeModelParameters(
            "T1", convert.kaycm_per_atm2hz_per_pa(gamma_air), n_air),
        D0=pyarts.arts.LineShapeModelParameters(
            "T0", convert.kaycm_per_atm2hz_per_pa(delta_air)))
    line = pyarts.arts.AbsorptionSingleLine(
        F0=convert.kaycm2freq(nu),
        I0=convert.kaycm_per_cmsquared2hz_per_msquared(sw / ratio),
        E0=convert.kaycm2joule(elower),
        lineshape=pyarts.arts.LineShapeModel([self_model, air_model]))
    return qkey, line


def absorption_lines(molecule_id, transitions):
    """Transition rows -> ArrayOfAbsorptionLines (SplitVP lineshape, SFS
    normalization, no cutoff — reference frontend.py:81-97)."""
    grouped = {}
    for nu, sw, g_air, g_self, n_air, elower, d_air, iso in transitions:
        qkey, line = absorption_line(molecule_id, nu, sw, g_air, g_self,
                                     n_air, elower, d_air, iso)
        grouped.setdefault(str(qkey), []).append(line)
    out = pyarts.arts.ArrayOfAbsorptionLines()
    for key, lines in grouped.items():
        out.append(pyarts.arts.AbsorptionLines(
            selfbroadening=True, bathbroadening=True, cutoff="None",
            mirroring="None", population="LTE", normalization="SFS",
            lineshapetype="SplitVP", quantumidentity=key,
            broadeningspecies=[key.split("-")[0], "Bath"], T0=296,
            lines=lines))
    return out


class PyArtsGas:
    """ARTS-backed lines engine (same duck type as models.lines.Gas)."""

    def __init__(self, lines_database, formula):
        if not ARTS_INSTALLED:
            raise ValueError("pyarts is not installed.")
        pack = lines_database.line_pack(formula)
        rows = list(zip(pack.nu, pack.sw, pack.gamma_air, pack.gamma_self,
                        pack.n_air, pack.elower, pack.delta_air, pack.iso))
        self.ws = pyarts.workspace.Workspace()
        self.ws.abs_speciesSet(species=[formula])
        self.ws.abs_lines_per_species = [absorption_lines(1, rows)]
        self.ws.jacobianOff()
        self.ws.Touch(self.ws.rtp_nlte)
        self.ws.Touch(self.ws.rtp_mag)
        self.ws.Touch(self.ws.rtp_los)
        self.ws.propmat_clearsky_agendaAuto()
        self.ws.lbl_checkedCalc()
        self.ws.stokes_dim = 1

    def absorption_coefficient(self, temperature, pressure,
                               volume_mixing_ratio, grid,
                               remove_pedestal=False, cut_off=25):
        """Absorption cross sections [m2] via the ARTS propmat agenda
        (reference frontend.py:116-142)."""
        self.ws.f_grid = pyarts.arts.convert.kaycm2freq(grid)
        self.ws.rtp_pressure = pressure
        self.ws.rtp_temperature = temperature
        self.ws.rtp_vmr = [volume_mixing_ratio]
        self.ws.AgendaExecute(a=self.ws.propmat_clearsky_agenda)
        density = pyarts.arts.physics.number_density(
            pressure, temperature) * volume_mixing_ratio
        return self.ws.propmat_clearsky.value.data.value.flatten() / density
