"""Backend plugin registry.

The reference resolves backends through setuptools entry points at import
time (reference pyLBL/plugins.py:7-34, setup.py:45-57).  This framework
uses an explicit in-package registry with the same dictionary surface
(``molecular_lines`` / ``continua`` / ``cross_sections`` keyed by backend
name, unknown names raising KeyError), plus `register_*` hooks and optional
entry-point discovery (group "pylbl_tpu") so third-party backends can still
plug in without this package importing them eagerly.
"""
from re import match

from .models.arts_crossfit import CrossSection
from .models.lines import Gas
from .models import mt_ckd

# Lines backends: key = model name, value = Gas-like class
# (duck type: __init__(database, formula) +
#  absorption_coefficient(T, p, vmr, grid, remove_pedestal, cut_off)).
molecular_lines = {
    "pyLBL": Gas,          # reference-compatible name.
    "pylbl_tpu": Gas,
}

# Continuum backends: key = model name, value = dict of molecule-key ->
# BandedContinuum class ("H2OSelf"/"H2OForeign"/formula, reference
# plugins.py:26-34).
continua = {
    "mt_ckd": {
        "CO2": mt_ckd.CarbonDioxideContinuum,
        "H2OForeign": mt_ckd.WaterVaporForeignContinuum,
        "H2OSelf": mt_ckd.WaterVaporSelfContinuum,
        "N2": mt_ckd.NitrogenContinuum,
        "O2": mt_ckd.OxygenContinuum,
        "O3": mt_ckd.OzoneContinuum,
    },
}

# Cross-section backends: key = model name, value = CrossSection-like class.
cross_sections = {
    "arts_crossfit": CrossSection,
}

# Optional ARTS lines backend (soft dependency, reference setup.py:56).
try:
    from .models.arts_frontend import ARTS_INSTALLED, PyArtsGas
    if ARTS_INSTALLED:
        molecular_lines["arts"] = PyArtsGas
except ImportError:  # pragma: no cover
    pass

models = list({*molecular_lines, *continua, *cross_sections})


def register_lines_backend(name, cls):
    molecular_lines[name] = cls
    _refresh_models()


def register_continua_backend(name, class_map):
    continua[name] = dict(class_map)
    _refresh_models()


def register_cross_sections_backend(name, cls):
    cross_sections[name] = cls
    _refresh_models()


def _refresh_models():
    global models
    models = list({*molecular_lines, *continua, *cross_sections})


def discover_entry_points(group="pylbl_tpu"):
    """Loads third-party backends advertised via importlib entry points.

    Entry-point names follow the reference convention: ``Gas`` for a lines
    backend, ``CrossSection`` for cross sections, ``<Molecule>Continuum``
    for continuum classes (reference plugins.py:12-34); the entry point's
    *value* module path groups them under its distribution name.
    """
    try:
        from importlib.metadata import entry_points
    except ImportError:  # pragma: no cover
        return
    try:
        eps = entry_points(group=group)
    except TypeError:  # pragma: no cover - older API.
        eps = entry_points().get(group, [])
    pending_continua = {}
    for ep in eps:
        backend = ep.value.split(":")[0].split(".")[0]
        if ep.name == "Gas":
            molecular_lines[backend] = ep.load()
        elif ep.name == "CrossSection":
            cross_sections[backend] = ep.load()
        else:
            m = match(r"([A-Za-z0-9]+)Continuum", ep.name)
            if m:
                pending_continua.setdefault(backend, {})[m.group(1)] = \
                    ep.load()
    for backend, class_map in pending_continua.items():
        continua.setdefault(backend, {}).update(class_map)
    _refresh_models()


discover_entry_points()
