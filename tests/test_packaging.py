"""Packaging contract: pyproject metadata, entry-point discovery, and the
console-script surface (reference ships the same via setup.py:1-57 with
plugin entry points at :45-57)."""
import sys
import tomllib
import types
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


@pytest.fixture(scope="module")
def project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_pyproject_metadata(project):
    import pylbl_tpu

    assert project["name"] == "pylbl_tpu"
    assert project["version"] == pylbl_tpu.__version__
    assert "numpy" in project["dependencies"]
    assert any(d.startswith("jax") for d in project["dependencies"])
    assert project["scripts"]["pylbl-tpu"] == "pylbl_tpu.__main__:main"


def test_builtin_entry_points_declared_and_loadable(project):
    """Every advertised backend entry point must resolve to a real class
    (the same classes the in-package registry exposes)."""
    import importlib

    eps = project["entry-points"]["pylbl_tpu"]
    assert {"Gas", "CrossSection", "H2OSelfContinuum"} <= set(eps)
    for name, value in eps.items():
        module, _, attr = value.partition(":")
        obj = getattr(importlib.import_module(module), attr)
        assert isinstance(obj, type), f"{name} -> {value} is not a class"


def test_discover_entry_points_registers_third_party(monkeypatch):
    """A toy third-party distribution advertising Gas/CrossSection/
    <Mol>Continuum entry points must land in the registry dicts under its
    module-root backend name (reference plugins.py:12-34 convention)."""
    from pylbl_tpu import plugins

    class ToyGas:
        pass

    class ToyXsec:
        pass

    class ToyCont:
        pass

    toy_mod = types.ModuleType("toy_backend")
    toy_mod.ToyGas = ToyGas
    toy_mod.ToyXsec = ToyXsec
    toy_mod.ToyCont = ToyCont
    monkeypatch.setitem(sys.modules, "toy_backend", toy_mod)

    class FakeEP:
        def __init__(self, name, value):
            self.name = name
            self.value = value

        def load(self):
            module, _, attr = self.value.partition(":")
            return getattr(sys.modules[module], attr)

    fake = [FakeEP("Gas", "toy_backend:ToyGas"),
            FakeEP("CrossSection", "toy_backend:ToyXsec"),
            FakeEP("CH4Continuum", "toy_backend:ToyCont")]
    import importlib.metadata
    monkeypatch.setattr(importlib.metadata, "entry_points",
                        lambda group=None: fake if group == "pylbl_tpu"
                        else [])
    # Work on copies so the module-level registries stay pristine.
    monkeypatch.setattr(plugins, "molecular_lines",
                        dict(plugins.molecular_lines))
    monkeypatch.setattr(plugins, "cross_sections",
                        dict(plugins.cross_sections))
    monkeypatch.setattr(plugins, "continua",
                        {k: dict(v) for k, v in plugins.continua.items()})
    plugins.discover_entry_points()
    assert plugins.molecular_lines["toy_backend"] is ToyGas
    assert plugins.cross_sections["toy_backend"] is ToyXsec
    assert plugins.continua["toy_backend"]["CH4"] is ToyCont
    assert "toy_backend" in plugins.models


def test_installed_distribution_entry_points():
    """When the package is pip-installed (editable or not), its own entry
    points must be discoverable through importlib.metadata — the path a
    third party's discovery would take."""
    import importlib.metadata

    try:
        importlib.metadata.distribution("pylbl_tpu")
    except importlib.metadata.PackageNotFoundError:
        pytest.skip("pylbl_tpu not pip-installed in this environment")
    eps = importlib.metadata.entry_points(group="pylbl_tpu")
    names = {ep.name for ep in eps}
    assert {"Gas", "CrossSection"} <= names
    gas = next(ep for ep in eps if ep.name == "Gas").load()
    from pylbl_tpu.models.lines import Gas
    assert gas is Gas


def test_native_lib_search_includes_package_dir():
    """The installed layout drops libpylbl_native.so next to the package;
    the loader must look there when the repo csrc/ build is absent."""
    from pylbl_tpu.runtime import native

    assert native.PKG_LIB_PATH.name == "libpylbl_native.so"
    assert native.PKG_LIB_PATH.parent.name == "pylbl_tpu"
