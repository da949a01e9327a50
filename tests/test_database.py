"""Database roundtrip and packing tests (offline, synthetic data)."""
import numpy as np
import pytest

from pylbl_tpu.database.db import (AliasNotFoundError, Database,
                                   CrossSectionNotFoundError)
from pylbl_tpu.database.fixtures import synthetic_line_pack


@pytest.fixture
def db(tmp_path):
    database = Database(tmp_path / "test.db")
    pack = synthetic_line_pack(num_lines=200, seed=5)
    database.ingest_line_pack(pack, aliases=("water", "H2O-16"))
    return database, pack


def test_roundtrip_line_pack(db):
    database, pack = db
    got = database.line_pack("H2O")
    np.testing.assert_array_equal(got.nu, pack.nu)
    np.testing.assert_array_equal(got.sw, pack.sw)
    np.testing.assert_array_equal(got.iso, pack.iso)
    np.testing.assert_array_equal(got.mass_slots, pack.mass_slots)
    np.testing.assert_array_equal(got.q_table, pack.q_table)
    np.testing.assert_array_equal(got.q_temperature, pack.q_temperature)


def test_alias_lookup(db):
    database, pack = db
    got = database.line_pack("water")
    assert got.formula == "water"
    np.testing.assert_array_equal(got.nu, pack.nu)


def test_molecules_listing(db):
    database, _ = db
    assert database.molecules() == ["H2O"]


def test_missing_molecule_raises(db):
    database, _ = db
    with pytest.raises(AliasNotFoundError):
        database.line_pack("XYZ")
    with pytest.raises(CrossSectionNotFoundError):
        database.arts_crossfit("H2O")


def test_gas_query(db):
    database, pack = db
    formula, mass, transitions, tips = database.gas("H2O")
    assert formula == "H2O"
    assert len(transitions) == pack.num_lines
    assert len(mass) == pack.q_table.shape[0]
    q = tips.total_partition_function(279.54, 1)
    assert np.isfinite(q) and q > 0


def test_tips_query(db):
    database, pack = db
    temperature, data = database.tips("H2O")
    np.testing.assert_array_equal(temperature, pack.q_temperature)
    np.testing.assert_array_equal(data, pack.q_table)


def test_arts_crossfit_registration(db, tmp_path):
    database, _ = db
    directory = tmp_path / "coefficients"
    directory.mkdir()
    (directory / "H2O.nc").write_bytes(b"")
    (directory / "CFC11.nc").write_bytes(b"")
    (directory / "README.txt").write_bytes(b"")
    database.ingest_arts_crossfit_directory(str(directory))
    assert database.arts_crossfit("H2O").endswith("H2O.nc")
    # CFC11 existed only as a cross section: auto-added molecule + alias.
    assert database.arts_crossfit("CFC11").endswith("CFC11.nc")
    assert "CFC11" in database.molecules()
