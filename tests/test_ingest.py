"""Full ingestion-flow test with fake web APIs (offline)."""
import numpy as np

from pylbl_tpu.database.db import Database
from pylbl_tpu.webapi import Struct


class FakeHitran:
    """Mimics HitranWebApi for Database.create (no network)."""

    def __init__(self):
        self.molecules = [
            Struct(id=1, stoichiometric_formula="H2O",
                   ordinary_formula="H2O", common_name="water",
                   aliases=[{"alias": "H2O"}, {"alias": "water"}]),
            Struct(id=2, stoichiometric_formula="CO2",
                   ordinary_formula="CO2", common_name="carbon dioxide",
                   aliases=[{"alias": "CO2"}]),
        ]

    def download_molecules(self):
        return self.molecules

    def download_isotopologues(self, molecule):
        return [Struct(id=10 * molecule.id + i, molecule_id=molecule.id,
                       isoid=i, iso_name=f"iso{i}", abundance=0.9,
                       mass=18.0 + i, molecule_alias=molecule.ordinary_formula)
                for i in (1, 2)]

    def download_transitions_csv(self, isotopologues, numin, numax,
                                 parameters):
        rows = []
        base = 100.0 * isotopologues[0].molecule_id
        for i in range(50):
            rows.append(f"{i},{isotopologues[0].molecule_id},"
                        f"{1 + i % 2},{base + i * 3.7:.4f},1.5e-25,"
                        f"0.07,0.3,0.7,-0.001,{i * 10.0:.1f}")
        rows.append("bad,row,with,text,fields,x,x,x,x,x")
        return "\n".join(rows) + "\n", parameters

    def download_transitions(self, isotopologues, numin, numax,
                             parameters=None):
        from pylbl_tpu.webapi import parse_transitions
        csv, parameters = self.download_transitions_csv(
            isotopologues, numin, numax, parameters)
        types = [int, int, int] + [float] * 7
        return parse_transitions(csv, parameters, types)


class FakeTips:
    def download(self, molecule):
        temperature = np.arange(1.0, 501.0)
        data = np.stack([100.0 + temperature, 200.0 + temperature])
        return temperature, data


def test_create_flow_offline(tmp_path):
    db = Database(tmp_path / "ingest.db")
    db.create(FakeHitran(), molecules="all", tips_webapi=FakeTips(),
              cross_section_directory=None)
    assert db.molecules() == ["H2O", "CO2"]
    pack = db.line_pack("water")   # alias lookup.
    assert pack.num_lines == 50    # malformed row dropped.
    assert pack.mass_slots[0] == 19.0
    temperature, q = db.tips("CO2")
    assert q.shape == (2, 500)
    gas = db.gas("H2O")
    assert gas[0] == "H2O"
    # Spectrum end-to-end from the ingested database.
    from pylbl_tpu.models.lines import Gas
    engine = Gas(db, "H2O", dtype=np.float64, backend="xla")
    grid = np.arange(90.0, 160.0, 0.5)
    k = engine.absorption_coefficient(288.99, 98388.0, 6.6e-3, grid)
    assert np.isfinite(k).all() and k.max() > 0
