"""Offline tests of the web-API parsers (record grammar, CSV handling)."""
import io

import numpy as np
import pytest

from pylbl_tpu.webapi import (NoMoleculeError, TipsWebApi, parse_transitions)

TIPS_TABLE = b"""c This is a comment line
c another comment
   H2O
    T / K    Q(161)      Q(181)
      1.0    1.000       2.000
      2.0    1.100       2.200
      3.0    1.250       2.450
   CO2
    T / K    Q(626)
      1.0    5.000
      2.0    5.500
"""


def test_tips_parser_extracts_molecule_block():
    api = TipsWebApi()
    records = api._records(io.BytesIO(TIPS_TABLE), "H2O")
    temperature, data = api._parse_records(records)
    np.testing.assert_allclose(temperature, [1.0, 2.0, 3.0])
    assert data.shape == (2, 3)
    np.testing.assert_allclose(data[0], [1.0, 1.1, 1.25])
    np.testing.assert_allclose(data[1], [2.0, 2.2, 2.45])


def test_tips_parser_second_molecule():
    api = TipsWebApi()
    temperature, data = api._parse_records(
        api._records(io.BytesIO(TIPS_TABLE), "CO2"))
    assert data.shape == (1, 2)
    np.testing.assert_allclose(data[0], [5.0, 5.5])


def test_tips_parser_missing_molecule():
    api = TipsWebApi()
    with pytest.raises(NoMoleculeError):
        list(api._records(io.BytesIO(TIPS_TABLE), "CH4"))


def test_tips_parser_small_blocks():
    """Line reassembly across block boundaries (reference tips_api.py:31-68)."""
    api = TipsWebApi()
    records = api._records(io.BytesIO(TIPS_TABLE), "H2O")
    t1, d1 = api._parse_records(records)
    records = TipsWebApi._ascii_table_records(io.BytesIO(TIPS_TABLE),
                                              block_size=7)
    lines_small = [r for r in records]
    records = TipsWebApi._ascii_table_records(io.BytesIO(TIPS_TABLE),
                                              block_size=512)
    lines_big = [r for r in records]
    assert [x for x in lines_small if x] == [x for x in lines_big if x]


def test_transition_csv_parser():
    csv = "1,1,1,100.5,1e-25,0.07,0.3,0.7,-0.001,50.0\n" \
          "2,1,1,bad,row,x,y,z,w,v\n" \
          "3,1,2,200.25,2e-26,0.06,0.2,0.6,0.002,150.0\n"
    parameters = ["global_iso_id", "molec_id", "local_iso_id", "nu", "sw",
                  "gamma_air", "gamma_self", "n_air", "delta_air", "elower"]
    types = [int, int, int, float, float, float, float, float, float, float]
    out = parse_transitions(csv, parameters, types)
    assert len(out) == 2  # malformed row skipped with a warning.
    assert out[0].nu == 100.5
    assert out[1].local_iso_id == 2


def test_hitran_client_constructs_offline():
    from pylbl_tpu.webapi import HitranWebApi, query_string
    api = HitranWebApi("dummy-key")
    assert api.api_key == "dummy-key"
    assert query_string(iso_ids_list=[1, 2], numin=0.0, head=False) == \
        "iso_ids_list=1,2&numin=0.0&head=False"
