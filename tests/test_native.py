"""Native runtime library tests (C++ CSV parser + pedestal scan)."""
import numpy as np
import pytest

from pylbl_tpu.runtime import native
from pylbl_tpu.webapi import parse_transitions

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


CSV = ("1,1,1,100.5,1e-25,0.07,0.3,0.7,-0.001,50.0\n"
       "2,1,1,not,a,valid,row,x,y,z\n"
       "3,1,2,200.25,2e-26,0.06,0.2,0.6,0.002,150.0\n"
       "7,1,0,3999.75,4.5e-27,0.05,0.25,0.55,0.0,950.25\n")


def test_csv_parser_matches_python():
    got = native.parse_transitions_csv(CSV)
    parameters = ["global_iso_id", "molec_id", "local_iso_id", "nu", "sw",
                  "gamma_air", "gamma_self", "n_air", "delta_air", "elower"]
    types = [int, int, int] + [float] * 7
    expected = parse_transitions(CSV, parameters, types)
    assert got["nu"].size == len(expected) == 3
    for i, t in enumerate(expected):
        assert got["nu"][i] == t.nu
        assert got["sw"][i] == t.sw
        assert got["local_iso_id"][i] == t.local_iso_id
        assert got["elower"][i] == t.elower


def test_csv_parser_large_roundtrip():
    rng = np.random.default_rng(0)
    n = 5000
    rows = []
    for i in range(n):
        rows.append(f"{i},1,{int(rng.integers(0, 10))},"
                    f"{rng.uniform(1, 4e4):.6f},{rng.uniform(1e-30, 1e-20):.6e},"
                    f"{rng.uniform(0, 0.2):.4f},{rng.uniform(0, 0.8):.4f},"
                    f"{rng.uniform(0, 1):.4f},{rng.uniform(-0.02, 0.02):.5f},"
                    f"{rng.uniform(0, 5000):.4f}")
    text = "\n".join(rows) + "\n"
    got = native.parse_transitions_csv(text)
    assert got["nu"].size == n
    assert got["global_iso_id"][-1] == n - 1


def test_pedestal_scan_native_used():
    """The lines engine's pedestal path goes through the native scan and
    still matches the C oracle (covered by test_lines_parity); here just
    confirm the dispatch produces identical values to the Python loop."""
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.models.lines import Gas, internal_grid
    pack = synthetic_line_pack(num_lines=400, nu_min=30.0, nu_max=420.0,
                               seed=5)
    grid = np.arange(50.0, 400.0, 0.2)
    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    with_native = gas.absorption_coefficient(288.99, 98388.0, 6.6e-3, grid,
                                             remove_pedestal=True)
    native._lib, saved = None, native._lib
    native._build_failed = True
    try:
        without = gas.absorption_coefficient(288.99, 98388.0, 6.6e-3, grid,
                                             remove_pedestal=True)
    finally:
        native._lib = saved
        native._build_failed = False
    # Bucket-window sums associate differently (sequential C vs numpy
    # pairwise); differences are at the 1e-44 absolute level.
    np.testing.assert_allclose(
        with_native, without, rtol=1e-12,
        atol=float(np.abs(without).max()) * 1e-15)
