"""Pallas TPU kernel correctness (interpret mode on CPU, tiny workload)."""
import numpy as np
import pytest

from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import internal_grid
from pylbl_tpu.models.lines.physics import kernel_inputs, line_profile_params
from pylbl_tpu.ops import lineshape
from pylbl_tpu.ops.lineshape_pallas import (accumulate_tpu, pack_lines_soa,
                                            tile_line_ranges)


def small_workload():
    pack = synthetic_line_pack(num_lines=120, nu_min=30.0, nu_max=280.0,
                               seed=11, band_centers=(150.0,))
    grid = np.arange(50.0, 250.0, 0.2)
    v0, vn, npv, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, 25)
    params = line_profile_params(pack, 288.99, 98388.0, 6.637074e-03,
                                 keep=keep)
    kin = kernel_inputs(params, v0, npv, 25)
    return kin, npv, n


def test_pallas_matches_portable_path():
    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    got = np.asarray(accumulate_tpu(arrays, kin, n, npv, 25, tile=256,
                                    chunk=128, interpret=True))
    want = np.asarray(lineshape.accumulate(arrays, n, npv, 25))
    rel = np.abs(got - want) / np.maximum(np.abs(want),
                                          np.abs(want).max() * 1e-7)
    assert rel.max() < 5e-6


def test_tile_line_ranges_cover_all_contributions():
    kin, npv, n = small_workload()
    s = kin["s_idx"].astype(np.int64)
    e = kin["e_idx"].astype(np.int64)
    tile, chunk = 256, 128
    start, nchunks = tile_line_ranges(s, e, n, tile, chunk)
    num_tiles = -(-n // tile)
    for t in range(num_tiles):
        lo, hi = t * tile, min((t + 1) * tile, n) - 1
        covering = np.where((s <= hi) & (e >= lo))[0]
        if covering.size:
            assert start[t] <= covering.min()
            assert start[t] + nchunks[t] * chunk > covering.max()


def test_soa_padding_masks_out():
    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    soa, num = pack_lines_soa(arrays, 128)
    assert soa.shape[1] % 128 == 0
    assert np.all(soa[5, num:] == -1.0)   # S_IDX dead sentinel.
    assert np.all(soa[6, num:] == -2.0)   # E_IDX dead sentinel.


def test_empty_line_list():
    kin, npv, n = small_workload()
    empty = {k: v[:0] for k, v in
             lineshape.prepare_kernel_arrays(kin, npv, np.float32).items()}
    out = np.asarray(accumulate_tpu(empty, kin, n, npv, 25, interpret=True))
    assert np.array_equal(out, np.zeros(n, dtype=np.float32))
