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


def test_build_core_groups_covers_every_instance():
    """Every (line, row) the core window touches must land in exactly one
    group slot of the right tile/row, in nu order within its row."""
    from pylbl_tpu.ops.lineshape_pallas import build_core_groups

    rng = np.random.default_rng(3)
    n_lines, num_points, tile, chunk = 500, 5000, 256, 32
    row_w = tile // 8
    center = np.sort(rng.integers(-50, num_points + 50, n_lines))
    half = rng.integers(0, 3 * row_w, n_lines)   # some spanning >2 rows
    cs, ce = center - half, center + half
    inst_line, start, nchunks = build_core_groups(cs, ce, num_points, tile,
                                                  chunk)
    seen = {}
    for r in range(8):
        for g in range(inst_line.shape[1]):
            line = inst_line[r, g]
            if line >= 0:
                t = np.searchsorted(start, g, side="right") - 1
                key = (int(line), t * 8 + r)
                assert key not in seen, "duplicate instance"
                seen[key] = True
    for i in range(n_lines):
        lo = max(cs[i], 0)
        hi = min(ce[i], num_points - 1)
        if ce[i] < cs[i] or hi < 0 or lo >= num_points:
            continue
        for row in range(lo // row_w, hi // row_w + 1):
            assert (i, row) in seen, f"missing instance line={i} row={row}"
    assert len(seen) == sum(1 for _ in seen)
    # Chunk alignment of per-tile group ranges.
    assert np.all(start % chunk == 0)


def test_gather_group_params_dead_slots():
    from pylbl_tpu.ops.lineshape_pallas import gather_group_params

    arrays = {
        "c_int": np.array([3, 7], np.int32),
        "c_frac": np.array([0.25, -0.5], np.float32),
        "scaled_repwid": np.array([2.0, 3.0], np.float32),
        "y": np.array([0.5, 4.0], np.float32),
        "prefactor": np.array([1.5, 2.5], np.float32),
        "s_idx": np.array([0, 10], np.int32),
        "e_idx": np.array([5, 20], np.int32),
    }
    inst = np.array([[0, -1], [1, 1], [-1, 0], [0, 1],
                     [-1, -1], [1, 0], [0, -1], [1, 1]], np.int64).T
    inst = np.ascontiguousarray(inst.reshape(8, 2))
    groups = gather_group_params(arrays, inst)
    assert groups.shape == (64, 2)
    dead = inst < 0
    # Dead slots: window [-1, -2] so every point masks off.
    s_rows = groups[5 * 8:6 * 8]
    e_rows = groups[6 * 8:7 * 8]
    assert np.all(s_rows[dead] == -1.0) and np.all(e_rows[dead] == -2.0)
    live = ~dead
    c_rows = groups[0:8]
    assert np.all(c_rows[live] == arrays["c_int"][inst[live]])


def test_build_core_segments_covers_every_instance():
    """Every (line, 32-point segment) the core window touches must land in
    exactly one lane of that segment's stream, inside the right tile."""
    from pylbl_tpu.ops.lineshape_pallas import SEG, build_core_segments

    rng = np.random.default_rng(5)
    n_lines, num_points, tile, chunk = 400, 5000, 256, 128
    center = np.sort(rng.integers(-40, num_points + 40, n_lines))
    half = rng.integers(0, 2 * SEG, n_lines)
    cs, ce = center - half, center + half
    inst_line, seg0, t_start, t_chunks, c_slot = build_core_segments(
        cs, ce, num_points, tile=tile, chunk=chunk)
    assert inst_line.size % chunk == 0
    assert c_slot.size >= inst_line.size // chunk
    seen = {}
    for i in range(inst_line.size):
        line = inst_line[i]
        if line < 0:
            continue
        key = (int(line), int(seg0[i]) // SEG)
        assert key not in seen, "duplicate instance"
        seen[key] = True
        # The lane's chunk must be inside its segment's tile range and
        # carry the right slot id.
        k = i // chunk
        t = int(seg0[i]) // tile
        assert t_start[t] <= k < t_start[t] + t_chunks[t]
        assert c_slot[k] == (int(seg0[i]) % tile) // SEG
    for i in range(n_lines):
        lo = max(cs[i], 0)
        hi = min(ce[i], num_points - 1)
        if ce[i] < cs[i] or hi < 0 or lo >= num_points:
            continue
        for s in range(lo // SEG, hi // SEG + 1):
            assert (i, s) in seen, f"missing instance line={i} seg={s}"


def test_seg_pass_matches_scalar_core():
    """The segment-32 core pass must match the scalar core pass per point
    up to addition order."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    soa, _ = pack_lines_soa(arrays, chunk)
    s = arrays["s_idx"].astype(np.int64)
    e = arrays["e_idx"].astype(np.int64)
    from pylbl_tpu.ops.lineshape import core_halfwidth
    core_w = core_halfwidth({"y": kin["y"], "repwid": kin["repwid"]},
                            npv, 25)
    center = np.rint(arrays["c_int"]).astype(np.int64)
    c_start, c_n = tile_line_ranges(np.maximum(center - core_w, s),
                                    np.minimum(center + core_w, e),
                                    n, tile, chunk)
    scalar = np.asarray(lp._pallas_pass(
        jax.device_put(soa), c_start, c_n, int(n), tile, chunk, "core",
        interpret=True))
    cs, ce = lp.core_instance_windows(arrays, kin, n, npv, 25)
    inst_line, seg0, t_start, t_chunks, c_slot = lp.build_core_segments(
        cs, ce, n, tile=tile, chunk=chunk, sort_key=arrays["y"])
    params = lp.gather_segment_params(arrays, inst_line, seg0)
    got = np.asarray(lp._pallas_seg_pass(
        jax.device_put(params), t_start, t_chunks, c_slot, int(n), tile,
        chunk, interpret=True))
    scale = np.abs(scalar).max()
    np.testing.assert_allclose(got, scalar, atol=scale * 1e-6)


def test_seg_pass_batched_matches_per_layer():
    """Layer-batched segment pass == per-layer segment pass."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    pack = synthetic_line_pack(num_lines=90, nu_min=30.0, nu_max=280.0,
                               seed=7, band_centers=(150.0,))
    grid = np.arange(50.0, 250.0, 0.2)
    v0, vn, npv, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, 25)
    conds = [(250.0, 80000.0, 0.004), (288.99, 98388.0, 6.637074e-03)]
    kins, arrs = [], []
    for t, p, x in conds:
        params = line_profile_params(pack, t, p, x, keep=keep)
        kin = kernel_inputs(params, v0, npv, 25)
        kins.append(kin)
        arrs.append(lineshape.prepare_kernel_arrays(kin, npv, np.float32))
    tile, chunk = 256, 128
    batched = {k: np.stack([a[k] for a in arrs]) for k in arrs[0]}
    # Shared union windows across layers (mirrors accumulate_tpu_batched).
    s_idx = batched["s_idx"].astype(np.int64)
    e_idx = batched["e_idx"].astype(np.int64)
    center = np.rint(batched["c_int"]).astype(np.int64)
    from pylbl_tpu.ops.lineshape import core_halfwidths
    core_w = core_halfwidths(
        np.stack([k["repwid"] for k in kins]).min(axis=0), npv, 25)
    cs = np.maximum(center - core_w, s_idx).min(axis=0)
    ce = np.minimum(center + core_w, e_idx).max(axis=0)
    all_lorentz = (batched["y"].astype(np.float32) >= 70.55).all(axis=0)
    ce = np.where(all_lorentz, cs - 1, ce)
    inst_line, seg0, t_start, t_chunks, c_slot = lp.build_core_segments(
        cs, ce, n, tile=tile, chunk=chunk,
        sort_key=np.asarray(batched["y"]).min(axis=0))
    params_b = lp.gather_segment_params(batched, inst_line, seg0)
    got = np.asarray(lp._pallas_seg_pass(
        jax.device_put(params_b), t_start, t_chunks, c_slot, int(n), tile,
        chunk, interpret=True))
    for b in range(len(conds)):
        params_1 = lp.gather_segment_params(arrs[b], inst_line, seg0)
        want = np.asarray(lp._pallas_seg_pass(
            jax.device_put(params_1), t_start, t_chunks, c_slot, int(n),
            tile, chunk, interpret=True))
        np.testing.assert_array_equal(got[b], want)


def test_rows_pass_matches_scalar_core(tmp_path):
    """The rows-formulation core pass must match the scalar core pass
    bit-for-bit per point up to addition order (compare at f64-ish tol)."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    soa, _ = pack_lines_soa(arrays, chunk)
    s = arrays["s_idx"].astype(np.int64)
    e = arrays["e_idx"].astype(np.int64)
    from pylbl_tpu.ops.lineshape import core_halfwidth
    core_w = core_halfwidth({"y": kin["y"], "repwid": kin["repwid"]},
                            npv, 25)
    center = np.rint(arrays["c_int"]).astype(np.int64)
    c_start, c_n = tile_line_ranges(np.maximum(center - core_w, s),
                                    np.minimum(center + core_w, e),
                                    n, tile, chunk)
    scalar = np.asarray(lp._pallas_pass(
        jax.device_put(soa), c_start, c_n, int(n), tile, chunk, "core",
        interpret=True))
    cs, ce = lp.core_instance_windows(arrays, kin, n, npv, 25)
    inst_line, g_start, g_n = lp.build_core_groups(cs, ce, n, tile, chunk)
    groups = lp.gather_group_params(arrays, inst_line)
    rows = np.asarray(lp._pallas_rows_pass(
        jax.device_put(groups), g_start, g_n, int(n), tile, chunk,
        interpret=True))
    scale = np.abs(scalar).max()
    np.testing.assert_allclose(rows, scalar, atol=scale * 1e-6)


def test_seg_wings_matches_tile_wings():
    """The segment-32 Lorentzian wings pass must match the tile-splat
    wings pass per point up to addition order (the per-point math is
    bit-identical; only accumulation order differs)."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    soa, _ = pack_lines_soa(arrays, chunk)
    s = arrays["s_idx"].astype(np.int64)
    e = arrays["e_idx"].astype(np.int64)
    w_start, w_n = tile_line_ranges(s, e, n, tile, chunk)
    tile_wings = np.asarray(lp._pallas_pass(
        jax.device_put(soa), w_start, w_n, int(n), tile, chunk, "wings",
        interpret=True))
    wp = lp.CorePlan(s, e, int(n), tile, mode="seg", kind="wings",
                     chunk=chunk)
    idx = np.maximum(wp.inst_line, 0)
    ka_inst = {k: arrays[k][idx]
               for k in ("c_int", "c_frac", "scaled_repwid", "y",
                         "prefactor", "s_idx", "e_idx")}
    params = wp.wings_params(ka_inst, xp=np)
    got = np.asarray(wp.seg_pass(jax.device_put(params), interpret=True))
    scale = np.abs(tile_wings).max()
    np.testing.assert_allclose(got, tile_wings, atol=scale * 1e-6)


def test_device_plan_wings_modes_agree():
    """make_device_plan with seg wings == forced tile wings."""
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    plan_seg = lp.make_device_plan(arrays, kin, n, npv, 25, tile=256,
                                   chunk=128, interpret=True,
                                   wings_mode="seg")
    plan_tile = lp.make_device_plan(arrays, kin, n, npv, 25, tile=256,
                                    chunk=128, interpret=True,
                                    wings_mode="tile")
    assert plan_seg.wings is not None and plan_tile.wings is None
    a, b = np.asarray(plan_seg()), np.asarray(plan_tile())
    np.testing.assert_allclose(a, b, atol=np.abs(b).max() * 1e-6)


def test_strided_wings_matches_tile_wings():
    """The overlapped strided-tile wings pass (each line evaluated in its
    single assigned tile, ownership-checked via the SoA _PAD row) must
    match the plain tile splat per point up to addition order."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 1024, 128
    soa, num = pack_lines_soa(arrays, chunk)
    s = arrays["s_idx"].astype(np.int64)
    e = arrays["e_idx"].astype(np.int64)
    w_start, w_n = tile_line_ranges(s, e, n, tile, chunk)
    want = np.asarray(lp._pallas_pass(
        jax.device_put(soa), w_start, w_n, int(n), tile, chunk, "wings",
        interpret=True))

    stride = lp.pick_wings_stride(tile, int((e - s).max()) + 1)
    assert stride in (256, 512)
    assign = np.clip(s, 0, None) // stride
    soa2 = soa.copy()
    soa2[lp._PAD, :num] = assign.astype(np.float32)
    soa2[lp._PAD, num:] = -1.0
    # chunk=128 explicitly: the tiny pack is padded to 128 lines, below
    # the production STRIDED_CHUNK.
    st, nc = lp.strided_line_ranges(assign, (n - 1) // stride + 1,
                                    chunk=chunk)
    got = np.asarray(lp._pallas_pass_strided(
        jax.device_put(soa2), st, nc, int(n), tile, stride, chunk=chunk,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 1e-6)

    # Batched variant (shared CSR) == per-layer loop.
    soa_b = np.stack([soa2, soa2 * 1.0])
    soa_b[1, lp.PREF] *= 0.5
    got_b = np.asarray(lp._pallas_pass_strided(
        jax.device_put(soa_b), st, nc, int(n), tile, stride, chunk=chunk,
        interpret=True))
    np.testing.assert_allclose(got_b[0], got, rtol=0, atol=0)
    np.testing.assert_allclose(got_b[1], got * 0.5,
                               atol=np.abs(want).max() * 1e-6)


def test_seg_pass_width16_matches_width32():
    """Core segment pass with 16-point segments == 32-point segments."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    cs, ce = lp.core_instance_windows(arrays, kin, n, npv, 25)
    outs = []
    for seg in (32, 16):
        plan = lp.CorePlan(cs, ce, int(n), tile, sort_key=arrays["y"],
                           mode="seg", chunk=chunk, seg=seg)
        params = plan.gather(arrays)
        outs.append(np.asarray(plan.seg_pass(jax.device_put(params),
                                             interpret=True)))
    scale = np.abs(outs[0]).max()
    np.testing.assert_allclose(outs[1], outs[0], atol=scale * 1e-6)


def test_padded_strided_layout_invariants():
    """perm/CSR invariants: every line appears exactly once, each tile's
    lines land in its own chunk-aligned private range, dead slots are -1,
    and no chunk is referenced by two tiles."""
    from pylbl_tpu.ops.lineshape_pallas import padded_strided_layout

    rng = np.random.default_rng(5)
    num_tiles = 9
    chunk = 8
    # Near-sorted assignment with empty and dense tiles, like real packs.
    assign = np.sort(rng.integers(0, num_tiles, size=133))
    assign[40:60] = 3                        # dense tile
    assign = np.sort(assign)
    perm, w_start, w_n = padded_strided_layout(assign, num_tiles,
                                               chunk=chunk)
    assert perm.size % chunk == 0
    live = perm[perm >= 0]
    assert np.array_equal(np.sort(live), np.arange(assign.size))
    cnt = np.bincount(assign, minlength=num_tiles)
    assert np.array_equal(w_n, -(-cnt // chunk))
    assert np.all(w_start % chunk == 0)
    ends = w_start + w_n * chunk
    for t in range(num_tiles):
        sl = perm[w_start[t]:ends[t]]
        owners = sl[sl >= 0]
        # Every live slot in tile t's range belongs to tile t, and all of
        # tile t's lines are inside its range.
        assert np.all(assign[owners] == t)
        assert owners.size == cnt[t]
    # Ranges are disjoint and ordered (no chunk fetched by two tiles).
    assert np.all(ends[:-1] <= w_start[1:] + (w_n[1:] == 0) * perm.size)


def test_padded_strided_layout_empty():
    from pylbl_tpu.ops.lineshape_pallas import padded_strided_layout

    perm, w_start, w_n = padded_strided_layout(
        np.zeros(0, np.int64), 4, chunk=16)
    assert np.all(perm == -1) and np.all(w_n == 0)


def test_padded_strided_layout_tail_invariants():
    """Two-class layout: every line appears exactly once, each tile's
    lines fill n//chunk full chunks plus ceil(rem/tail) tail chunks,
    padding is bounded by tail-1 per tile, and the tail region follows
    the chunk-aligned main region."""
    from pylbl_tpu.ops.lineshape_pallas import padded_strided_layout_tail

    rng = np.random.default_rng(7)
    num_tiles = 9
    chunk, tail = 8, 2
    assign = np.sort(rng.integers(0, num_tiles, size=133))
    assign[40:60] = 3
    assign = np.sort(assign)
    perm, w_start, w_n, t_start, t_n = padded_strided_layout_tail(
        assign, num_tiles, chunk=chunk, tail=tail)
    live = perm[perm >= 0]
    assert np.array_equal(np.sort(live), np.arange(assign.size))
    cnt = np.bincount(assign, minlength=num_tiles)
    assert np.array_equal(w_n, cnt // chunk)
    rem = cnt - w_n * chunk
    assert np.array_equal(t_n, -(-rem // tail))
    # Padding only in tail chunks, at most tail-1 dead slots per tile.
    total_slots = int(w_n.sum()) * chunk + int(t_n.sum()) * tail
    assert total_slots - assign.size <= num_tiles * (tail - 1)
    main_total = int(w_n.sum()) * chunk
    assert np.all(t_start >= main_total)
    assert np.all(w_start % chunk == 0)
    assert np.all((t_start - main_total) % tail == 0)
    for t in range(num_tiles):
        main = perm[w_start[t]:w_start[t] + w_n[t] * chunk]
        tl = perm[t_start[t]:t_start[t] + t_n[t] * tail]
        owners = np.concatenate([main[main >= 0], tl[tl >= 0]])
        assert np.all(assign[owners] == t)
        assert owners.size == cnt[t]
        assert np.all(main >= 0)  # main chunks are always full


def test_strided_tail_pass_matches_single_class():
    """The two-class tail kernel must reproduce the single-class strided
    pass bit-for-tolerance on the same line set (interpret mode)."""
    import jax.numpy as jnp
    from pylbl_tpu.ops import lineshape_pallas as lp

    rng = np.random.default_rng(11)
    n = 2048
    tile, stride = 512, 256
    num_lines = 700           # partial chunks on several tiles
    s = np.sort(rng.integers(0, n - 300, size=num_lines))
    e = s + rng.integers(50, 280, size=num_lines)
    lay1 = lp.build_strided_layout(s, stride, n, chunk=256, e_wide=e,
                                   tile=tile)
    lay2 = lp.build_strided_layout(s, stride, n, chunk=256, e_wide=e,
                                   tile=tile, tail=128)
    assert lay2.t_start is not None and lay2.t_n.sum() > 0
    pref_line = (rng.random(num_lines) + 0.5).astype(np.float32)

    def soa_for(lay):
        c_int = (s + e) / 2.0
        rows = np.zeros((8, lay.nlines), np.float32)
        idx, dead = lay.idx, lay.dead
        rows[0] = c_int[idx]
        rows[1] = 0.1
        rows[2] = np.float32(0.02)
        rows[3] = np.float32(1.5)             # y^2 (prepacked)
        rows[4] = np.where(dead, 0.0, pref_line[idx])   # pref*y/sqrt(pi)
        rows[5] = np.where(dead, -1, s[idx])
        rows[6] = np.where(dead, -2, e[idx])
        return jnp.asarray(rows)

    out1 = np.asarray(lp._pallas_pass_strided(
        soa_for(lay1), lay1.w_start, lay1.w_n, n, tile, stride, chunk=256,
        interpret=True, prepacked=True))
    out2 = np.asarray(lp._pallas_pass_strided(
        soa_for(lay2), lay2.w_start, lay2.w_n, n, tile, stride, chunk=256,
        interpret=True, prepacked=True, t_start=lay2.t_start,
        t_n=lay2.t_n, tail=128))
    # Same lines, same math; only the summation grouping differs.
    np.testing.assert_allclose(out1, out2, rtol=2e-6,
                               atol=abs(out1).max() * 1e-6)
    assert abs(out1).max() > 0


def test_build_core_segments_mixed_covers_every_instance():
    """Mixed-slot packing: every (line, segment) instance lands in exactly
    one lane of its TILE's stream with the right slot id, and tile
    padding is the only padding (no per-stream chunk rounding)."""
    from pylbl_tpu.ops.lineshape_pallas import (SEG,
                                                build_core_segments_mixed)

    rng = np.random.default_rng(5)
    n_lines, num_points, tile, chunk = 400, 5000, 256, 128
    center = np.sort(rng.integers(-40, num_points + 40, n_lines))
    half = rng.integers(0, 2 * SEG, n_lines)
    cs, ce = center - half, center + half
    inst_line, seg0, slot, t_start, t_chunks = build_core_segments_mixed(
        cs, ce, num_points, tile=tile, chunk=chunk)
    assert inst_line.size % chunk == 0
    seen = {}
    for i in range(inst_line.size):
        line = inst_line[i]
        if line < 0:
            continue
        key = (int(line), int(seg0[i]) // SEG)
        assert key not in seen, "duplicate instance"
        seen[key] = True
        k = i // chunk
        t = int(seg0[i]) // tile
        assert t_start[t] <= k < t_start[t] + t_chunks[t]
        assert slot[i] == (int(seg0[i]) % tile) // SEG
    for i in range(n_lines):
        lo = max(cs[i], 0)
        hi = min(ce[i], num_points - 1)
        if ce[i] < cs[i] or hi < 0 or lo >= num_points:
            continue
        for s in range(lo // SEG, hi // SEG + 1):
            assert (i, s) in seen, f"missing instance line={i} seg={s}"
    # Tile-level padding only: total slots = sum of per-tile chunk counts.
    assert inst_line.size == max(int(t_chunks.sum()) * chunk, chunk)


def test_segmix_pass_matches_seg_pass():
    """The mixed-slot core pass (per-lane slot + MXU scatter) must match
    the per-stream segment pass up to addition order — with fewer slots
    (tile-level padding only)."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    cs, ce = lp.core_instance_windows(arrays, kin, n, npv, 25)
    inst_line, seg0, t_start, t_chunks, c_slot = lp.build_core_segments(
        cs, ce, n, tile=tile, chunk=chunk, sort_key=arrays["y"])
    params = lp.gather_segment_params(arrays, inst_line, seg0)
    want = np.asarray(lp._pallas_seg_pass(
        jax.device_put(params), t_start, t_chunks, c_slot, int(n), tile,
        chunk, interpret=True))

    (inst_m, seg0_m, slot_m, t_start_m,
     t_chunks_m) = lp.build_core_segments_mixed(
        cs, ce, n, tile=tile, chunk=chunk, sort_key=arrays["y"])
    assert inst_m.size <= inst_line.size
    params_m = lp.gather_segment_params(arrays, inst_m, seg0_m,
                                        slot=slot_m)
    got = np.asarray(lp._pallas_seg_pass_mixed(
        jax.device_put(params_m), t_start_m, t_chunks_m, int(n), tile,
        chunk, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=max(scale, 1e-30) * 1e-5)


def test_segmix_batched_matches_per_layer():
    """Layer-batched mixed-slot pass == per-layer mixed-slot pass."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp
    from pylbl_tpu.models.lines.physics import (kernel_inputs,
                                                line_profile_params)

    pack = synthetic_line_pack(num_lines=90, nu_min=30.0, nu_max=260.0,
                               seed=23, band_centers=(140.0,))
    grid = np.arange(40.0, 240.0, 0.2)
    v0, vn, npv, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, 25)
    t = np.asarray([288.99, 203.37])
    p = np.asarray([98388.0, 11419.0])
    x = np.asarray([6.6e-3, 3.0e-6])
    params = line_profile_params(pack, t, p, x, keep=keep)
    kin = kernel_inputs(params, v0, npv, 25)
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, chunk = 256, 128
    cs = np.asarray(kin["s_idx"]).astype(np.int64).min(axis=0)
    ce = np.asarray(kin["e_idx"]).astype(np.int64).max(axis=0)
    (inst_m, seg0_m, slot_m, t_start_m,
     t_chunks_m) = lp.build_core_segments_mixed(cs, ce, n, tile=tile,
                                                chunk=chunk)
    params_m = lp.gather_segment_params(arrays, inst_m, seg0_m,
                                        slot=slot_m, xp=np)
    batched = np.asarray(lp._pallas_seg_pass_mixed(
        jax.device_put(params_m), t_start_m, t_chunks_m, int(n), tile,
        chunk, interpret=True))
    for b in range(2):
        one = np.asarray(lp._pallas_seg_pass_mixed(
            jax.device_put(params_m[b]), t_start_m, t_chunks_m, int(n),
            tile, chunk, interpret=True))
        np.testing.assert_array_equal(batched[b], one)


def test_one_minus_exp_neg_accuracy():
    """The series-guarded radiation denominator must track the f64
    reference to ~1e-6 rel across the z ranges real lines produce
    (z = c2 nu / T in [2e-3, 40]); the plain f32 1-exp form loses up to
    3e-4 on the TPU's exp approximation at small z."""
    import jax.numpy as jnp
    from pylbl_tpu.parallel.lines import _one_minus_exp_neg

    z64 = np.concatenate([np.geomspace(2e-3, 0.49, 200),
                          np.geomspace(0.5, 40.0, 200)])
    want = 1.0 - np.exp(-z64)
    got = np.asarray(_one_minus_exp_neg(jnp.asarray(z64, jnp.float32)),
                     np.float64)
    rel = np.abs(got - want) / want
    assert rel.max() < 2e-6, rel.max()


def test_strided_prepacked_matches_checked_kernel():
    """The prepacked ownership-check-free strided wings kernels (Y row =
    y^2, PREF row = pref*y/sqrt(pi), padded per-tile layout) must match
    the raw checked kernels exactly on the same layout."""
    import jax
    from pylbl_tpu.ops import lineshape_pallas as lp

    kin, npv, n = small_workload()
    arrays = lineshape.prepare_kernel_arrays(kin, npv, np.float32)
    tile, stride = 256, 128
    s = arrays["s_idx"].astype(np.int64)
    lay = lp.build_strided_layout(s, stride, int(n), chunk=128)
    ka = {k: lay.gather(v) for k, v in arrays.items()}
    for key, fill in (("prefactor", 0.0), ("s_idx", -1), ("e_idx", -2)):
        ka[key] = np.where(lay.dead, fill, ka[key]).astype(ka[key].dtype)
    soa, num = lp.pack_lines_soa(ka, 128)
    soa_checked = soa.copy()
    soa_checked[lp._PAD, :num] = lay.assign.astype(np.float32)
    soa_checked[lp._PAD, num:] = -1.0
    want = np.asarray(lp._pallas_pass_strided(
        jax.device_put(soa_checked), lay.w_start, lay.w_n, int(n), tile,
        stride, chunk=128, interpret=True))

    soa_pre = soa.copy()
    soa_pre[lp.PREF, :] = (soa_pre[lp.PREF, :] * soa_pre[lp.Y, :]
                           * np.float32(1.0 / np.sqrt(np.pi)))
    soa_pre[lp.Y, :] = soa_pre[lp.Y, :] ** 2
    got = np.asarray(lp._pallas_pass_strided(
        jax.device_put(soa_pre), lay.w_start, lay.w_n, int(n), tile,
        stride, chunk=128, interpret=True, prepacked=True))
    np.testing.assert_allclose(got, want,
                               atol=float(np.abs(want).max()) * 1e-6)


def test_balanced_tile_assign_invariants():
    """2-choice tile balancing: every line's widened window stays fully
    contained in its assigned tile, and the total chunk count never
    exceeds the rightmost-tile baseline."""
    from pylbl_tpu.ops.lineshape_pallas import _balanced_tile_assign

    rng = np.random.default_rng(9)
    stride, tile, chunk = 128, 512, 64
    num_points = 20000
    num_tiles = (num_points - 1) // stride + 1
    # Clustered line starts (sparse + dense regions) with window widths
    # up to the containment limit tile - stride + 1.
    s = np.sort(np.concatenate([
        rng.integers(0, num_points, 300),
        rng.integers(4000, 4800, 1500),
        rng.integers(12000, 12100, 900)]))
    w = rng.integers(1, tile - stride + 1, s.size)
    e = np.minimum(s + w - 1, num_points - 1)
    assign = _balanced_tile_assign(s, e, stride, tile, num_tiles, chunk)
    assert (assign * stride <= s).all()
    assert (e <= assign * stride + tile - 1).all()
    cnt = np.bincount(assign, minlength=num_tiles)
    base = np.bincount(np.minimum(s // stride, num_tiles - 1),
                       minlength=num_tiles)
    chunks = int(np.ceil(cnt / chunk).sum())
    chunks_base = int(np.ceil(base / chunk).sum())
    assert chunks <= chunks_base
    assert cnt.sum() == s.size
