"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import Gas, internal_grid
from pylbl_tpu.parallel import device_line_pack, make_mesh, make_sharded_step
from pylbl_tpu.spectroscopy import number_density


@pytest.fixture(scope="module")
def workload():
    pack = synthetic_line_pack(num_lines=400, nu_min=0.6, nu_max=360.0,
                               seed=31)
    grid = np.arange(1.0, 320.0, 0.5)
    return pack, grid


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert set(mesh.axis_names) == {"batch", "spec"}


@pytest.mark.parametrize("batch,spec", [(2, 4), (1, 8), (4, 2)])
def test_sharded_step_matches_host_engine(workload, batch, spec):
    pack, grid = workload
    mesh = make_mesh(batch=batch, spec=spec)
    arrays, static = device_line_pack(pack, grid)
    kin = {"y": None, "repwid": None}
    # Use host physics for the core-window sizing.
    from pylbl_tpu.models.lines.physics import (kernel_inputs,
                                                line_profile_params)
    params = line_profile_params(pack, 288.99, 98388.0, 6.6e-3,
                                 keep=static["num_lines"])
    kin = kernel_inputs(params, static["v0"], static["n_per_v"],
                        static["cut_off"])

    step, info = make_sharded_step(arrays, static, mesh,
                                   kin={"y": kin["y"],
                                        "repwid": kin["repwid"]})
    temperature = np.asarray([288.99, 269.01, 227.74, 203.37])
    pressure = np.asarray([98388.0, 117.0, 1032.0, 11419.0])
    vmr = np.asarray([6.637074e-03, 5.244536e-06, 4.763972e-06,
                      3.039952e-06])
    arrays_f32 = jax.tree.map(lambda a: np.asarray(a), arrays)
    out = np.asarray(step(arrays_f32, temperature.astype(np.float32),
                          pressure.astype(np.float32),
                          vmr.astype(np.float32)))
    assert out.shape == (4, info["padded_points"])
    out = out[:, :static["num_points"]]

    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    for i in range(4):
        k = gas.absorption_coefficient(temperature[i], pressure[i], vmr[i],
                                       grid)
        expected = number_density(temperature[i], pressure[i], vmr[i]) * k
        scale = max(expected.max(), 1e-300)
        rel = np.abs(out[i] - expected) / np.maximum(np.abs(expected),
                                                     scale * 1e-6)
        # float32 device physics vs float64 host physics.
        assert rel.max() < 5e-4


def test_sharded_step_batch_padding_invariance(workload):
    """Different mesh splits produce identical results."""
    pack, grid = workload
    arrays, static = device_line_pack(pack, grid)
    outs = []
    for batch, spec in [(2, 4), (1, 8)]:
        mesh = make_mesh(batch=batch, spec=spec)
        step, info = make_sharded_step(arrays, static, mesh)
        temperature = np.full(4, 288.99, np.float32)
        pressure = np.full(4, 98388.0, np.float32)
        vmr = np.full(4, 6.6e-3, np.float32)
        out = np.asarray(step(arrays, temperature, pressure, vmr))
        outs.append(out[:, :static["num_points"]])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6,
                               atol=float(np.abs(outs[0]).max()) * 1e-7)


def test_batched_fn_envelope_guard():
    import pytest
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.parallel.lines import make_batched_tpu_fn

    pack = synthetic_line_pack(num_lines=64, nu_min=0.7, nu_max=60.0, seed=4)
    fn = make_batched_tpu_fn(pack, np.arange(1.0, 50.0, 0.5),
                             t_max=350.0, p_max_atm=5.0)
    with pytest.raises(ValueError, match="t_max"):
        fn(np.asarray([400.0], np.float32), np.asarray([1e5], np.float32),
           np.asarray([1e-3], np.float32))
    with pytest.raises(ValueError, match="p_max_atm"):
        fn(np.asarray([288.0], np.float32), np.asarray([6e5], np.float32),
           np.asarray([1e-3], np.float32))


def test_derive_envelope():
    from pylbl_tpu.parallel.lines import derive_envelope

    # Canonical 4-layer column: quantized up to the next 5 K / 0.25 atm.
    t_max, p_max = derive_envelope(
        np.asarray([288.99, 269.01, 227.74, 203.37]),
        np.asarray([98388.0, 117.0, 1032.0, 11419.0]))
    assert t_max == 290.0
    assert p_max == 1.0
    # Conditions above the old fixed defaults now produce a larger
    # envelope instead of a runtime guard failure downstream.
    t_max, p_max = derive_envelope(np.asarray([400.0]),
                                   np.asarray([8e5]))
    assert t_max == 400.0 and p_max >= 8e5 * 9.86923e-6
    # Empty conditions fall back to the wide terrestrial defaults.
    assert derive_envelope(np.asarray([]), np.asarray([])) == (350.0, 5.0)
    # Non-finite conditions fail loudly instead of propagating NaN-sized
    # instance windows into the batched pipelines.
    with pytest.raises(ValueError, match="non-finite"):
        derive_envelope(np.asarray([288.0, np.nan]), np.asarray([1e5, 1e5]))
    with pytest.raises(ValueError, match="non-finite"):
        derive_envelope(np.asarray([288.0]), np.asarray([np.inf]))


def test_unstackable_error_taxonomy():
    """Stacking failures raise the dedicated UnstackableError (a ValueError
    subclass) so orchestration fallbacks never swallow unrelated bugs."""
    from pylbl_tpu.database.fixtures import synthetic_line_pack
    from pylbl_tpu.parallel.lines import (UnstackableError,
                                          stack_device_packs)

    packs = {"A": synthetic_line_pack(num_lines=32, nu_min=0.5,
                                      nu_max=60.0, seed=1),
             "B": synthetic_line_pack(num_lines=32, nu_min=0.5,
                                      nu_max=60.0, seed=2)}
    # Mismatched TIPS base temperatures are unstackable.
    import dataclasses
    packs["B"] = dataclasses.replace(
        packs["B"], q_temperature=packs["B"].q_temperature + 5.0)
    with pytest.raises(UnstackableError):
        stack_device_packs(packs, np.arange(1.0, 50.0, 0.1))
    assert issubclass(UnstackableError, ValueError)


def test_batched_fn_tight_envelope_matches_default(workload):
    """A tight atmosphere-derived envelope only shrinks the
    layer-independent core-instance windows; results must be identical to
    the wide default envelope's (coverage stays exact inside the
    envelope)."""
    from pylbl_tpu.parallel.lines import derive_envelope, make_batched_tpu_fn

    pack, grid = workload
    temperature = np.asarray([288.99, 269.01, 227.74, 203.37], np.float32)
    pressure = np.asarray([98388.0, 117.0, 1032.0, 11419.0], np.float32)
    vmr = np.full(4, 6.6e-3, np.float32)
    t_max, p_max = derive_envelope(temperature, pressure)
    outs = []
    for kwargs in ({}, {"t_max": t_max, "p_max_atm": p_max}):
        fn = make_batched_tpu_fn(pack, grid, tile=256, chunk=128,
                                 interpret=True, **kwargs)
        outs.append(np.asarray(fn(temperature, pressure, vmr), np.float64))
    scale = max(outs[0].max(), 1e-300)
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-6,
                               atol=scale * 1e-7)


@pytest.mark.parametrize("mode,batch,spec", [
    ("halo", 2, 4), ("halo", 1, 8), ("ring", 2, 4), ("ring", 1, 8),
    ("ring", 4, 2), ("balanced", 2, 4), ("balanced", 1, 8)])
def test_lines_sharded_step_matches_host_engine(workload, mode, batch, spec):
    from pylbl_tpu.parallel import (make_lines_sharded_step,
                                    shard_line_pack)

    pack, grid = workload
    mesh = make_mesh(batch=batch, spec=spec)
    blocks, q_table, static, info = shard_line_pack(pack, grid, spec,
                                                    mode=mode)
    assert info["mode"] == mode
    if mode == "ring":
        assert info["duplication"] == 1.0  # each line in exactly one block
        assert info["ring_steps"] >= 1     # small slabs need exchange
    if mode == "balanced":
        assert info["duplication"] == 1.0
        ideal = -(-static["num_lines"] // spec)
        assert info["block_len"] <= ideal + 1  # equal-count partition
    step = make_lines_sharded_step(static, info, mesh)
    temperature = np.asarray([288.99, 269.01, 227.74, 203.37])
    pressure = np.asarray([98388.0, 117.0, 1032.0, 11419.0])
    vmr = np.asarray([6.637074e-03, 5.244536e-06, 4.763972e-06,
                      3.039952e-06])
    out = np.asarray(step(blocks, q_table, temperature.astype(np.float32),
                          pressure.astype(np.float32),
                          vmr.astype(np.float32)))
    assert out.shape == (4, info["padded_points"])
    out = out[:, :static["num_points"]]

    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    for i in range(4):
        k = gas.absorption_coefficient(temperature[i], pressure[i], vmr[i],
                                       grid)
        expected = number_density(temperature[i], pressure[i], vmr[i]) * k
        scale = max(expected.max(), 1e-300)
        rel = np.abs(out[i] - expected) / np.maximum(np.abs(expected),
                                                     scale * 1e-6)
        assert rel.max() < 5e-4


def test_sharded_pipeline_pedestal_matches_oracle(workload):
    """Pedestal-on sharded pipeline vs the compiled reference C oracle."""
    import oracle
    from pylbl_tpu.parallel import make_sharded_pipeline

    if not oracle.available():
        pytest.skip("oracle unavailable")
    pack, grid = workload
    mesh = make_mesh(batch=2, spec=4)
    fn = make_sharded_pipeline(pack, grid, mesh, remove_pedestal=True,
                               weight_density=False)
    temperature = np.asarray([288.99, 227.74])
    pressure = np.asarray([98388.0, 1032.0])
    vmr = np.asarray([6.637074e-03, 4.763972e-06])
    out = fn(temperature, pressure, vmr)

    from pylbl_tpu.models.lines import internal_grid
    v0, vn, n_per_v, _ = internal_grid(grid)
    for i in range(2):
        expected = oracle.absorption(pack, temperature[i], pressure[i],
                                     vmr[i], v0, vn, n_per_v,
                                     remove_pedestal=True)
        scale = max(expected.max(), 1e-300)
        rel = np.abs(out[i] - expected) / np.maximum(np.abs(expected),
                                                     scale * 1e-6)
        assert rel.max() < 5e-4


def test_distributed_single_process_paths():
    from pylbl_tpu.parallel import distributed as dist

    assert dist.initialize() is False  # no cluster env -> no-op
    mesh = dist.global_mesh(spec=4)
    assert mesh.shape == {"batch": 2, "spec": 4}
    assert dist.process_local_rows(10) == slice(0, 10)
    rows = np.arange(12, dtype=np.float32).reshape(6, 2)
    arr = dist.host_local_batch_array(rows, dist.global_mesh(spec=4))
    np.testing.assert_array_equal(np.asarray(arr), rows)


def test_distributed_mesh_host_major_spec():
    """spec defaults to the per-process device count so ring traffic
    stays on one host's ICI."""
    from pylbl_tpu.parallel import distributed as dist

    mesh = dist.global_mesh()
    assert mesh.shape["spec"] == len(jax.devices()) // jax.process_count()


@pytest.mark.parametrize("mode,batch,spec", [
    ("balanced", 2, 4), ("balanced", 1, 8), ("halo", 2, 4), ("halo", 1, 8),
    ("ring", 2, 4), ("ring", 1, 8)])
def test_pallas_sharded_step_matches_host_engine(workload, mode, batch,
                                                 spec):
    """The Pallas (strided-wings + mixed-slot-core) sharded step: every
    shard runs the production TPU kernels on its own block (interpret
    mode on the CPU mesh) and must agree with the float64 host engine."""
    import jax.numpy as jnp
    from pylbl_tpu.parallel import (make_lines_sharded_step,
                                    shard_line_pack)

    pack, grid = workload
    mesh = make_mesh(batch=batch, spec=spec)
    blocks, q_table, static, info = shard_line_pack(pack, grid, spec,
                                                    mode=mode)
    step = make_lines_sharded_step(static, info, mesh, blocks=blocks,
                                   backend="pallas", tile=256,
                                   interpret=True)
    assert step.backend == "pallas"
    blocks_dev = jax.tree.map(jnp.asarray, step.call_blocks)
    temperature = np.asarray([288.99, 269.01, 227.74, 203.37])
    pressure = np.asarray([98388.0, 117.0, 1032.0, 11419.0])
    vmr = np.asarray([6.637074e-03, 5.244536e-06, 4.763972e-06,
                      3.039952e-06])
    out = np.asarray(step(blocks_dev, jnp.asarray(q_table),
                          temperature.astype(np.float32),
                          pressure.astype(np.float32),
                          vmr.astype(np.float32)))
    assert out.shape == (4, info["padded_points"])
    out = out[:, :static["num_points"]]

    gas = Gas(pack, pack.formula, dtype=np.float64, backend="xla")
    for i in range(4):
        k = gas.absorption_coefficient(temperature[i], pressure[i], vmr[i],
                                       grid)
        expected = number_density(temperature[i], pressure[i], vmr[i]) * k
        scale = max(expected.max(), 1e-300)
        rel = np.abs(out[i] - expected) / np.maximum(np.abs(expected),
                                                     scale * 1e-6)
        assert rel.max() < 5e-4


def test_pallas_ring_plans_are_index_resident(workload):
    """The ring Pallas plans must hold GATHER INDICES, not expanded line
    constants — resident constants would defeat the ring's ~1/spec
    line-memory point (halo already covers that trade)."""
    from pylbl_tpu.parallel import (make_lines_sharded_step,
                                    shard_line_pack)

    pack, grid = workload
    mesh = make_mesh(batch=1, spec=8)
    blocks, q_table, static, info = shard_line_pack(pack, grid, 8,
                                                    mode="ring")
    step = make_lines_sharded_step(static, info, mesh, blocks=blocks,
                                   backend="pallas", interpret=True)
    assert step.backend == "pallas"
    call = step.call_blocks
    assert set(call) == {"plans", "blocks"}
    # Raw blocks circulate; plans carry only small per-step index/mask
    # arrays (no "lines"/"inst" constant dicts like the halo plans).
    for plan in call["plans"]:
        assert "lines" not in plan and "inst" not in plan
        assert plan["wsel"].dtype == np.int32
        assert plan["isel"].dtype == np.int32


def test_batched_pipeline_within_golden_band():
    """Budgeted accuracy: the f32 batched pipeline must stay within HALF
    the reference golden tolerance vs the C oracle across the canonical
    cold/hot column (the published anchors' pytest.approx on log values
    tolerates ~4.8e-5 rel; reference tests/test_gas_optics.py:17-19).
    Guards the device-physics + Pallas-kernel error budget from
    regressing past the band."""
    import oracle
    from pylbl_tpu.models.lines import internal_grid
    from pylbl_tpu.parallel.lines import (derive_envelope,
                                          make_batched_tpu_fn)

    if not oracle.available():
        pytest.skip("oracle unavailable")
    pack = synthetic_line_pack(num_lines=3000, nu_min=0.5, nu_max=1000.0,
                               seed=11)
    grid = np.arange(1.0, 900.0, 0.1)
    v0, vn, npv, n = internal_grid(grid)
    t = np.asarray([203.37, 227.74, 269.01, 288.99], np.float32)
    p = np.asarray([117.0, 1032.0, 11419.0, 98388.0], np.float32)
    x = np.full(4, 6.637074e-03, np.float32)
    t_max, p_max = derive_envelope(t, p)
    fn = make_batched_tpu_fn(pack, grid, tile=256, chunk=128,
                             interpret=True, t_max=t_max, p_max_atm=p_max)
    got = np.asarray(fn(t, p, x), np.float64)
    for i in range(4):
        want = oracle.absorption(pack, float(t[i]), float(p[i]),
                                 float(x[i]), v0, vn, npv, cut_off=25)
        rel = np.abs(got[i] - want).max() / want.max()
        assert rel < 2.4e-5, f"layer {i}: {rel:.2e} exceeds half-band"


def test_bitwise_determinism_across_calls(workload):
    """SURVEY §5: no sanitizers are needed because the formulation is
    gather-based — but that claim must be PINNED: repeated evaluation of
    the same inputs must be bit-identical (no nondeterministic
    scatter-add ordering), on both backends and through the sharded
    step."""
    import jax.numpy as jnp
    from pylbl_tpu.parallel import (make_batched_tpu_fn,
                                    make_lines_sharded_step,
                                    shard_line_pack)

    pack, grid = workload
    t = np.asarray([288.99, 227.74], np.float32)
    p = np.asarray([98388.0, 1032.0], np.float32)
    x = np.asarray([6.637074e-03, 4.763972e-06], np.float32)

    fn = make_batched_tpu_fn(pack, grid, tile=256, chunk=128,
                             interpret=True)
    a = np.asarray(fn(t, p, x))
    b = np.asarray(fn(t, p, x))
    np.testing.assert_array_equal(a, b)

    mesh = make_mesh(batch=2, spec=4)
    blocks, q_table, static, info = shard_line_pack(pack, grid, 4,
                                                    mode="balanced")
    step = make_lines_sharded_step(static, info, mesh)
    s1 = np.asarray(step(blocks, q_table, t, p, x))
    s2 = np.asarray(step(blocks, q_table, t, p, x))
    np.testing.assert_array_equal(s1, s2)
