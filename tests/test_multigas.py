"""Gas-stacked single-launch kernel tests (one launch for all gases,
replacing the reference's serial per-gas loop, spectroscopy.py:166-205)."""
import numpy as np
import pytest

from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.models.lines import Gas, internal_grid
from pylbl_tpu.parallel.lines import (make_multigas_batched_fn,
                                      stack_device_packs)


@pytest.fixture(scope="module")
def gas_packs():
    return {
        "H2O": synthetic_line_pack("H2O", num_lines=300, nu_min=0.6,
                                   nu_max=260.0, seed=21,
                                   band_centers=(150.0,)),
        "CO2": synthetic_line_pack("CO2", num_lines=200, nu_min=0.6,
                                   nu_max=260.0, seed=22,
                                   band_centers=(60.0, 200.0)),
        "O3": synthetic_line_pack("O3", num_lines=100, nu_min=0.6,
                                  nu_max=260.0, seed=23,
                                  band_centers=(100.0,)),
    }


GRID = np.arange(1.0, 220.0, 0.2)
T = np.asarray([288.99, 227.74])
P = np.asarray([98388.0, 1032.0])
VMR = np.asarray([[6.637074e-03, 3.9e-04, 6.7e-08],
                  [4.2e-06, 3.9e-04, 7.8e-06]])


def test_stack_device_packs_layout(gas_packs):
    arrays, host, static, names = stack_device_packs(gas_packs, GRID)
    assert names == ["H2O", "CO2", "O3"]
    assert static["num_gases"] == 3
    assert static["flat_points"] == 3 * static["num_points"]
    # flat_off strictly per gas, q_row offsets disjoint per gas.
    v0, vn, npv, n = internal_grid(GRID)
    keeps = [p.compat_break_filter(v0, vn, 25) for p in gas_packs.values()]
    assert arrays["nu"].shape[0] == sum(keeps)
    bounds = np.cumsum([0] + keeps)
    for g in range(3):
        sl = slice(bounds[g], bounds[g + 1])
        assert np.all(arrays["gas_idx"][sl] == g)
        assert np.all(arrays["flat_off"][sl] == g * n)
    assert host["nu"].dtype == np.float64


def expected_per_gas(gas_packs):
    out = []
    for g, (name, pack) in enumerate(gas_packs.items()):
        gas = Gas(pack, name, dtype=np.float64, backend="xla")
        out.append(np.stack([
            gas.absorption_coefficient(T[i], P[i], VMR[i, g], GRID)
            for i in range(T.size)]))
    return np.stack(out, axis=1)  # [B, G, points]


@pytest.mark.parametrize("backend,tile,wings_tail", [
    ("xla", 256, None), ("pallas", 256, None), ("pallas", 512, 128),
    ("pallas", 512, None)])
def test_multigas_single_launch_matches_per_gas(gas_packs, backend, tile,
                                                wings_tail):
    fn = make_multigas_batched_fn(gas_packs, GRID, backend=backend,
                                  tile=tile, chunk=128, interpret=True,
                                  wings_tail=wings_tail)
    if wings_tail is not None:
        # The strided layout must have engaged (tail is strided-only).
        assert fn.wings_stride is not None
        assert fn.wings_tail_csr is not None
    got = np.asarray(fn(T.astype(np.float32), P.astype(np.float32),
                        VMR.astype(np.float32)), np.float64)
    want = expected_per_gas(gas_packs)
    assert got.shape == want.shape
    for g in range(3):
        scale = max(want[:, g].max(), 1e-300)
        rel = np.abs(got[:, g] - want[:, g]) / np.maximum(
            np.abs(want[:, g]), scale * 1e-6)
        assert rel.max() < 5e-4, f"gas {g} rel {rel.max()}"


def test_multigas_no_cross_gas_leakage(gas_packs):
    """A gas with zero vmr must still see air-broadened lines, and other
    gases' windows must never write into its segment."""
    fn = make_multigas_batched_fn(gas_packs, GRID, backend="xla")
    vmr = VMR.copy()
    vmr[:, 2] = 0.0
    got = np.asarray(fn(T.astype(np.float32), P.astype(np.float32),
                        vmr.astype(np.float32)), np.float64)
    pack = gas_packs["O3"]
    gas = Gas(pack, "O3", dtype=np.float64, backend="xla")
    for i in range(T.size):
        want = gas.absorption_coefficient(T[i], P[i], 0.0, GRID)
        scale = max(want.max(), 1e-300)
        rel = np.abs(got[i, 2] - want) / np.maximum(np.abs(want),
                                                    scale * 1e-6)
        assert rel.max() < 5e-4


def test_multigas_envelope_guard(gas_packs):
    fn = make_multigas_batched_fn(gas_packs, GRID, tile=256, chunk=128,
                                  interpret=True)
    with pytest.raises(ValueError, match="t_max"):
        fn(np.asarray([400.0], np.float32), np.asarray([1e5], np.float32),
           np.asarray([[1e-3, 1e-3, 1e-3]], np.float32))


def test_spectroscopy_stacked_lines_with_pedestal(gas_packs):
    """Spectroscopy._compute_lines_stacked (incl. pedestal) must match the
    per-gas f64 host path within the f32 device-physics tolerance."""
    from pylbl_tpu import Dataset
    from pylbl_tpu.database.db import Database
    from pylbl_tpu.spectroscopy import Spectroscopy

    import tempfile, os
    tmp = tempfile.mkdtemp()
    db = Database(os.path.join(tmp, "mg.db"))
    for pack in gas_packs.values():
        db.ingest_line_pack(pack)
    atm = Dataset(data_vars={
        "p": (["layer"], P, {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], T, {"standard_name": "air_temperature",
                             "units": "K"}),
        "q": (["layer"], VMR[:, 0],
              {"standard_name": "mole_fraction_of_water_vapor_in_air",
               "units": "mol mol-1"}),
        "co2": (["layer"], VMR[:, 1],
                {"standard_name": "mole_fraction_of_carbon_dioxide_in_air",
                 "units": "mol mol-1"}),
        "o3": (["layer"], VMR[:, 2],
               {"standard_name": "mole_fraction_of_ozone_in_air",
                "units": "mol mol-1"}),
    })
    s = Spectroscopy(atm, GRID, db)
    for name in s.atmosphere.gases:
        from pylbl_tpu.spectroscopy import MoleculeCache
        s.cache[name] = MoleculeCache(name, s.grid, s.lines_database,
                                      s.lines_engine, s.continua_engine,
                                      s.cross_sections_engine)
    vmr_by_gas = {name: VMR[:, g] for g, name in
                  enumerate(["H2O", "CO2", "O3"])}
    stacked = s._compute_lines_stacked(T, P, vmr_by_gas,
                                       remove_pedestal=True, backend="xla")
    assert set(stacked) == {"H2O", "CO2", "O3"}
    for g, name in enumerate(["H2O", "CO2", "O3"]):
        gas = Gas(gas_packs[name], name, dtype=np.float64, backend="xla")
        for i in range(T.size):
            want = gas.absorption_coefficient(T[i], P[i], VMR[i, g], GRID,
                                              remove_pedestal=True)
            scale = max(want.max(), 1e-300)
            rel = np.abs(stacked[name][i] - want) / np.maximum(
                np.abs(want), scale * 1e-6)
            assert rel.max() < 5e-4, f"{name} layer {i}: {rel.max()}"


def test_spectroscopy_with_mesh_matches_default(gas_packs):
    """Spectroscopy(mesh=...) computes lines multi-device (sharded lines +
    pedestal) and must match the default host path."""
    import jax
    from pylbl_tpu import Dataset
    from pylbl_tpu.database.db import Database
    from pylbl_tpu.parallel import make_mesh
    from pylbl_tpu.spectroscopy import Spectroscopy

    import tempfile, os
    tmp = tempfile.mkdtemp()
    db = Database(os.path.join(tmp, "mesh.db"))
    for pack in gas_packs.values():
        db.ingest_line_pack(pack)
    atm = Dataset(data_vars={
        "p": (["layer"], P, {"standard_name": "air_pressure", "units": "Pa"}),
        "t": (["layer"], T, {"standard_name": "air_temperature",
                             "units": "K"}),
        "q": (["layer"], VMR[:, 0],
              {"standard_name": "mole_fraction_of_water_vapor_in_air",
               "units": "mol mol-1"}),
        "co2": (["layer"], VMR[:, 1],
                {"standard_name": "mole_fraction_of_carbon_dioxide_in_air",
                 "units": "mol mol-1"}),
    })
    mesh = make_mesh(batch=2, spec=4)
    sharded = Spectroscopy(atm, GRID, db, mesh=mesh).compute_absorption(
        output_format="gas")
    default = Spectroscopy(atm, GRID, db).compute_absorption(
        output_format="gas")
    for name in ("H2O_absorption", "CO2_absorption"):
        want = default[name].data
        got = sharded[name].data
        scale = max(np.abs(want).max(), 1e-300)
        rel = np.abs(got - want) / np.maximum(np.abs(want), scale * 1e-6)
        assert rel.max() < 5e-4, f"{name}: {rel.max()}"


def test_spectroscopy_streamed_with_mesh(gas_packs, tmp_path):
    """Streamed output with a mesh: odd layer counts pad to the mesh batch
    axis and results match the in-memory path."""
    from pylbl_tpu import Dataset, open_dataset
    from pylbl_tpu.database.db import Database
    from pylbl_tpu.parallel import make_mesh
    from pylbl_tpu.spectroscopy import Spectroscopy

    db = Database(tmp_path / "st.db")
    db.ingest_line_pack(gas_packs["H2O"])
    t3 = np.asarray([288.99, 250.0, 227.74])
    p3 = np.asarray([98388.0, 20000.0, 1032.0])
    q3 = np.asarray([6.6e-3, 1e-4, 4.2e-6])
    atm = Dataset(data_vars={
        "p": (["layer"], p3, {"standard_name": "air_pressure",
                              "units": "Pa"}),
        "t": (["layer"], t3, {"standard_name": "air_temperature",
                              "units": "K"}),
        "q": (["layer"], q3,
              {"standard_name": "mole_fraction_of_water_vapor_in_air",
               "units": "mol mol-1"}),
    })
    mesh = make_mesh(batch=2, spec=4)
    s = Spectroscopy(atm, GRID, db, mesh=mesh)
    out_path = s.compute_absorption_streamed(tmp_path / "out.nc",
                                             block_layers=2)
    back = open_dataset(out_path)
    dense = Spectroscopy(atm, GRID, db).compute_absorption(
        output_format="gas")["H2O_absorption"].data
    got = back["H2O_absorption"].data.sum(axis=1)
    scale = max(np.abs(dense).max(), 1e-300)
    rel = np.abs(got - dense) / np.maximum(np.abs(dense), scale * 1e-6)
    assert rel.max() < 5e-4


@pytest.mark.parametrize("mode", ["balanced", "ring"])
def test_multigas_sharded_pipeline(gas_packs, mode):
    """Gas stacking composed with line sharding (the config-5 layout) must
    match the per-gas host engine, pedestal included."""
    from pylbl_tpu.parallel import (make_mesh,
                                    make_multigas_sharded_pipeline)

    mesh = make_mesh(batch=2, spec=4)
    fn = make_multigas_sharded_pipeline(gas_packs, GRID, mesh, mode=mode,
                                        remove_pedestal=True)
    got = fn(T, P, VMR)
    for g, (name, pack) in enumerate(gas_packs.items()):
        gas = Gas(pack, name, dtype=np.float64, backend="xla")
        for i in range(T.size):
            want = gas.absorption_coefficient(T[i], P[i], VMR[i, g], GRID,
                                              remove_pedestal=True)
            scale = max(want.max(), 1e-300)
            rel = np.abs(got[i, g] - want) / np.maximum(np.abs(want),
                                                        scale * 1e-6)
            assert rel.max() < 5e-4, f"{name} layer {i}: {rel.max()}"


def test_sharded_pipeline_device_resident(gas_packs):
    """fn.device keeps the field on device end-to-end (pedestal included:
    its host phase touches only [B, N] endpoint values) and fn.total
    reduces there; both match the numpy-materializing fn."""
    import jax
    from pylbl_tpu.parallel import make_mesh, make_multigas_sharded_pipeline
    from pylbl_tpu.spectroscopy import number_density

    mesh = make_mesh(batch=2, spec=4)
    fn = make_multigas_sharded_pipeline(gas_packs, GRID, mesh,
                                        remove_pedestal=True)
    k_dev = fn.device(T, P, VMR)
    assert isinstance(k_dev, jax.Array)
    np.testing.assert_allclose(np.asarray(k_dev, np.float64), fn(T, P, VMR),
                               rtol=0, atol=0)
    tot = np.asarray(fn.total(T, P, VMR), np.float64)
    want = np.einsum("bgn,bg->bn", fn(T, P, VMR),
                     number_density(T[:, None], P[:, None], VMR))
    scale = max(np.abs(want).max(), 1e-300)
    rel = np.abs(tot - want) / np.maximum(np.abs(want), scale * 1e-6)
    assert rel.max() < 1e-4


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_multigas_total_on_device(gas_packs, backend):
    """fn.total reduces the density-weighted gas sum on device."""
    from pylbl_tpu.spectroscopy import number_density

    fn = make_multigas_batched_fn(gas_packs, GRID, backend=backend,
                                  tile=256, chunk=128, interpret=True)
    per_gas = np.asarray(fn(T.astype(np.float32), P.astype(np.float32),
                            VMR.astype(np.float32)), np.float64)
    want = np.einsum("bgn,bg->bn", per_gas,
                     number_density(T[:, None], P[:, None], VMR))
    got = np.asarray(fn.total(T.astype(np.float32), P.astype(np.float32),
                              VMR.astype(np.float32)), np.float64)
    scale = max(np.abs(want).max(), 1e-300)
    rel = np.abs(got - want) / np.maximum(np.abs(want), scale * 1e-6)
    assert rel.max() < 1e-4


@pytest.mark.parametrize("mode", ["balanced", "halo", "ring"])
@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_stacked_sharded_step_density_weighting(gas_packs, mode, backend):
    """weight_density=True on the raw stacked sharded step must weight
    every flat point by its OWN gas's number density on every shard.
    Round-4 advisor bug: the Pallas balanced path computed the weighting
    gas index from grid origin 0 on all shards, so every slab past the
    first was weighted with the wrong gas's density (~2e3 rel error)."""
    import jax
    import jax.numpy as jnp
    from pylbl_tpu.parallel import (make_lines_sharded_step, make_mesh,
                                    shard_stacked_packs)
    from pylbl_tpu.spectroscopy import number_density

    mesh = make_mesh(batch=2, spec=4)
    blocks, q_table, static, info, names = shard_stacked_packs(
        gas_packs, GRID, 4, mode=mode)
    step = make_lines_sharded_step(
        static, info, mesh, weight_density=True, blocks=blocks,
        backend=backend, interpret=True)
    assert step.backend == backend
    call_blocks = blocks if step.call_blocks is None else step.call_blocks
    blocks_dev = jax.tree.map(jnp.asarray, call_blocks)
    out = np.asarray(step(blocks_dev, jnp.asarray(q_table),
                          T.astype(np.float32), P.astype(np.float32),
                          VMR.astype(np.float32)))
    n = static["num_points"]
    got = out[:, :static["flat_points"]].reshape(T.size, len(names), n)
    xsec = expected_per_gas(gas_packs)  # [B, G, points] cross sections
    for g in range(len(names)):
        want = xsec[:, g] * number_density(
            T, P, VMR[:, g])[:, None]
        scale = max(want.max(), 1e-300)
        rel = np.abs(got[:, g] - want) / np.maximum(np.abs(want),
                                                    scale * 1e-6)
        assert rel.max() < 5e-4, f"gas {g} rel {rel.max()}"


@pytest.mark.parametrize("mode", ["balanced", "halo", "ring"])
def test_multigas_sharded_pipeline_pallas(gas_packs, mode):
    """The config-5 composition with the Pallas per-shard kernels
    (strided wings + mixed-slot core, interpret mode on the CPU mesh)
    must match the per-gas host engine, pedestal included."""
    from pylbl_tpu.parallel import (make_mesh,
                                    make_multigas_sharded_pipeline)

    mesh = make_mesh(batch=2, spec=4)
    fn = make_multigas_sharded_pipeline(gas_packs, GRID, mesh, mode=mode,
                                        remove_pedestal=True,
                                        backend="pallas", interpret=True)
    got = fn(T, P, VMR)
    for g, (name, pack) in enumerate(gas_packs.items()):
        gas = Gas(pack, name, dtype=np.float64, backend="xla")
        for i in range(T.size):
            want = gas.absorption_coefficient(T[i], P[i], VMR[i, g], GRID,
                                              remove_pedestal=True)
            scale = max(want.max(), 1e-300)
            rel = np.abs(got[i, g] - want) / np.maximum(np.abs(want),
                                                        scale * 1e-6)
            assert rel.max() < 5e-4, f"{name} layer {i}: {rel.max()}"
