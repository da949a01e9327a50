"""Streamed/resumable output writer tests."""
import numpy as np

from pylbl_tpu import Spectroscopy, open_dataset
from pylbl_tpu.database.db import Database
from pylbl_tpu.database.fixtures import synthetic_line_pack
from pylbl_tpu.utils.streaming import StreamingWriter


def test_streaming_writer_resume(tmp_path):
    path = tmp_path / "stream.nc"
    grid = np.arange(1.0, 50.0, 0.5)
    with StreamingWriter(path, 3, grid, ["a"]) as writer:
        assert list(writer.pending_states()) == [0, 1, 2]
        writer.write_state(0, {"a": np.full(grid.size, 1.0)})
        writer.write_state(2, {"a": np.full(grid.size, 3.0)})
    # Reopen: only state 1 is pending.
    with StreamingWriter(path, 3, grid, ["a"]) as writer:
        assert list(writer.pending_states()) == [1]
        writer.write_state(1, {"a": np.full(grid.size, 2.0)})
    back = open_dataset(path)
    np.testing.assert_array_equal(back["a"].data[:, 0], [1.0, 2.0, 3.0])


def test_streamed_matches_in_memory(tmp_path, atmosphere_dataset,
                                    coarse_grid):
    db = Database(tmp_path / "s.db")
    db.ingest_line_pack(synthetic_line_pack(num_lines=200, seed=21))
    spec = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    full = spec.compute_absorption(output_format="all")
    out = spec.compute_absorption_streamed(tmp_path / "out.nc")
    back = open_dataset(out)
    np.testing.assert_allclose(
        back["H2O_absorption"].data,
        full.data_vars["H2O_absorption"].data, rtol=1e-12)
    np.testing.assert_array_equal(back["wavenumber"].data, coarse_grid)


def test_streamed_with_mesh_matches_host(tmp_path, atmosphere_dataset,
                                         coarse_grid):
    """compute_absorption_streamed(mesh=...) runs each layer block through
    the sharded multi-device lines path and must match the host result."""
    from pylbl_tpu.parallel import make_mesh

    db = Database(tmp_path / "m.db")
    db.ingest_line_pack(synthetic_line_pack(num_lines=200, seed=21))
    host = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    full = host.compute_absorption(output_format="all")
    meshed = Spectroscopy(atmosphere_dataset, coarse_grid, db,
                          mesh=make_mesh(batch=2, spec=4))
    out = meshed.compute_absorption_streamed(tmp_path / "mesh.nc",
                                             block_layers=3)
    back = open_dataset(out)
    want = full.data_vars["H2O_absorption"].data
    got = back["H2O_absorption"].data
    scale = max(want.max(), 1e-300)
    # f32 sharded device physics vs f64 host physics.
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=scale * 5e-4)


def test_spectroscopy_batched_lines_path(tmp_path, atmosphere_dataset,
                                         coarse_grid):
    """The multi-layer lines branch goes through the batch API and matches
    per-layer computation."""
    db = Database(tmp_path / "b.db")
    db.ingest_line_pack(synthetic_line_pack(num_lines=200, seed=21))
    spec = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    full = spec.compute_absorption(output_format="all")
    gas = spec.cache["H2O"].gas
    t = np.asarray(atmosphere_dataset["temperature"].data)
    p = np.asarray(atmosphere_dataset["pressure"].data)
    x = np.asarray(atmosphere_dataset["water_vapor"].data)
    from pylbl_tpu.spectroscopy import number_density
    for i in range(t.size):
        k = gas.absorption_coefficient(t[i], p[i], x[i], coarse_grid,
                                       remove_pedestal=True)
        expected = number_density(t[i], p[i], x[i]) * k[:coarse_grid.size]
        np.testing.assert_allclose(
            full.data_vars["H2O_absorption"].data[i, 0], expected,
            rtol=1e-12)


def test_streaming_writer_dimension_scales(tmp_path):
    """Streamed files carry the same netCDF-4 dimension-scale convention
    as Dataset.to_netcdf, so xarray/netCDF-C reconstruct dims."""
    import h5py
    import numpy as np
    from pylbl_tpu.utils.streaming import StreamingWriter

    grid = np.arange(1.0, 5.0, 0.5)
    path = tmp_path / "scales.nc"
    with StreamingWriter(path, 3, grid, ["a"],
                         extra_dims={"mechanism": 2}) as w:
        for i in range(3):
            w.write_state(i, {"a": np.full((2, grid.size), float(i))})
    with h5py.File(path) as f:
        assert f["wavenumber"].attrs["CLASS"] == b"DIMENSION_SCALE"
        for dim, size in (("state", 3), ("mechanism", 2)):
            assert f[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
            assert f[dim].attrs["NAME"].startswith(
                b"This is a netCDF dimension but not a netCDF variable.")
            assert f[dim].shape == (size,)
        assert [d[0].name.lstrip("/") for d in f["a"].dims] == \
            ["state", "mechanism", "wavenumber"]


def test_streamed_resume_skips_complete_states(tmp_path,
                                               atmosphere_dataset,
                                               coarse_grid):
    """compute_absorption_streamed(resume=True) must compute ONLY the
    pending states (the double-buffered loop dispatches an arbitrary,
    possibly non-contiguous pending set) and leave pre-written states
    untouched."""
    db = Database(tmp_path / "r.db")
    db.ingest_line_pack(synthetic_line_pack(num_lines=200, seed=21))
    spec = Spectroscopy(atmosphere_dataset, coarse_grid, db)
    full = spec.compute_absorption_streamed(tmp_path / "full.nc",
                                            block_layers=2)
    ref = open_dataset(full)["H2O_absorption"].data

    # Pre-populate states 0 and 2 with sentinels; resume must fill the
    # others with the real values and leave the sentinels alone.
    num_states = ref.shape[0]
    assert num_states >= 3
    import h5py
    import json
    with h5py.File(tmp_path / "full.nc", "r") as f:
        meta = json.loads(f.attrs["pylbl_tpu_stream"])
        var_names = meta["variables"]     # writer's gas order
        shape_tail = f[var_names[0]].shape[1:]
    path = tmp_path / "resume.nc"
    with StreamingWriter(path, num_states, coarse_grid, var_names,
                         extra_dims={"mechanism": shape_tail[0]}) as w:
        for i in (0, 2):
            w.write_state(i, {n: np.full(shape_tail, -7.0)
                              for n in var_names})
    out = spec.compute_absorption_streamed(path, block_layers=2)
    back = open_dataset(out)["H2O_absorption"].data
    assert np.all(back[0] == -7.0) and np.all(back[2] == -7.0)
    for i in range(num_states):
        if i in (0, 2):
            continue
        np.testing.assert_allclose(back[i], ref[i], rtol=1e-12)
