"""Amber NetCDF ingest: convention mapping (Angstrom->nm, ps time, cell
-> box matrices), streaming, dispatch, and rejection of non-AMBER files."""

import numpy as np
import pytest

from spinrelax_tpu.io import amber
from spinrelax_tpu.io.trajectory import iter_trajectory, load_trajectory


def _rand_xyz(rng, n_frames=5, n_atoms=11):
    return rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32) * 2.0


def test_roundtrip(tmp_path, rng):
    fn = str(tmp_path / "t.nc")
    xyz = _rand_xyz(rng)
    amber.write_nc(fn, xyz, timestep_ps=2.0)
    back, boxes, times = amber.read_nc(fn)
    assert boxes is None
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.diff(times), 2.0, rtol=1e-6)


def test_roundtrip_boxes(tmp_path, rng):
    fn = str(tmp_path / "t.nc")
    xyz = _rand_xyz(rng, n_frames=3)
    boxes = np.repeat(np.diag([4.0, 5.0, 6.0])[None], 3, axis=0)
    amber.write_nc(fn, xyz, boxes=boxes)
    _, bboxes, _ = amber.read_nc(fn)
    np.testing.assert_allclose(bboxes, boxes, rtol=1e-12, atol=1e-12)


def test_triclinic_angles_decode(tmp_path, rng):
    """Hand-build a file with non-90 cell angles through scipy directly
    (independent of write_nc, which is orthorhombic-only)."""
    from scipy.io import netcdf_file

    fn = str(tmp_path / "tri.nc")
    nc = netcdf_file(fn, "w")
    nc.Conventions = "AMBER"
    nc.createDimension("frame", None)
    nc.createDimension("atom", 2)
    nc.createDimension("spatial", 3)
    nc.createDimension("cell_spatial", 3)
    nc.createDimension("cell_angular", 3)
    v = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
    v[:] = np.zeros((1, 2, 3), np.float32)
    vl = nc.createVariable("cell_lengths", "d", ("frame", "cell_spatial"))
    vl[:] = np.array([[50.0, 50.0, 50.0]])
    va = nc.createVariable("cell_angles", "d", ("frame", "cell_angular"))
    va[:] = np.array([[60.0, 60.0, 90.0]])
    nc.close()
    _, boxes, _ = amber.read_nc(fn)
    b = boxes[0]
    # Lengths preserved, angles reproduced by the box-vector geometry.
    for row in b:
        assert np.linalg.norm(row) == pytest.approx(5.0, rel=1e-12)
    cos_alpha = b[1] @ b[2] / 25.0
    assert cos_alpha == pytest.approx(np.cos(np.deg2rad(60.0)), rel=1e-12)


def test_iter_matches_read(tmp_path, rng):
    fn = str(tmp_path / "t.nc")
    xyz = _rand_xyz(rng, n_frames=7)
    amber.write_nc(fn, xyz, boxes=np.repeat(np.diag([3.0, 3.0, 3.0])[None], 7, 0),
                   timestep_ps=0.5)
    whole, wboxes, wtimes = amber.read_nc(fn)
    cx, cb, ct = zip(*amber.iter_nc(fn, 3))
    assert [c.shape[0] for c in cx] == [3, 3, 1]
    np.testing.assert_array_equal(np.concatenate(cx), whole)
    np.testing.assert_array_equal(np.concatenate(cb), wboxes)
    np.testing.assert_allclose(np.concatenate(ct), wtimes, rtol=1e-12)


def test_dispatch(tmp_path, rng):
    fn = str(tmp_path / "t.nc")
    xyz = _rand_xyz(rng, n_frames=6, n_atoms=4)
    amber.write_nc(fn, xyz, timestep_ps=2.5)
    got, dt = load_trajectory(fn)
    np.testing.assert_allclose(got, xyz, rtol=1e-6, atol=1e-7)
    assert dt == pytest.approx(2.5, rel=1e-6)
    chunks = list(iter_trajectory(fn, 1))
    assert len(chunks) == 6
    assert chunks[0][1] == pytest.approx(2.5, rel=1e-6)


def test_non_amber_rejected(tmp_path):
    from scipy.io import netcdf_file

    fn = str(tmp_path / "x.nc")
    nc = netcdf_file(fn, "w")
    nc.Conventions = "CF-1.6"
    nc.createDimension("d", 1)
    v = nc.createVariable("v", "f", ("d",))
    v[:] = np.zeros(1, np.float32)
    nc.close()
    with pytest.raises(amber.AmberNcError, match="not an AMBER"):
        amber.read_nc(fn)


def test_garbage_rejected(tmp_path):
    fn = str(tmp_path / "g.nc")
    open(fn, "wb").write(b"\x13" * 256)
    with pytest.raises(amber.AmberNcError, match="not a classic NetCDF"):
        amber.read_nc(fn)
