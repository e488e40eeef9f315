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


class TestMdcrd:
    """Amber ASCII trajectory (.mdcrd/.crd) ingest."""

    def _roundtrip(self, tmp_path, rng, boxes):
        from spinrelax_tpu.io import amber

        xyz = rng.uniform(0, 4, (5, 7, 3)).astype(np.float32)
        fn = str(tmp_path / "t.mdcrd")
        amber.write_mdcrd(fn, xyz, boxes=boxes)
        got, gb, times = amber.read_mdcrd(fn, 7)
        # 8.3f Angstrom quantisation = 5e-5 nm
        np.testing.assert_allclose(got, xyz, atol=5.1e-5)
        assert times is None
        return gb

    def test_round_trip_plain(self, tmp_path, rng):
        assert self._roundtrip(tmp_path, rng, None) is None

    def test_round_trip_boxed(self, tmp_path, rng):
        boxes = np.zeros((5, 3, 3))
        boxes[:, [0, 1, 2], [0, 1, 2]] = [4.0, 5.0, 6.0]
        gb = self._roundtrip(tmp_path, rng, boxes)
        np.testing.assert_allclose(gb, boxes, atol=5.1e-5)

    def test_wrong_natoms_errors(self, tmp_path, rng):
        from spinrelax_tpu.io import amber

        xyz = rng.uniform(0, 4, (3, 7, 3)).astype(np.float32)
        fn = str(tmp_path / "t.mdcrd")
        amber.write_mdcrd(fn, xyz)
        with pytest.raises(amber.AmberNcError, match="whole number"):
            amber.read_mdcrd(fn, 11)

    def test_ambiguous_layout_demands_flag(self, tmp_path):
        from spinrelax_tpu.io import amber

        # natoms=1: per-frame 3 without box, 6 with box; 6 values divide
        # both ways -> must refuse to guess.
        fn = str(tmp_path / "a.crd")
        fn_obj = open(fn, "w")
        fn_obj.write("t\n" + "".join("%8.3f" % v for v in range(6)) + "\n")
        fn_obj.close()
        with pytest.raises(amber.AmberNcError, match="ambiguous"):
            amber.read_mdcrd(fn, 1)
        got, boxes, _ = amber.read_mdcrd(fn, 1, has_box=False)
        assert got.shape == (2, 1, 3) and boxes is None
        got, boxes, _ = amber.read_mdcrd(fn, 1, has_box=True)
        assert got.shape == (1, 1, 3) and boxes.shape == (1, 3, 3)

    def test_trajectory_dispatch_needs_topology(self, tmp_path, rng):
        from spinrelax_tpu.io import amber
        from spinrelax_tpu.io import pdb as pdbio
        from spinrelax_tpu.io.trajectory import (
            iter_trajectory, iter_trajectory_full, load_trajectory)

        # 5 frames x 3 atoms = 45 values: divisible by 9, not by 12,
        # so the box auto-detect is unambiguous.
        xyz = rng.uniform(0, 4, (5, 3, 3)).astype(np.float32)
        fn = str(tmp_path / "t.mdcrd")
        amber.write_mdcrd(fn, xyz)
        with pytest.raises(ValueError, match="topology"):
            load_trajectory(fn)
        top = pdbio.Topology(
            atom_names=["N", "H", "CA"], res_seqs=np.array([1, 1, 1]),
            res_names=["ALA"] * 3, chain_ids=[""] * 3,
            occupancies=np.ones(3), elements=["N", "H", "C"],
        )
        top_fn = str(tmp_path / "top.pdb")
        pdbio.write_pdb(top_fn, top, xyz[:1])
        got, dt = load_trajectory(fn, top_fn=top_fn)
        np.testing.assert_allclose(got, xyz, atol=5.1e-5)
        chunks = list(iter_trajectory(fn, 3, top_fn=top_fn, timestep=2.5))
        assert [c.shape[0] for c, _ in chunks] == [3, 2]
        assert all(d == 2.5 for _, d in chunks)
        full = list(iter_trajectory_full(fn, 3, top_fn=top_fn))
        assert full[0][1] is None and full[0][2] is None

    def test_convert_from_mdcrd(self, tmp_path, rng):
        from spinrelax_tpu.io import amber
        from spinrelax_tpu.io import pdb as pdbio
        from spinrelax_tpu.pipeline import cli

        xyz = rng.uniform(0, 4, (4, 3, 3)).astype(np.float32)
        fn = str(tmp_path / "t.crd")
        boxes = np.zeros((4, 3, 3))
        boxes[:, [0, 1, 2], [0, 1, 2]] = 5.0
        amber.write_mdcrd(fn, xyz, boxes=boxes)
        top = pdbio.Topology(
            atom_names=["N", "H", "CA"], res_seqs=np.array([1, 1, 1]),
            res_names=["ALA"] * 3, chain_ids=[""] * 3,
            occupancies=np.ones(3), elements=["N", "H", "C"],
        )
        top_fn = str(tmp_path / "top.pdb")
        pdbio.write_pdb(top_fn, top, xyz[:1])
        out = str(tmp_path / "o.nc")
        cli.cmd_convert(["-f", fn, "-o", out, "-s", top_fn,
                         "--timestep", "4.0"])
        x2, b2, t2 = amber.read_nc(out)
        np.testing.assert_allclose(x2, xyz, atol=5.1e-5)
        np.testing.assert_allclose(b2, boxes, atol=5.1e-5)
        np.testing.assert_allclose(t2, np.arange(4) * 4.0)


    def test_info_mdcrd(self, tmp_path, rng, capsys):
        from spinrelax_tpu.io import amber
        from spinrelax_tpu.io import pdb as pdbio
        from spinrelax_tpu.pipeline import cli

        xyz = rng.uniform(0, 4, (5, 3, 3)).astype(np.float32)
        fn = str(tmp_path / "t.mdcrd")
        amber.write_mdcrd(fn, xyz)
        top = pdbio.Topology(
            atom_names=["N", "H", "CA"], res_seqs=np.array([1, 1, 1]),
            res_names=["ALA"] * 3, chain_ids=[""] * 3,
            occupancies=np.ones(3), elements=["N", "H", "C"],
        )
        top_fn = str(tmp_path / "top.pdb")
        pdbio.write_pdb(top_fn, top, xyz[:1])
        cli.cmd_info([fn, "-s", top_fn])
        out = capsys.readouterr().out
        assert "5 frames x 3 atoms" in out and "no timestep" in out
