"""GROMACS .gro ingest (io/gro.py) — round-trips, the manual's example
file, fixed-width corner cases, and dispatch through the structure/
trajectory loaders."""

import numpy as np
import pytest

from spinrelax_tpu.io import gro as groio
from spinrelax_tpu.io import pdb as pdbio
from spinrelax_tpu.io import trajectory as trjio
from spinrelax_tpu.io.gro import GroError

# The two-water example from the GROMACS manual's format description
# (velocities present, t= in the title) — spec text, not code.
MANUAL_EXAMPLE = """\
MD of 2 waters, t= 0.0
    6
    1WATER  OW1    1   0.126   1.624   1.679  0.1227 -0.0580  0.0434
    1WATER  HW2    2   0.190   1.661   1.747  0.8085  0.3191 -0.7791
    1WATER  HW3    3   0.177   1.568   1.613 -0.9045 -2.6469  1.3180
    2WATER  OW1    4   1.275   0.053   0.622  0.2519  0.3140 -0.1734
    2WATER  HW2    5   1.337   0.090   0.685 -1.7913 -0.8025 -1.4048
    2WATER  HW3    6   1.326   0.120   0.568  0.6414  0.5986 -0.5103
   1.82060   1.82060   1.82060
"""


def _write(tmp_path, text, name="x.gro"):
    fn = tmp_path / name
    fn.write_text(text)
    return str(fn)


def test_manual_example(tmp_path):
    fn = _write(tmp_path, MANUAL_EXAMPLE)
    top, xyz, boxes, times = groio.read_gro(fn)
    assert top.n_atoms == 6
    assert top.atom_names == ["OW1", "HW2", "HW3", "OW1", "HW2", "HW3"]
    assert top.res_names == ["WATER"] * 6
    assert list(top.res_seqs) == [1, 1, 1, 2, 2, 2]
    assert xyz.shape == (1, 6, 3)
    np.testing.assert_allclose(xyz[0, 0], [0.126, 1.624, 1.679])
    np.testing.assert_allclose(xyz[0, 5], [1.326, 0.120, 0.568])
    np.testing.assert_allclose(np.diag(boxes[0]), [1.8206] * 3)
    assert times[0] == 0.0
    # occupancy defaults keep every atom selectable (reference fit-atom
    # selections are 'occupancy > 0').
    assert len(top.select("occupancy > 0")) == 6


def _toy_top(n=4):
    return pdbio.Topology(
        atom_names=["N", "H", "CA", "C"][:n],
        res_seqs=np.arange(1, n + 1),
        res_names=["ALA"] * n,
        chain_ids=[""] * n,
        occupancies=np.ones(n),
        elements=["N", "H", "C", "C"][:n],
    )


def test_round_trip_multiframe(tmp_path):
    rng = np.random.default_rng(7)
    top = _toy_top()
    xyz = rng.uniform(-4, 4, (3, 4, 3))
    boxes = np.zeros((3, 3, 3))
    boxes[:, 0, 0] = boxes[:, 1, 1] = boxes[:, 2, 2] = [5.0, 5.1, 5.2]
    times = np.array([0.0, 2.5, 5.0])
    fn = str(tmp_path / "t.gro")
    groio.write_gro(fn, top, xyz, boxes=boxes, times=times)
    top2, xyz2, boxes2, times2 = groio.read_gro(fn)
    assert top2.atom_names == top.atom_names
    assert list(top2.res_seqs) == list(top.res_seqs)
    # %8.3f quantisation: 5e-4 nm.
    np.testing.assert_allclose(xyz2, xyz, atol=5.01e-4)
    np.testing.assert_allclose(boxes2, boxes, atol=5.01e-6)
    np.testing.assert_allclose(times2, times)


def test_triclinic_box_round_trip(tmp_path):
    top = _toy_top(1)
    box = np.array([[5.0, 0.0, 0.0], [1.2, 4.8, 0.0], [-0.7, 0.9, 4.5]])
    fn = str(tmp_path / "tri.gro")
    groio.write_gro(fn, top, np.zeros((1, 1, 3)), boxes=box[None])
    _, _, boxes2, _ = groio.read_gro(fn)
    np.testing.assert_allclose(boxes2[0], box, atol=5.01e-6)


def test_touching_negative_fields(tmp_path):
    # -100.000 fills the full %8.3f width: fields touch, whitespace
    # splitting would fuse them — the fixed-width parse must not.
    line = "    1ALA      N    1-100.000-200.000-300.000"
    fn = _write(tmp_path, f"touching\n    1\n{line}\n   1.0 1.0 1.0\n")
    _, xyz, _, _ = groio.read_gro(fn)
    np.testing.assert_allclose(xyz[0, 0], [-100.0, -200.0, -300.0])


def test_wide_ndec_fields(tmp_path):
    # gmx trjconv -ndec 5 writes %10.5f fields.
    line = "    1ALA      N    1   1.23456  -2.34567   3.45678"
    fn = _write(tmp_path, f"ndec5\n    1\n{line}\n   1.0 1.0 1.0\n")
    _, xyz, _, _ = groio.read_gro(fn)
    np.testing.assert_allclose(xyz[0, 0], [1.23456, -2.34567, 3.45678])


def test_random_ndec_round_trip(tmp_path):
    """Differential fuzz across gmx -ndec widths: atom lines are built
    directly at the format grammar (width = ndec+5, right-aligned,
    possibly touching) and must parse back exactly."""
    rng = np.random.default_rng(
        int(__import__("os").environ.get("SPINRELAX_TEST_SEED", "20260820"))
    )
    for _case in range(25):
        ndec = int(rng.integers(3, 9))
        w = ndec + 5
        n = int(rng.integers(1, 7))
        vel = bool(rng.integers(0, 2))
        xyz = np.round(rng.uniform(-99, 99, (n, 3)), ndec)
        vels = np.round(rng.uniform(-9, 9, (n, 3)), ndec + 1)
        lines = [f"fuzz ndec={ndec}", f"{n:5d}"]
        for i in range(n):
            pre = "%5d%-5s%5s%5d" % (i + 1, "ALA", "CA", i + 1)
            f = f"%{w}.{ndec}f"
            body = "".join(f % v for v in xyz[i])
            if vel:
                fv = f"%{w}.{ndec + 1}f"
                body += "".join(fv % v for v in vels[i])
            lines.append(pre + body)
        lines.append("   5.0 5.0 5.0")
        fn = _write(tmp_path, "\n".join(lines) + "\n", f"f{_case}.gro")
        _, got, _, _ = groio.read_gro(fn)
        np.testing.assert_allclose(got[0], xyz, atol=10.0 ** (-ndec) / 2)


def test_errors(tmp_path):
    with pytest.raises(GroError, match="no frames"):
        groio.read_gro(_write(tmp_path, "", "empty.gro"))
    with pytest.raises(GroError, match="atom count"):
        groio.read_gro(_write(tmp_path, "t\nxyz\n", "badn.gro"))
    with pytest.raises(GroError, match="truncated atom line"):
        groio.read_gro(_write(tmp_path, "t\n    2\n    1ALA      N    1   1.0   1.0   1.0\n", "trunc.gro"))
    with pytest.raises(GroError, match="box line"):
        groio.read_gro(_write(
            tmp_path,
            "t\n    1\n    1ALA      N    1   1.000   1.000   1.000\n",
            "nobox.gro"))
    # second frame with a different atom count
    bad = (
        "t\n    1\n    1ALA      N    1   1.000   1.000   1.000\n 1 1 1\n"
        "t\n    2\n    1ALA      N    1   1.000   1.000   1.000\n"
        "    1ALA      H    2   1.000   1.000   1.000\n 1 1 1\n"
    )
    with pytest.raises(GroError, match="atoms"):
        groio.read_gro(_write(tmp_path, bad, "mismatch.gro"))


def test_write_rejects_field_overflow(tmp_path):
    top = _toy_top(1)
    with pytest.raises(ValueError, match="%8.3f field"):
        groio.write_gro(
            str(tmp_path / "o.gro"), top, np.full((1, 1, 3), -1234.0)
        )


def test_structure_dispatch_matches_pdb(tmp_path):
    rng = np.random.default_rng(3)
    top = _toy_top()
    xyz = rng.uniform(0, 3, (1, 4, 3))
    pdb_fn = str(tmp_path / "s.pdb")
    gro_fn = str(tmp_path / "s.gro")
    pdbio.write_pdb(pdb_fn, top, xyz)
    pdbio.write_structure(gro_fn, top, xyz)
    t1, x1 = pdbio.read_structure(pdb_fn)
    t2, x2 = pdbio.read_structure(gro_fn)
    assert t1.atom_names == t2.atom_names
    assert list(t1.res_seqs) == list(t2.res_seqs)
    # PDB stores Angstrom at %8.3f (5e-5 nm), gro nm at %8.3f (5e-4 nm).
    np.testing.assert_allclose(x1, x2, atol=6e-4)
    # the selection DSL behaves identically on both topologies
    assert list(t1.select("name N and not resname PRO")) == \
        list(t2.select("name N and not resname PRO"))


def test_trajectory_loader_and_stream(tmp_path):
    rng = np.random.default_rng(11)
    top = _toy_top()
    xyz = rng.uniform(0, 3, (5, 4, 3))
    fn = str(tmp_path / "traj.gro")
    groio.write_gro(fn, top, xyz, times=np.arange(5) * 4.0)
    got, dt = trjio.load_trajectory(fn)
    np.testing.assert_allclose(got, xyz, atol=5.01e-4)
    assert dt == pytest.approx(4.0)
    chunks = list(trjio.iter_trajectory(fn, 2))
    assert [c.shape[0] for c, _dt in chunks] == [2, 2, 1]
    assert all(cdt == pytest.approx(4.0) for _c, cdt in chunks)
    np.testing.assert_allclose(
        np.concatenate([c for c, _dt in chunks]), got
    )
    # without t= stamps the caller's timestep wins
    groio.write_gro(fn, top, xyz)
    _, dt2 = next(trjio.iter_trajectory(fn, 2, timestep=7.0))
    assert dt2 == pytest.approx(7.0)


def test_ct_stage_accepts_gro(tmp_path):
    """`spinrelax ct -f traj.gro -s ref.gro` == the npz/pdb path at the
    .gro coordinate quantisation (pins the read_structure wiring in
    pipeline/stages.py)."""
    from spinrelax_tpu.pipeline import cli

    rng = np.random.default_rng(5)
    names, rs = [], []
    for r in range(1, 5):
        names += ["N", "H"]
        rs += [r, r]
    n = len(names)
    top = pdbio.Topology(
        atom_names=names, res_seqs=np.array(rs), res_names=["ALA"] * n,
        chain_ids=[""] * n, occupancies=np.ones(n),
        elements=[nm[0] for nm in names],
    )
    base = rng.uniform(0, 3, (n, 3))
    xyz = base[None] + rng.normal(0, 0.01, (24, n, 3))
    gro_fn = str(tmp_path / "traj.gro")
    groio.write_gro(gro_fn, top, xyz, times=np.arange(24) * 2.0)
    groio.write_gro(str(tmp_path / "ref.gro"), top, base[None])
    pdbio.write_pdb(str(tmp_path / "ref.pdb"), top, base[None])
    np.savez(str(tmp_path / "traj.npz"), xyz=xyz, time=np.arange(24) * 2.0)
    for tag, traj, ref in (
        ("g", "traj.gro", "ref.gro"), ("p", "traj.npz", "ref.pdb")
    ):
        cli.cmd_ct([
            "-f", str(tmp_path / traj), "-s", str(tmp_path / ref),
            "-o", str(tmp_path / tag), "-t", "16", "--Ct", "--S2",
        ])
    for suff in ("_Ctint.dat", "_S2.dat"):
        rows = []
        for tag in ("g", "p"):
            rows.append(np.array([
                [float(x) for x in l.split()]
                for l in open(str(tmp_path / tag) + suff)
                if l.strip() and not l.startswith(("#", "@", "&"))
            ]))
        np.testing.assert_allclose(rows[0], rows[1], atol=1e-5)


def test_rotate_cli_accepts_gro(tmp_path, monkeypatch):
    from spinrelax_tpu.pipeline import cli

    top = _toy_top()
    xyz = np.arange(12, dtype=float).reshape(1, 4, 3) / 10.0
    fn = str(tmp_path / "in.gro")
    out = str(tmp_path / "out.gro")
    groio.write_gro(fn, top, xyz)
    cli.cmd_rotate(["-f", fn, "-q", "1,0,0,0", "-o", out])
    _, xyz2, _, _ = groio.read_gro(out)
    np.testing.assert_allclose(xyz2, xyz, atol=1.01e-3)
