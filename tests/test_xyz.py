"""XMol .xyz trajectory I/O (io.xyz): round-trips, A<->nm units,
dispatch through io.trajectory and `spinrelax convert`, gzip, and
malformed-file errors."""

import gzip

import numpy as np
import pytest

from spinrelax_tpu.io import trajectory as trjio
from spinrelax_tpu.io import xyz as xyzio


def test_roundtrip_and_units(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(3, 5, 3))
    el = ["N", "H", "CA", "C", "O"]
    fn = str(tmp_path / "t.xyz")
    xyzio.write_xyz(fn, xyz, elements=el)
    el2, x2 = xyzio.read_xyz(fn)
    assert el2 == el
    np.testing.assert_allclose(x2, xyz, atol=1e-9)
    # disk is Angstrom: first coordinate field is 10x the nm value
    first = open(fn).read().splitlines()[2].split()
    assert abs(float(first[1]) - xyz[0, 0, 0] * 10.0) < 1e-7


def test_append_equals_single_write(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(4, 2, 3))
    one = str(tmp_path / "one.xyz")
    two = str(tmp_path / "two.xyz")
    comments = [f"frame {i}" for i in range(4)]
    xyzio.write_xyz(one, xyz, comments=comments)
    xyzio.write_xyz(two, xyz[:2], comments=comments[:2])
    xyzio.write_xyz(two, xyz[2:], comments=comments[2:], append=True)
    assert open(one).read() == open(two).read()


def test_trajectory_dispatch(tmp_path):
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(5, 3, 3))
    fn = str(tmp_path / "t.xyz")
    xyzio.write_xyz(fn, xyz)
    xa, _dt = trjio.load_trajectory(fn)
    np.testing.assert_allclose(xa, xyz, atol=1e-9)
    chunks = [c for c, dt in trjio.iter_trajectory(fn, 2, timestep=0.5)]
    assert [c.shape[0] for c in chunks] == [2, 2, 1]
    dts = {dt for _c, dt in trjio.iter_trajectory(fn, 2, timestep=0.5)}
    assert dts == {0.5}
    full = list(trjio.iter_trajectory_full(fn, 3))
    assert full[0][1] is None and full[0][2] is None
    np.testing.assert_allclose(
        np.concatenate([c for c, _b, _t in full]), xyz, atol=1e-9
    )


def test_gz(tmp_path):
    xyz = np.arange(12, dtype=float).reshape(2, 2, 3) / 17.0
    plain = str(tmp_path / "t.xyz")
    xyzio.write_xyz(plain, xyz)
    gz = plain + ".gz"
    with open(plain, "rb") as fi, gzip.open(gz, "wb") as fo:
        fo.write(fi.read())
    _el, x1 = xyzio.read_xyz(gz)
    np.testing.assert_allclose(x1, xyz, atol=1e-9)
    x2, _ = trjio.load_trajectory(gz)
    np.testing.assert_allclose(x2, xyz, atol=1e-9)


def test_convert_npz_to_xyz_and_back(tmp_path):
    from spinrelax_tpu.pipeline import cli

    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(6, 4, 3))
    src = str(tmp_path / "in.npz")
    np.savez(src, xyz=xyz, time=np.arange(6) * 2.0)
    out = str(tmp_path / "out.xyz")
    cli.main(["convert", "-f", src, "-o", out, "--batch", "2"])
    _el, x1 = xyzio.read_xyz(out)
    np.testing.assert_allclose(x1, xyz, atol=1e-8)
    back = str(tmp_path / "back.npz")
    cli.main(["convert", "-f", out, "-o", back, "--timestep", "2"])
    obj = np.load(back)
    np.testing.assert_allclose(obj["xyz"], xyz, atol=1e-8)
    assert float(obj["timestep"]) == 2.0


def test_malformed(tmp_path):
    fn = str(tmp_path / "bad.xyz")
    with open(fn, "w") as fp:
        fp.write("nonsense\n")
    with pytest.raises(xyzio.XyzError, match="atom count"):
        xyzio.read_xyz(fn)
    with open(fn, "w") as fp:
        fp.write("3\ncomment\nC 0 0 0\nC 1 1 1\n")  # truncated frame
    with pytest.raises(xyzio.XyzError, match="truncated"):
        xyzio.read_xyz(fn)
    with open(fn, "w") as fp:
        fp.write("1\nc\nC 0 0 0\n2\nc\nC 0 0 0\nC 1 1 1\n")
    with pytest.raises(xyzio.XyzError, match="atoms"):
        xyzio.read_xyz(fn)
    with open(fn, "w") as fp:
        fp.write("1\nc\nC 0 zero 0\n")
    with pytest.raises(xyzio.XyzError, match="non-numeric"):
        xyzio.read_xyz(fn)
    with open(fn, "w") as fp:
        fp.write("")
    with pytest.raises(xyzio.XyzError, match="no frames"):
        xyzio.read_xyz(fn)


def test_empty_elements_written_as_placeholder(tmp_path):
    """Blank element strings (blank PDB cols 77-78, unguessable .gro
    names) must not render 3-token rows that no XYZ reader accepts —
    write_xyz substitutes the 'X' placeholder (ADVICE r3)."""
    xyz = np.arange(6, dtype=float).reshape(1, 2, 3) / 7.0
    fn = str(tmp_path / "t.xyz")
    xyzio.write_xyz(fn, xyz, elements=["", "  "])
    el, x2 = xyzio.read_xyz(fn)
    assert el == ["X", "X"]
    np.testing.assert_allclose(x2, xyz, atol=1e-9)


def test_pdb_and_gro_timeless_detection(tmp_path):
    """Multi-MODEL .pdb never carries times; .gro only when titles have
    t= stamps — is_timeless must say so (ADVICE r3)."""
    from spinrelax_tpu.io import gro as groio
    from spinrelax_tpu.io import pdb as pdbio

    top = pdbio.Topology(
        atom_names=["N", "H"],
        res_seqs=np.array([1, 1]),
        res_names=["ALA"] * 2,
        chain_ids=["A"] * 2,
        occupancies=np.ones(2),
        elements=["N", "H"],
    )
    xyz = np.zeros((2, 2, 3))
    pdb_fn = str(tmp_path / "t.pdb")
    pdbio.write_pdb(pdb_fn, top, xyz)
    assert trjio.is_timeless(pdb_fn)

    stamped = str(tmp_path / "stamped.gro")
    groio.write_gro(stamped, top, xyz, times=np.array([0.0, 2.0]))
    assert not trjio.is_timeless(stamped)

    bare = str(tmp_path / "bare.gro")
    groio.write_gro(bare, top, xyz)
    assert trjio.is_timeless(bare)


def test_ct_stage_requires_timestep_for_timeless_formats(tmp_path):
    """.xyz (like bare .npy and .mdcrd) records no times: the ct stage
    must refuse to silently assume 1 ps (stages.py time-less guard)."""
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.pipeline import stages

    rng = np.random.default_rng(4)
    top = pdbio.Topology(
        atom_names=["N", "H"],
        res_seqs=np.array([2, 2]),
        res_names=["ALA"] * 2,
        chain_ids=["A"] * 2,
        occupancies=np.ones(2),
        elements=["N", "H"],
    )
    ref = str(tmp_path / "ref.pdb")
    base = rng.normal(size=(1, 2, 3))
    pdbio.write_pdb(ref, top, base)
    fn = str(tmp_path / "t.xyz")
    xyzio.write_xyz(fn, base[0][None].repeat(6, axis=0))
    with pytest.raises(ValueError, match="no time axis"):
        stages.stage_ct([fn], [ref], str(tmp_path / "o"), None)
    # with an explicit timestep the same input is accepted
    stages.stage_ct(
        [fn], [ref], str(tmp_path / "o"), 4.0, timestep=2.0
    )


def test_orient_stage_requires_timestep_for_timeless_formats(tmp_path):
    """stage_orientation writes the colvar TIME column that `spinrelax
    dq` later reads delta_t from — silently stamping 1 ps for a
    time-less trajectory would mis-scale every downstream lag time
    (round-4 review finding)."""
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.pipeline import stages

    rng = np.random.default_rng(6)
    top = pdbio.Topology(
        atom_names=["N", "H"],
        res_seqs=np.array([2, 2]),
        res_names=["ALA"] * 2,
        chain_ids=["A"] * 2,
        occupancies=np.ones(2),
        elements=["N", "H"],
    )
    ref = str(tmp_path / "ref.pdb")
    base = rng.normal(size=(4, 2, 3))
    pdbio.write_pdb(ref, top, base[:1])
    fn = str(tmp_path / "t.xyz")
    xyzio.write_xyz(fn, base)
    out = str(tmp_path / "colvar-q")
    with pytest.raises(ValueError, match="no time axis"):
        stages.stage_orientation([fn], ref, out)
    # explicit timestep: accepted, and the time column carries it
    stages.stage_orientation([fn], ref, out, timestep=2.5)
    from spinrelax_tpu.io import colvar as colvario

    _f, data = colvario.read_colvar(out)
    np.testing.assert_allclose(np.diff(data[0]), 2.5, atol=1e-9)


def test_gro_freetext_t_equals_title_is_timeless(tmp_path):
    """A free-text title containing 't=' with no parseable float (e.g.
    'run at t=equilibrium') carries no frame times: is_timeless must say
    True (ADVICE round 4 -- the old substring probe said False, silently
    bypassing the explicit-timestep guard), and read_gro must not crash
    float()-ing the non-numeric match."""
    from spinrelax_tpu.io import gro as groio

    fn = str(tmp_path / "freetext.gro")
    with open(fn, "w") as fp:
        fp.write("run at t=equilibrium\n")
        fp.write("    2\n")
        fp.write("    1ALA      N    1   0.000   0.000   0.000\n")
        fp.write("    1ALA      H    2   0.100   0.000   0.000\n")
        fp.write("   1.00000   1.00000   1.00000\n")
    assert trjio.is_timeless(fn)
    _top, xyz, _boxes, times = groio.read_gro(fn)
    assert times is None  # no parseable stamp -> unstamped
    assert xyz.shape == (1, 2, 3)

    # A genuinely stamped title still reads its time and probes False.
    fn2 = str(tmp_path / "stamped2.gro")
    with open(fn2, "w") as fp:
        fp.write("protein in water t=  125.00000 step= 250\n")
        fp.write("    2\n")
        fp.write("    1ALA      N    1   0.000   0.000   0.000\n")
        fp.write("    1ALA      H    2   0.100   0.000   0.000\n")
        fp.write("   1.00000   1.00000   1.00000\n")
    assert not trjio.is_timeless(fn2)
    _top, _xyz, _boxes, times2 = groio.read_gro(fn2)
    assert times2 is not None and times2[0] == 125.0
