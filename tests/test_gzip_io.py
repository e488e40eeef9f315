"""Transparent gzip support for the text formats (io.zopen).

The reference's mdtraj ingest reads .pdb.gz transparently, and PLUMED
colvars / GROMACS text outputs compress ~10x — every TEXT reader accepts
a .gz path; binary trajectory formats reject .gz with a clear error
(io/trajectory._dispatch_name)."""

import gzip
import os

import numpy as np
import pytest

from spinrelax_tpu.io import colvar as colvario
from spinrelax_tpu.io import gro as groio
from spinrelax_tpu.io import ndx as ndxio
from spinrelax_tpu.io import pdb as pdbio
from spinrelax_tpu.io import trajectory as trjio
from spinrelax_tpu.io import xvg
from spinrelax_tpu.io.zopen import fmt_name, topen


def _gzip_copy(src: str, dst: str):
    with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
        fo.write(fi.read())


def test_fmt_name():
    assert fmt_name("a/b.pdb.gz") == "a/b.pdb"
    assert fmt_name("a/b.pdb") == "a/b.pdb"


def _mini_topology(n=3):
    return pdbio.Topology(
        atom_names=["N", "H", "CA"][:n],
        res_seqs=np.arange(1, n + 1),
        res_names=["ALA"] * n,
        chain_ids=["A"] * n,
        occupancies=np.ones(n),
        elements=["N", "H", "C"][:n],
    )


def test_colvar_gz_read_matches_plain(tmp_path):
    rng = np.random.default_rng(0)
    names = ["time", "q.w", "q.x", "q.y", "q.z"]
    data = rng.normal(size=(5, 40))
    plain = str(tmp_path / "colvar.dat")
    colvario.write_colvar(plain, names, data)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    n0, d0 = colvario.read_colvar(plain)
    n1, d1 = colvario.read_colvar(gz)
    assert n0 == n1
    np.testing.assert_array_equal(d0, d1)
    assert colvario.count_colvar_rows(gz) == 40
    chunks = list(colvario.iter_colvar_chunks(gz, chunk_frames=16))
    np.testing.assert_allclose(
        np.concatenate([c for _, c in chunks], axis=0), d0.T
    )


def test_colvar_gz_write_roundtrip(tmp_path):
    names = ["time", "v"]
    data = np.arange(10.0).reshape(2, 5)
    gz = str(tmp_path / "out.dat.gz")
    colvario.write_colvar(gz, names, data)
    # really gzip bytes on disk
    with open(gz, "rb") as fp:
        assert fp.read(2) == b"\x1f\x8b"
    n1, d1 = colvario.read_colvar(gz)
    assert n1 == names
    np.testing.assert_allclose(d1, data, atol=1e-6)


def test_pdb_gz_structure_and_trajectory(tmp_path):
    top = _mini_topology()
    xyz = np.arange(2 * 3 * 3, dtype=float).reshape(2, 3, 3) / 10.0
    plain = str(tmp_path / "m.pdb")
    pdbio.write_pdb(plain, top, xyz)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    t0, x0 = pdbio.read_structure(plain)
    t1, x1 = pdbio.read_structure(gz)
    assert t1.atom_names == t0.atom_names
    np.testing.assert_array_equal(x0, x1)
    # trajectory dispatch looks through .gz
    xa, _ = trjio.load_trajectory(gz)
    np.testing.assert_array_equal(xa, x0)
    chunks = [c for c, _dt in trjio.iter_trajectory(gz, 1)]
    assert len(chunks) == 2
    # write_structure to .gz round-trips
    gz2 = str(tmp_path / "w.pdb.gz")
    pdbio.write_structure(gz2, top, xyz)
    t2, x2 = pdbio.read_structure(gz2)
    np.testing.assert_array_equal(x2, x0)


def test_gro_gz_matches_plain(tmp_path):
    top = _mini_topology()
    xyz = np.arange(9, dtype=float).reshape(1, 3, 3) / 100.0
    plain = str(tmp_path / "m.gro")
    groio.write_gro(plain, top, xyz)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    t1, x1, _b, _t = groio.read_gro(gz)
    t0, x0, _b0, _t0 = groio.read_gro(plain)
    np.testing.assert_array_equal(x0, x1)
    assert t1.atom_names == t0.atom_names
    # read_structure dispatches .gro.gz to the gro reader
    t2, x2 = pdbio.read_structure(gz)
    np.testing.assert_array_equal(x2, x0)


def test_xvg_gz(tmp_path):
    x = np.linspace(0.0, 1.0, 7)
    y = np.sin(x)
    plain = str(tmp_path / "d.xvg")
    xvg.print_xy(plain, x, y)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    x1, y1 = xvg.load_xy(gz)
    np.testing.assert_allclose(x1, x, atol=1e-6)
    np.testing.assert_allclose(y1, y, atol=1e-6)
    # and a .gz-written file reads back
    gz2 = str(tmp_path / "w.xvg.gz")
    xvg.print_xy(gz2, x, y)
    x2, _ = xvg.load_xy(gz2)
    np.testing.assert_allclose(x2, x, atol=1e-6)


def test_ndx_gz(tmp_path):
    plain = str(tmp_path / "g.ndx")
    ndxio.write_ndx(plain, {"Protein": [1, 2, 3], "Solute": [2, 4]})
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    g0 = ndxio.read_ndx(plain)
    g1 = ndxio.read_ndx(gz)
    assert list(g0) == list(g1)
    for k in g0:
        np.testing.assert_array_equal(g0[k], g1[k])


def test_mdcrd_gz(tmp_path):
    from spinrelax_tpu.io import amber

    top = _mini_topology()
    pdb_fn = str(tmp_path / "top.pdb")
    pdbio.write_pdb(pdb_fn, top, np.zeros((1, 3, 3)))
    xyz = np.arange(2 * 3 * 3, dtype=float).reshape(2, 3, 3) / 7.0
    plain = str(tmp_path / "t.mdcrd")
    amber.write_mdcrd(plain, xyz)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    x0, _ = trjio.load_trajectory(plain, top_fn=pdb_fn)
    x1, _ = trjio.load_trajectory(gz, top_fn=pdb_fn)
    np.testing.assert_array_equal(x0, x1)


def test_binary_gz_rejected(tmp_path):
    fn = str(tmp_path / "t.xtc.gz")
    with open(fn, "wb") as fp:
        fp.write(b"\x1f\x8b junk")
    with pytest.raises(ValueError, match="gunzip"):
        trjio.load_trajectory(fn)
    with pytest.raises(ValueError, match="gunzip"):
        list(trjio.iter_trajectory(fn, 8))
    with pytest.raises(ValueError, match="gunzip"):
        list(trjio.iter_trajectory_full(fn, 8))


def test_dq_cli_on_gz_colvar(tmp_path):
    """The dq stage artefacts from a gzipped colvar are byte-identical to
    the plain-file run (the reader path is the only difference)."""
    from spinrelax_tpu.pipeline import cli

    rng = np.random.default_rng(3)
    n = 200
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    names = ["time", "q.w", "q.x", "q.y", "q.z"]
    data = np.concatenate([np.arange(n)[None] * 2.0, q.T], axis=0)
    plain = str(tmp_path / "colvar.dat")
    colvario.write_colvar(plain, names, data)
    gz = plain + ".gz"
    _gzip_copy(plain, gz)
    args = ["--mindt", "4", "--maxdt", "40", "--skip", "4"]
    cli.main(["dq", "-f", plain, "-o", str(tmp_path / "a")] + args)
    cli.main(["dq", "-f", gz, "-o", str(tmp_path / "b")] + args)
    fa = str(tmp_path / "a-aniso2.dat")
    fb = str(tmp_path / "b-aniso2.dat")
    assert os.path.exists(fa) and os.path.exists(fb)
    with open(fa, "rb") as f1, open(fb, "rb") as f2:
        assert f1.read() == f2.read()


def test_convert_gz_text_outputs(tmp_path):
    """`convert -o out.pdb.gz/.xyz.gz/.gro.gz` writes real gzip (streamed
    outputs as multi-member gzip) that reads back; .gz on binary outputs
    is rejected with a clear error."""
    from spinrelax_tpu.io import xyz as xyzio
    from spinrelax_tpu.pipeline import cli

    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(5, 3, 3))
    src = str(tmp_path / "in.npz")
    np.savez(src, xyz=xyz, time=np.arange(5.0))
    out = str(tmp_path / "o.xyz.gz")
    cli.main(["convert", "-f", src, "-o", out, "--batch", "2"])
    with open(out, "rb") as fp:
        assert fp.read(2) == b"\x1f\x8b"
    _el, x1 = xyzio.read_xyz(out)
    np.testing.assert_allclose(x1, xyz, atol=1e-7)
    with pytest.raises(SystemExit, match="gzip binary"):
        cli.main(["convert", "-f", src, "-o", str(tmp_path / "o.xtc.gz")])
