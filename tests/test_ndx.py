"""GROMACS index-file I/O (io/ndx.py) and its center-CLI wiring
(the reference feeds trjconv an auto-generated solute.ndx,
center-solute-gromacs.bash:51-68)."""

import numpy as np
import pytest

from spinrelax_tpu.io import ndx as ndxio
from spinrelax_tpu.io.ndx import NdxError


def test_round_trip(tmp_path):
    fn = str(tmp_path / "g.ndx")
    groups = {"System": np.arange(40), "Solute": np.arange(7, 23),
              "odd name 2": np.array([0, 39])}
    ndxio.write_ndx(fn, groups)
    back = ndxio.read_ndx(fn)
    assert list(back) == list(groups)
    for k in groups:
        np.testing.assert_array_equal(back[k], groups[k])
    # gmx-style 15 numbers per line
    lines = open(fn).read().splitlines()
    assert "[ System ]" in lines
    assert max(len(l.split()) for l in lines if not l.startswith("[")) == 15


def test_comments_and_duplicates(tmp_path):
    fn = tmp_path / "d.ndx"
    fn.write_text(
        "; header comment\n[ Protein ]\n1 2 3 ; inline\n\n"
        "[ Protein ]\n4 5\n[ Water ]\n6\n"
    )
    g = ndxio.read_ndx(str(fn))
    np.testing.assert_array_equal(g["Protein"], [0, 1, 2])  # first wins
    np.testing.assert_array_equal(g["Protein#2"], [3, 4])
    np.testing.assert_array_equal(g["Water"], [5])


def test_errors(tmp_path):
    fn = tmp_path / "bad.ndx"
    fn.write_text("1 2 3\n")
    with pytest.raises(NdxError, match="before any"):
        ndxio.read_ndx(str(fn))
    fn.write_text("[ G ]\n0 1\n")
    with pytest.raises(NdxError, match="1-based"):
        ndxio.read_ndx(str(fn))
    fn.write_text("[ G ]\nx\n")
    with pytest.raises(NdxError, match="non-integer"):
        ndxio.read_ndx(str(fn))
    fn.write_text("; only comments\n")
    with pytest.raises(NdxError, match="no .* sections"):
        ndxio.read_ndx(str(fn))


def test_group_mask_bounds():
    g = {"A": np.array([0, 9])}
    mask = ndxio.group_mask(g, "A", 10)
    assert mask.sum() == 2 and mask[0] and mask[9]
    with pytest.raises(NdxError, match="only 5 atoms"):
        ndxio.group_mask(g, "A", 5)
    with pytest.raises(NdxError, match="not in index file"):
        ndxio.group_mask(g, "B", 10)


def test_center_cli_ndx_equals_selection(tmp_path):
    """--ndx group == --solute expression (same atoms selected)."""
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.io import trajectory as trjio
    from spinrelax_tpu.pipeline import cli

    rng = np.random.default_rng(2)
    names, rs, rn = [], [], []
    for r in range(1, 4):
        for nm in ("N", "CA", "C"):
            names.append(nm)
            rs.append(r)
            rn.append("ALA")
    # two waters
    for r in (4, 5):
        names.append("OW")
        rs.append(r)
        rn.append("SOL")
    n = len(names)
    top = pdbio.Topology(
        atom_names=names, res_seqs=np.array(rs), res_names=rn,
        chain_ids=[""] * n, occupancies=np.ones(n),
        elements=[nm[0] for nm in names],
    )
    box = np.array([4.0, 4.0, 4.0])
    xyz = rng.uniform(0, 4, (3, n, 3))
    pdb_fn = str(tmp_path / "top.pdb")
    pdbio.write_pdb(pdb_fn, top, xyz[:1])
    np.savez(str(tmp_path / "t.npz"), xyz=xyz, time=np.arange(3.0))

    ndx_fn = str(tmp_path / "solute.ndx")
    ndxio.write_ndx(ndx_fn, {"Solute": top.select("resname ALA")})
    common = ["-f", str(tmp_path / "t.npz"), "-s", pdb_fn,
              "--box", "4,4,4", "--output-group", "solute"]
    cli.cmd_center(common + ["--solute", "resname ALA",
                             "-o", str(tmp_path / "sel.npz")])
    cli.cmd_center(common + ["--ndx", ndx_fn,
                             "-o", str(tmp_path / "ndx.npz")])
    a, _ = trjio.load_trajectory(str(tmp_path / "sel.npz"))
    b, _ = trjio.load_trajectory(str(tmp_path / "ndx.npz"))
    np.testing.assert_array_equal(a, b)

    # --write-ndx emits the derived group; read it back
    cli.cmd_center(common + ["--solute", "resname ALA",
                             "-o", str(tmp_path / "w.npz"),
                             "--write-ndx", str(tmp_path / "out.ndx")])
    g = ndxio.read_ndx(str(tmp_path / "out.ndx"))
    np.testing.assert_array_equal(g["Solute"], top.select("resname ALA"))

    # unknown group bails with the available names
    with pytest.raises(SystemExit, match="available: Solute"):
        cli.cmd_center(common + ["--ndx", ndx_fn, "--solute", "Nope",
                                 "-o", str(tmp_path / "x.npz")])
