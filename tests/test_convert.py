"""`spinrelax convert` — trjconv-style format conversion across every
native codec pair, with selections, frame windows/strides, and the
streamed-vs-buffered writer paths."""

import numpy as np
import pytest

from spinrelax_tpu.io import pdb as pdbio
from spinrelax_tpu.io import trajectory as trjio
from spinrelax_tpu.pipeline import cli


@pytest.fixture()
def fixture(tmp_path):
    rng = np.random.default_rng(17)
    names, rs, rn = [], [], []
    for r in range(1, 5):
        for nm in ("N", "H", "CA"):
            names.append(nm)
            rs.append(r)
            rn.append("ALA")
    n = len(names)
    top = pdbio.Topology(
        atom_names=names, res_seqs=np.array(rs), res_names=rn,
        chain_ids=[""] * n, occupancies=np.ones(n),
        elements=[nm[0] for nm in names],
    )
    nf = 17
    xyz = rng.uniform(0.0, 4.0, (nf, n, 3)).astype(np.float32)
    times = np.arange(nf, dtype=float) * 2.0
    boxes = np.zeros((nf, 3, 3))
    boxes[:, [0, 1, 2], [0, 1, 2]] = 5.0 + 0.01 * np.arange(nf)[:, None]
    top_fn = str(tmp_path / "top.pdb")
    pdbio.write_pdb(top_fn, top, xyz[:1])
    in_fn = str(tmp_path / "in.npz")
    np.savez(in_fn, xyz=xyz, time=times, box=boxes)
    return tmp_path, top, top_fn, in_fn, xyz, times, boxes


def _read_full(fn):
    xs, bs, ts = [], [], []
    for x, b, t in trjio.iter_trajectory_full(fn, 4):
        xs.append(x)
        if b is not None:
            bs.append(b)
        if t is not None:
            ts.append(t)
    return (
        np.concatenate(xs),
        np.concatenate(bs) if bs else None,
        np.concatenate(ts) if ts else None,
    )


@pytest.mark.parametrize("ext,atol_x,atol_b", [
    ("xtc", 5.1e-4, 1e-6),    # 0.001 nm quantisation
    ("trr", 1e-6, 1e-6),
    ("dcd", 1e-6, 1e-6),      # f32 A->nm rounding
    ("nc", 1e-6, 1e-6),
    ("gro", 5.1e-4, 5.1e-6),  # %8.3f text
    ("npz", 0.0, 0.0),
])
def test_round_trip_each_format(fixture, ext, atol_x, atol_b):
    tmp_path, top, top_fn, in_fn, xyz, times, boxes = fixture
    out = str(tmp_path / f"out.{ext}")
    cli.cmd_convert(["-f", in_fn, "-o", out, "-s", top_fn, "--batch", "5"])
    x2, b2, t2 = _read_full(out)
    assert x2.shape == xyz.shape
    np.testing.assert_allclose(x2, xyz, atol=atol_x or 1e-12)
    if ext != "npz":
        np.testing.assert_allclose(b2, boxes, atol=atol_b or 1e-12)
    if t2 is not None:
        np.testing.assert_allclose(t2, times, atol=1e-4)


def test_pdb_output_and_back(fixture):
    tmp_path, top, top_fn, in_fn, xyz, *_ = fixture
    out = str(tmp_path / "out.pdb")
    cli.cmd_convert(["-f", in_fn, "-o", out, "-s", top_fn])
    _, x2 = pdbio.read_pdb(out)
    np.testing.assert_allclose(x2, xyz, atol=6e-5)  # PDB Angstrom %8.3f


def test_selection_and_ndx(fixture):
    tmp_path, top, top_fn, in_fn, xyz, *_ = fixture
    sel = top.select("name N H")
    out = str(tmp_path / "sel.npz")
    cli.cmd_convert(["-f", in_fn, "-o", out, "-s", top_fn,
                     "--select", "name N H"])
    x2, _, _ = _read_full(out)
    np.testing.assert_array_equal(x2, xyz[:, sel])

    from spinrelax_tpu.io import ndx as ndxio

    ndx_fn = str(tmp_path / "g.ndx")
    ndxio.write_ndx(ndx_fn, {"NH": sel})
    out2 = str(tmp_path / "ndx.gro")
    cli.cmd_convert(["-f", in_fn, "-o", out2, "-s", top_fn,
                     "--ndx", ndx_fn, "--group", "NH"])
    from spinrelax_tpu.io import gro as groio

    top2, x3, _, _ = groio.read_gro(out2)
    assert top2.atom_names == [top.atom_names[i] for i in sel]
    np.testing.assert_allclose(x3, xyz[:, sel], atol=5.1e-4)


def test_window_and_skip(fixture):
    tmp_path, top, top_fn, in_fn, xyz, times, _ = fixture
    out = str(tmp_path / "win.npz")
    # frames at t in [4, 24], every 3rd -> t = 4, 10, 16, 22
    cli.cmd_convert(["-f", in_fn, "-o", out, "-b", "4", "-e", "24",
                     "--skip", "3", "--batch", "4"])
    x2, _, t2 = _read_full(out)
    np.testing.assert_allclose(t2, [4.0, 10.0, 16.0, 22.0])
    keep = [2, 5, 8, 11]
    np.testing.assert_array_equal(x2, xyz[keep])
    obj = np.load(out)
    assert float(obj["timestep"]) == pytest.approx(6.0)


def test_streamed_equals_one_chunk(fixture):
    """xtc/dcd/gro streaming appends must equal the single-chunk write."""
    tmp_path, top, top_fn, in_fn, *_ = fixture
    for ext in ("xtc", "dcd", "gro"):
        a = str(tmp_path / f"one.{ext}")
        b = str(tmp_path / f"many.{ext}")
        cli.cmd_convert(["-f", in_fn, "-o", a, "-s", top_fn,
                         "--batch", "100"])
        cli.cmd_convert(["-f", in_fn, "-o", b, "-s", top_fn,
                         "--batch", "3"])
        xa, ba, ta = _read_full(a)
        xb, bb, tb = _read_full(b)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ba, bb)
        if ta is not None and tb is not None:
            np.testing.assert_allclose(ta, tb, atol=1e-5)


def test_errors(fixture, tmp_path):
    _tmp, top, top_fn, in_fn, *_ = fixture
    with pytest.raises(SystemExit, match="unsupported output"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.foo")])
    with pytest.raises(SystemExit, match="needs a topology"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.gro")])
    with pytest.raises(SystemExit, match="needs a topology"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.npz"),
                         "--select", "name N"])
    with pytest.raises(SystemExit, match="matches no atoms"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.npz"),
                         "-s", top_fn, "--select", "name ZZ"])
    with pytest.raises(SystemExit, match="no frames selected"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.npz"),
                         "-b", "1e9"])
    with pytest.raises(SystemExit, match="skip"):
        cli.cmd_convert(["-f", in_fn, "-o", str(tmp_path / "x.npz"),
                         "--skip", "0"])


def test_boxless_input_chain(fixture):
    """npy (no boxes, no times) -> xtc -> dcd keeps coordinates."""
    tmp_path, top, top_fn, in_fn, xyz, *_ = fixture
    npy = str(tmp_path / "bare.npy")
    np.save(npy, xyz)
    mid = str(tmp_path / "mid.xtc")
    out = str(tmp_path / "fin.dcd")
    cli.cmd_convert(["-f", npy, "-o", mid, "--timestep", "3.0"])
    cli.cmd_convert(["-f", mid, "-o", out])
    x2, b2, t2 = _read_full(out)
    np.testing.assert_allclose(x2, xyz, atol=5.2e-4)
    np.testing.assert_allclose(t2, np.arange(len(xyz)) * 3.0, atol=1e-3)
