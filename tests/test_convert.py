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

    # index groups preserve their own atom ORDER (trjconv -n semantics)
    rev = sel[::-1]
    ndxio.write_ndx(ndx_fn, {"NH": rev})
    out3 = str(tmp_path / "rev.npz")
    cli.cmd_convert(["-f", in_fn, "-o", out3, "-s", top_fn,
                     "--ndx", ndx_fn, "--group", "NH"])
    x4, _, _ = _read_full(out3)
    np.testing.assert_array_equal(x4, xyz[:, rev])
    with pytest.raises(SystemExit, match="needs --ndx"):
        cli.cmd_convert(["-f", in_fn, "-o", out3, "-s", top_fn,
                         "--group", "NH"])
    ndxio.write_ndx(ndx_fn, {"NH": np.array([1, 1, 2])})
    with pytest.raises(SystemExit, match="twice"):
        cli.cmd_convert(["-f", in_fn, "-o", out3, "-s", top_fn,
                         "--ndx", ndx_fn, "--group", "NH"])


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


def test_superpose(fixture):
    """--superpose: rotated/translated frames land back on the
    reference (trjconv -fit rot+trans semantics)."""
    from spinrelax_tpu.core import quaternion as qt
    import jax.numpy as jnp

    import jax

    tmp_path, top, top_fn, in_fn, xyz, times, boxes = fixture
    base = xyz[0]
    rng = np.random.default_rng(4)
    qs = qt.random_quats(jax.random.PRNGKey(4), 6, dtype=jnp.float32)
    frames = np.asarray(
        qt.rotate_vector(jnp.asarray(np.broadcast_to(
            base - base.mean(0), (6,) + base.shape).copy()),
            jnp.asarray(qs)[:, None, :])
    ) + rng.uniform(-2, 2, (6, 1, 3))
    mov = str(tmp_path / "mov.npz")
    np.savez(mov, xyz=frames, time=np.arange(6.0))
    ref_fn = str(tmp_path / "fitref.pdb")
    pdbio.write_pdb(ref_fn, top, (base - base.mean(0))[None])
    out = str(tmp_path / "fit.npz")
    cli.cmd_convert(["-f", mov, "-o", out, "-s", top_fn,
                     "--superpose", ref_fn])
    x2, _, _ = _read_full(out)
    # every frame superposed onto the centred reference
    np.testing.assert_allclose(
        x2, np.broadcast_to(base - base.mean(0), x2.shape), atol=2e-4
    )


def test_info_command(fixture, capsys):
    tmp_path, top, top_fn, in_fn, xyz, times, boxes = fixture
    outs = {}
    for ext in ("xtc", "trr", "dcd", "nc", "gro"):
        out = str(tmp_path / f"i.{ext}")
        cli.cmd_convert(["-f", in_fn, "-o", out, "-s", top_fn])
        outs[ext] = out
    capsys.readouterr()  # drop the converters' own output
    cli.cmd_info([in_fn] + list(outs.values()))
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 6
    for line in lines:
        assert "17 frames x 12 atoms" in line, line
        assert "dt 2 ps" in line, line
        assert "t 0..32 ps" in line, line
    # box shown for the box-carrying formats
    for ext in ("xtc", "trr", "nc", "gro"):
        line = [l for l in lines if outs[ext] in l][0]
        assert "box 5x5x5 nm" in line or "box 5.0" in line.replace("x5", " 5"), line
    # corrupt file -> nonzero exit, per-file error line
    bad = str(tmp_path / "bad.xtc")
    with open(bad, "wb") as fp:
        fp.write(b"\x00" * 10)
    with pytest.raises(SystemExit):
        cli.cmd_info([bad])
    assert "ERROR" in capsys.readouterr().out


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


def test_npy_output(fixture, capsys):
    tmp_path, top, top_fn, in_fn, xyz, times, boxes = fixture
    out = str(tmp_path / "o.npy")
    cli.cmd_convert(["-f", in_fn, "-o", out])
    got = np.load(out)
    np.testing.assert_array_equal(got, xyz)
    assert "--timestep 2" in capsys.readouterr().out


def test_out_top(fixture):
    tmp_path, top, top_fn, in_fn, xyz, *_ = fixture
    out = str(tmp_path / "sub.dcd")
    sub_top = str(tmp_path / "sub.gro")
    cli.cmd_convert(["-f", in_fn, "-o", out, "-s", top_fn,
                     "--select", "name CA", "--out-top", sub_top])
    from spinrelax_tpu.io import gro as groio

    t2, x2, _, _ = groio.read_gro(sub_top)
    sel = top.select("name CA")
    assert t2.atom_names == [top.atom_names[i] for i in sel]
    np.testing.assert_allclose(x2[0], xyz[0, sel], atol=5.1e-4)
    with pytest.raises(SystemExit, match="needs a topology"):
        cli.cmd_convert(["-f", in_fn, "-o", out, "--out-top", sub_top])


def test_format_chain(fixture, tmp_path):
    """npz -> trr -> dcd -> nc -> gro -> npz: coordinates/boxes/times
    survive the full format chain within the coarsest quantisation."""
    tmp_path_, top, top_fn, in_fn, xyz, times, boxes = fixture
    chain = ["c1.trr", "c2.dcd", "c3.nc", "c4.gro", "c5.npz"]
    src = in_fn
    for name in chain:
        dst = str(tmp_path_ / name)
        cli.cmd_convert(["-f", src, "-o", dst, "-s", top_fn])
        src = dst
    x2, b2, t2 = _read_full(src)
    np.testing.assert_allclose(x2, xyz, atol=6e-4)   # gro %8.3f nm
    np.testing.assert_allclose(b2, boxes, atol=1e-4)
    np.testing.assert_allclose(t2, times, atol=1e-3)
