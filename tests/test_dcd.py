"""Native DCD codec: round-trips, independent big-endian/X-PLOR
construction, unit-cell conventions, malformed-file errors, and the
trajectory-layer dispatch."""

import struct

import numpy as np
import pytest

from spinrelax_tpu.io import dcd
from spinrelax_tpu.io.trajectory import iter_trajectory, load_trajectory


def _rand_xyz(rng, n_frames=5, n_atoms=17):
    return rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32) * 2.0


def test_roundtrip_plain(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng)
    dcd.write_dcd(fn, xyz, timestep_ps=2.0)
    back, boxes, times = dcd.read_dcd(fn)
    assert boxes is None
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.diff(times), 2.0, rtol=1e-6)


def test_roundtrip_orthorhombic_box(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=3)
    box = np.diag([4.0, 5.0, 6.0])
    boxes = np.repeat(box[None], 3, axis=0)
    dcd.write_dcd(fn, xyz, boxes=boxes, timestep_ps=1.0)
    back, bboxes, _ = dcd.read_dcd(fn)
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(bboxes, boxes, rtol=1e-12, atol=1e-12)


def test_roundtrip_triclinic_box(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=2)
    # GROMACS-convention lower-triangular triclinic box.
    box = np.array([[5.0, 0.0, 0.0], [1.2, 4.8, 0.0], [0.9, 1.1, 4.5]])
    boxes = np.repeat(box[None], 2, axis=0)
    dcd.write_dcd(fn, xyz, boxes=boxes)
    _, bboxes, _ = dcd.read_dcd(fn)
    # Lengths and angles survive (the DCD cell stores a,b,c + cosines);
    # the reconstructed box is the same cell in the same convention.
    np.testing.assert_allclose(bboxes, boxes, rtol=1e-10, atol=1e-10)


def _write_bigendian_xplor(fn, xyz, delta_ps_per_frame):
    """Independent hand construction: BIG-endian, X-PLOR layout (DELTA as
    a float64 across icntrl[9:11], no CHARMM flag, no cell records).
    Deliberately not using write_dcd so the reader is checked against a
    second implementation of the spec, not against itself."""
    n_frames, natoms = xyz.shape[:2]

    def rec(body):
        return struct.pack(">i", len(body)) + body + struct.pack(">i", len(body))

    delta_akma = delta_ps_per_frame / dcd.AKMA_PS  # nsavc = 1
    blk = b"CORD"
    blk += struct.pack(">9i", n_frames, 1, 1, n_frames, 0, 0, 0, 0, 0)
    blk += struct.pack(">d", delta_akma)  # icntrl[9:11]
    blk += struct.pack(">9i", *([0] * 9))  # icntrl[11:20]; [19]=0 -> X-PLOR
    with open(fn, "wb") as fp:
        fp.write(rec(blk))
        fp.write(rec(struct.pack(">i", 1) + b"X" * 80))
        fp.write(rec(struct.pack(">i", natoms)))
        for f in range(n_frames):
            # Scale FIRST, then cast: numpy ufuncs return native-endian
            # results, which would silently drop the big-endian order.
            ang = (np.asarray(xyz[f], np.float32) * 10.0).astype(">f4")
            for k in range(3):
                fp.write(rec(ang[:, k].tobytes()))


def test_bigendian_xplor_reads(tmp_path, rng):
    fn = str(tmp_path / "be.dcd")
    xyz = _rand_xyz(rng, n_frames=4, n_atoms=9)
    _write_bigendian_xplor(fn, xyz, delta_ps_per_frame=0.5)
    back, boxes, times = dcd.read_dcd(fn)
    assert boxes is None
    np.testing.assert_allclose(back, xyz, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.diff(times), 0.5, rtol=1e-6)


def test_degree_form_angles(tmp_path, rng):
    """Older CHARMM writers store the cell angles in DEGREES, not
    cosines; an orthorhombic 90/90/90 cell must decode identically."""
    fn = str(tmp_path / "deg.dcd")
    xyz = _rand_xyz(rng, n_frames=1, n_atoms=4)
    dcd.write_dcd(fn, xyz, boxes=np.diag([3.0, 4.0, 5.0])[None])
    raw = bytearray(open(fn, "rb").read())
    # Patch the three cosine slots (0.0) of the first cell record to 90.0.
    # Cell record starts right after header+title+natoms records.
    off = 0
    for _ in range(3):  # skip three header records
        (n,) = struct.unpack_from("<i", raw, off)
        off += 4 + n + 4
    (n,) = struct.unpack_from("<i", raw, off)
    assert n == 48
    a, cg, b, cb, ca, c = struct.unpack_from("<6d", raw, off + 4)
    assert cg == cb == ca == 0.0
    struct.pack_into("<6d", raw, off + 4, a, 90.0, b, 90.0, 90.0, c)
    fn2 = str(tmp_path / "deg2.dcd")
    open(fn2, "wb").write(bytes(raw))
    _, boxes, _ = dcd.read_dcd(fn2)
    np.testing.assert_allclose(boxes[0], np.diag([3.0, 4.0, 5.0]),
                               rtol=1e-12, atol=1e-12)


def test_truncated_frame_raises(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    dcd.write_dcd(fn, _rand_xyz(rng, n_frames=3))
    raw = open(fn, "rb").read()
    fn2 = str(tmp_path / "cut.dcd")
    open(fn2, "wb").write(raw[:-30])  # cut inside the last frame
    with pytest.raises(dcd.DcdError, match="truncated|corrupt"):
        dcd.read_dcd(fn2)


def test_not_a_dcd_raises(tmp_path):
    fn = str(tmp_path / "no.dcd")
    open(fn, "wb").write(b"\x00" * 200)
    with pytest.raises(dcd.DcdError, match="not a DCD"):
        dcd.read_dcd(fn)


def test_fixed_atoms_rejected(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    dcd.write_dcd(fn, _rand_xyz(rng, n_frames=1))
    raw = bytearray(open(fn, "rb").read())
    # icntrl[8] (nfixed) sits at record offset 4 (marker) + 4 (CORD) + 8*4.
    struct.pack_into("<i", raw, 4 + 4 + 8 * 4, 3)
    fn2 = str(tmp_path / "fixed.dcd")
    open(fn2, "wb").write(bytes(raw))
    with pytest.raises(dcd.DcdError, match="fixed-atom"):
        dcd.read_dcd(fn2)


def test_stale_header_framecount(tmp_path, rng):
    """Crashed runs leave the header frame count ahead of the file; the
    reader trusts EOF, not the header."""
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=4)
    dcd.write_dcd(fn, xyz)
    raw = bytearray(open(fn, "rb").read())
    struct.pack_into("<i", raw, 4 + 4, 99)  # icntrl[0] = 99 frames
    fn2 = str(tmp_path / "stale.dcd")
    open(fn2, "wb").write(bytes(raw))
    back, _, _ = dcd.read_dcd(fn2)
    assert back.shape[0] == 4


def test_iter_matches_read(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=7)
    boxes = np.repeat(np.diag([3.0, 3.0, 3.0])[None], 7, axis=0)
    dcd.write_dcd(fn, xyz, boxes=boxes, timestep_ps=0.25)
    whole, wboxes, wtimes = dcd.read_dcd(fn)
    got_x, got_b, got_t = [], [], []
    for cx, cb, ct in dcd.iter_dcd(fn, 3):
        got_x.append(cx)
        got_b.append(cb)
        got_t.append(ct)
    assert [c.shape[0] for c in got_x] == [3, 3, 1]
    np.testing.assert_array_equal(np.concatenate(got_x), whole)
    np.testing.assert_array_equal(np.concatenate(got_b), wboxes)
    np.testing.assert_allclose(np.concatenate(got_t), wtimes, rtol=1e-12)


def test_trajectory_layer_dispatch(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=6, n_atoms=5)
    dcd.write_dcd(fn, xyz, timestep_ps=2.5)
    got, dt = load_trajectory(fn)
    np.testing.assert_allclose(got, xyz, rtol=1e-6, atol=1e-7)
    assert dt == pytest.approx(2.5, rel=1e-6)
    # Streaming: dt correct from the FIRST chunk even at chunk_frames=1.
    chunks = list(iter_trajectory(fn, 1))
    assert len(chunks) == 6
    assert chunks[0][1] == pytest.approx(2.5, rel=1e-6)
    np.testing.assert_allclose(
        np.concatenate([c for c, _ in chunks]), xyz, rtol=1e-6, atol=1e-7
    )


def test_center_cli_streams_dcd(tmp_path, rng):
    """spinrelax center accepts a DCD with crystal records through the
    streamed branch and matches the npz-fed result."""
    from spinrelax_tpu.io.pdb import Topology, write_pdb
    from spinrelax_tpu.pipeline import cli

    box = np.array([5.0, 5.0, 5.0])
    chain = np.cumsum(rng.normal(scale=0.1, size=(12, 3)), axis=0) + 4.8
    waters = np.concatenate(
        [np.stack([o, o + [0.08, 0, 0], o + [0, 0.08, 0]])
         for o in rng.uniform(0, 5, size=(4, 3))]
    )
    xyz = np.mod(np.concatenate([chain, waters]), box).astype(np.float32)
    n = xyz.shape[0]
    top = Topology(
        atom_names=["CA"] * 12
        + [a for _ in range(4) for a in ("OW", "HW1", "HW2")],
        res_seqs=np.concatenate(
            [np.arange(1, 13), np.repeat(np.arange(50, 54), 3)]
        ),
        res_names=["GLY"] * 12 + ["SOL"] * 12,
        chain_ids=["A"] * 12 + ["W"] * 12,
        occupancies=np.ones(n),
        elements=[""] * n,
    )
    write_pdb(str(tmp_path / "top.pdb"), top, xyz[None])
    frames = np.stack([xyz, xyz])
    np.savez(tmp_path / "in.npz", xyz=frames,
             time=np.array([0.0, 1.0]), box=np.stack([box, box]))
    dcd.write_dcd(str(tmp_path / "in.dcd"), frames,
                  boxes=np.repeat(np.diag(box)[None], 2, axis=0),
                  timestep_ps=1.0)
    for src, out in (("in.npz", "a.npz"), ("in.dcd", "b.npz")):
        cli.main(["center", "-f", str(tmp_path / src),
                  "-s", str(tmp_path / "top.pdb"),
                  "-o", str(tmp_path / out), "--batch", "1"])
    a = np.load(tmp_path / "a.npz")["xyz"]
    b = np.load(tmp_path / "b.npz")["xyz"]
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_unset_delta_falls_back_to_caller(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    xyz = _rand_xyz(rng, n_frames=2)
    dcd.write_dcd(fn, xyz, timestep_ps=0.0)  # writer leaves DELTA unset
    chunks = list(iter_trajectory(fn, 2, timestep=7.0))
    assert chunks[0][1] == pytest.approx(7.0)


def test_append_matches_single_write(tmp_path, rng):
    """write_dcd(append=True) extends the file and patches the header
    counts: chunked writes must be byte-identical to one write, and the
    layout/atom-count guards must fire."""
    xyz = _rand_xyz(rng, n_frames=7)
    boxes = np.broadcast_to(np.diag([4.0, 5.0, 6.0]), (7, 3, 3)).copy()
    one = str(tmp_path / "one.dcd")
    many = str(tmp_path / "many.dcd")
    dcd.write_dcd(one, xyz, boxes=boxes, timestep_ps=2.0)
    dcd.write_dcd(many, xyz[:3], boxes=boxes[:3], timestep_ps=2.0)
    dcd.write_dcd(many, xyz[3:5], boxes=boxes[3:5], append=True)
    dcd.write_dcd(many, xyz[5:], boxes=boxes[5:], append=True)
    a = open(one, "rb").read()
    b = open(many, "rb").read()
    # header NSET/NSTEP patched to the full count -> files byte-equal
    # except NSAVC-dependent fields written from the first chunk
    assert a == b
    nf, na, dt = dcd.info_dcd(many)
    assert (nf, na) == (7, xyz.shape[1])
    assert dt == pytest.approx(2.0, rel=1e-4)

    with pytest.raises(dcd.DcdError, match="atom"):
        dcd.write_dcd(many, xyz[:, :2], boxes=boxes[:1], append=True)
    with pytest.raises(dcd.DcdError, match="crystal-record"):
        dcd.write_dcd(many, xyz[:1], append=True)  # boxes=None mismatch


def test_info_dcd_truncation(tmp_path, rng):
    fn = str(tmp_path / "t.dcd")
    dcd.write_dcd(fn, _rand_xyz(rng, n_frames=3), timestep_ps=1.0)
    nf, _, _ = dcd.info_dcd(fn)
    assert nf == 3
    data = open(fn, "rb").read()
    with open(fn, "wb") as fp:
        fp.write(data[:-10])  # cut mid-frame
    with pytest.raises(dcd.DcdError, match="trailing"):
        dcd.info_dcd(fn)
