"""Foreign-bytes validation of the native XTC codec (native/xtc.cpp).

No foreign XTC writer exists in this container (no GROMACS / mdtraj /
MDAnalysis), so the strongest available evidence is used instead:

1. A byte-level golden fixture for the uncompressed (<= 10 atom) frame
   layout, constructed directly from the XDR standard with struct.pack —
   the C++ writer must produce EXACTLY these bytes and the reader must
   decode them.
2. Cross-validation against tests/xdr_ref.py — an INDEPENDENT pure-Python
   implementation of the published xdrfile 3dfcoord algorithm (written
   from the spec, not from xtc.cpp): the C++ decoder must read
   Python-encoded compressed frames, and the Python decoder must read
   C++-encoded frames, across sizes that exercise the small-run paths
   and the adaptive word-size ladder.
3. The historical magicints fingerprints (5060, 524287, 8388607) that
   any implementation must carry verbatim to read files in the wild —
   round 1 shipped a deviating table (2560/3277/5120/6502), caught and
   fixed by this cross-check.
"""

import struct

import numpy as np
import pytest

from spinrelax_tpu.io import native

import xdr_ref

pytestmark = pytest.mark.skipif(
    not native.xtc_available(), reason="native xtc codec unavailable"
)


def _coords(rng, n_atoms, n_frames=3, scale=4.0):
    return (rng.random((n_frames, n_atoms, 3), dtype=np.float64) * scale).astype(
        np.float32
    )


def test_uncompressed_golden_bytes(tmp_path):
    """<= 9-atom frames are plain XDR: construct the exact expected bytes
    from the standard and require byte identity from the C++ writer."""
    xyz = np.array(
        [[[0.5, 1.25, -2.0], [3.0, 0.0, 0.125], [1.5, 2.5, 3.5]]],
        dtype=np.float32,
    )
    times = np.array([7.5], dtype=np.float32)
    box = np.diag([4.0, 5.0, 6.0]).astype(np.float32)

    expected = b"".join(
        [
            struct.pack(">iii", 1995, 3, 0),
            struct.pack(">f", 7.5),
            struct.pack(">9f", *box.reshape(9)),
            struct.pack(">i", 3),
            struct.pack(">9f", *xyz[0].reshape(9)),
        ]
    )

    fn = str(tmp_path / "small.xtc")
    native.write_xtc(fn, xyz, times=times, boxes=box[None])
    got = open(fn, "rb").read()
    assert got == expected, "C++ writer deviates from the XDR standard"

    back, b, t = native.read_xtc(fn)
    np.testing.assert_array_equal(back[0], xyz[0])
    np.testing.assert_array_equal(t, times)
    np.testing.assert_array_equal(b[0], box)

    # The independent Python decoder agrees too.
    px, pb, pt = xdr_ref.read_frames(fn)
    np.testing.assert_array_equal(px[0], xyz[0])


def test_magicints_fingerprints():
    """The published table's historical quirks — a from-scratch
    rederivation produces 5160/3251/..., which cannot read real files."""
    m = xdr_ref.MAGICINTS
    assert m[34] == 2580 and m[35] == 3250
    assert m[37] == 5060  # NOT the mathematical 5160
    assert m[38] == 6501
    assert m[57] == 524287  # 2^19 - 1
    assert m[69] == 8388607  # 2^23 - 1


@pytest.mark.parametrize("n_atoms,scale", [(10, 2.0), (64, 5.0), (500, 8.0)])
def test_cpp_decodes_foreign_python_bytes(tmp_path, n_atoms, scale):
    """Compressed frames written by the independent Python encoder
    (absolute-triple stream) must decode via the C++ reader to the
    quantised coordinates."""
    rng = np.random.default_rng(n_atoms)
    xyz = _coords(rng, n_atoms, scale=scale)
    fn = str(tmp_path / "py.xtc")
    xdr_ref.write_frames(fn, xyz, precision=1000.0)
    got, b, t = native.read_xtc(fn)
    np.testing.assert_allclose(got, xyz, atol=0.5 / 1000.0 + 1e-6)
    # and the Python decoder round-trips its own bytes
    pyx, _, _ = xdr_ref.read_frames(fn)
    np.testing.assert_array_equal(pyx, got)


@pytest.mark.parametrize(
    "n_atoms,scale,precision",
    [
        (10, 2.0, 1000.0),
        (64, 5.0, 1000.0),
        (500, 8.0, 1000.0),
        # tight clusters force long small-delta runs (water-style):
        (300, 0.05, 1000.0),
        # low precision drives small integer ranges / low smallidx:
        (200, 3.0, 10.0),
        # high precision drives large ranges / high smallidx incl. the
        # fixed 2580/3250/5060/6501 region:
        (200, 50.0, 100000.0),
    ],
)
def test_python_decodes_cpp_bytes(tmp_path, n_atoms, scale, precision):
    """Frames written by the C++ encoder (which emits real runs and
    adaptive word-size transitions) must decode identically through the
    independent Python decoder."""
    rng = np.random.default_rng(int(n_atoms + precision))
    base = _coords(rng, n_atoms, n_frames=2, scale=scale)
    # add a water-like tail: triplets of nearby atoms to trigger runs
    tail = np.repeat(base[:, : -(-n_atoms // 3)], 3, axis=1)[:, :n_atoms]
    xyz = (0.5 * base + 0.5 * tail).astype(np.float32)
    fn = str(tmp_path / "cpp.xtc")
    native.write_xtc(fn, xyz, precision=precision)

    want, bw, tw = native.read_xtc(fn)
    got, bg, tg = xdr_ref.read_frames(fn)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(tg, tw)
    np.testing.assert_array_equal(bg, bw)
    # both must equal the quantised original
    np.testing.assert_allclose(got, xyz, atol=0.5 / precision + 1e-6)


def test_handcrafted_run_stream(tmp_path):
    """A compressed frame hand-built with an explicit small-delta run
    (flag=1, run field, water swap) — written bit-by-bit from the spec —
    must decode identically in BOTH implementations."""
    precision = 100.0
    minint = [0, 0, 0]
    maxint = [2000, 2000, 2000]
    sizeint = [2001, 2001, 2001]
    bitsize = xdr_ref.sizeofints(sizeint)
    smallidx = 12  # magicints[12] = 16, small = 8
    sizesmall = [16, 16, 16]

    n_atoms = 12  # must exceed 9, the uncompressed-format threshold

    bw = xdr_ref.BitWriter()
    # atom 0 (large): ints (1000, 1200, 1400), then flag=1 with a run of
    # 2 small atoms (run field = 6 + is_smaller+1 = 6 + 1 + 0 -> encodes
    # run=6, is_smaller=0)
    xdr_ref.write_ints(bw, bitsize, sizeint, [1000, 1200, 1400])
    bw.bits(1, 1)
    bw.bits(5, 6 + 0 + 1)  # run=6 (2 atoms), is_smaller=0
    # small deltas are stored relative to prev - small (small=8):
    # stored value v -> coord = prev + v - 8
    xdr_ref.write_ints(bw, smallidx, sizesmall, [9, 10, 11])  # +1,+2,+3
    xdr_ref.write_ints(bw, smallidx, sizesmall, [6, 8, 12])  # -2, 0,+4
    # CANONICAL run-length reuse: the next block emits flag=0, which
    # means "same run length as before" (run stays 6 = 2 small atoms) —
    # a real GROMACS encoder writes exactly this for consecutive equal
    # runs, and it is the semantics that distinguishes the spec from the
    # naive "flag=0 means no run" misreading.
    xdr_ref.write_ints(bw, bitsize, sizeint, [500, 600, 700])  # atom 3 (large)
    bw.bits(1, 0)  # run UNCHANGED -> still 2 small atoms follow
    xdr_ref.write_ints(bw, smallidx, sizesmall, [10, 9, 8])   # +2,+1, 0
    xdr_ref.write_ints(bw, smallidx, sizesmall, [8, 7, 9])    #  0,-1,+1
    # atoms 6..11 (large, runless): the FIRST must signal the run-length
    # CHANGE back to 0 (flag=1, field = 0 + is_smaller+1 = 1)...
    xdr_ref.write_ints(bw, bitsize, sizeint, [106, 206, 306])
    bw.bits(1, 1)
    bw.bits(5, 1)  # run = 0, is_smaller = 0
    # ...and subsequent runless atoms keep flag=0 (run stays 0).
    for a in range(7, n_atoms):
        xdr_ref.write_ints(bw, bitsize, sizeint, [100 + a, 200 + a, 300 + a])
        bw.bits(1, 0)
    payload = bw.close()

    fn = str(tmp_path / "hand.xtc")
    with open(fn, "wb") as fp:
        fp.write(struct.pack(">iii", 1995, n_atoms, 0))
        fp.write(struct.pack(">f", 0.0))
        fp.write(struct.pack(">9f", *np.eye(3, dtype=np.float32).reshape(9)))
        fp.write(struct.pack(">i", n_atoms))
        fp.write(struct.pack(">f", precision))
        fp.write(struct.pack(">3i", *minint))
        fp.write(struct.pack(">3i", *maxint))
        fp.write(struct.pack(">i", smallidx))
        fp.write(struct.pack(">i", len(payload)))
        fp.write(payload)
        fp.write(b"\x00" * ((-len(payload)) % 4))

    # Expected per the spec: atom0 decodes (1000,1200,1400); the first
    # small atom (1000+9-8, 1200+10-8, 1400+11-8) = (1001,1202,1403) is
    # EXCHANGED with it (water optimisation), so the output order is
    # small, large; the delta chain then continues from the SMALL atom
    # (prevcoord keeps it after the exchange):
    #   atom2 = (1001+6-8, 1202+8-8, 1403+12-8) = (999, 1202, 1407).
    # Reused-run block: large (500,600,700); first small (500+10-8,
    # 600+9-8, 700+8-8) = (502, 601, 700), exchanged with the large;
    # chain continues from the small: (502+8-8, 601+7-8, 700+9-8) =
    # (502, 600, 701).
    want = np.array(
        [
            [1001, 1202, 1403],
            [1000, 1200, 1400],
            [999, 1202, 1407],
            [502, 601, 700],
            [500, 600, 700],
            [502, 600, 701],
            [106, 206, 306],
        ]
        + [[100 + a, 200 + a, 300 + a] for a in range(7, n_atoms)],
        dtype=np.float64,
    ) / precision

    got_py, _, _ = xdr_ref.read_frames(fn)
    got_cpp, _, _ = native.read_xtc(fn)
    np.testing.assert_allclose(got_py[0], want.astype(np.float32), atol=1e-6)
    np.testing.assert_array_equal(got_cpp, got_py)


def test_hostile_smallidx_walk_rejected(tmp_path):
    """A crafted stream whose atom blocks each signal is_smaller=+1 walks
    smallidx past the end of the magicints table (the header check only
    bounds the STARTING index).  The decoder must reject the frame —
    not read past the table (UB) or overflow decodeints' byte scratch."""
    precision = 100.0
    minint = [0, 0, 0]
    maxint = [2000, 2000, 2000]
    sizeint = [2001, 2001, 2001]
    bitsize = xdr_ref.sizeofints(sizeint)
    smallidx = 70  # LASTIDX - 2: two +1 steps stay in-table, the third must reject

    n_atoms = 12  # > 9: compressed layout
    bw = xdr_ref.BitWriter()
    for a in range(3):
        xdr_ref.write_ints(bw, bitsize, sizeint, [100 + a, 200 + a, 300 + a])
        bw.bits(1, 1)   # flag: run-length change signalled
        bw.bits(5, 2)   # field 2 -> run = 0, is_smaller = +1
    payload = bw.close()

    fn = str(tmp_path / "hostile_smallidx.xtc")
    with open(fn, "wb") as fp:
        fp.write(struct.pack(">iii", 1995, n_atoms, 0))
        fp.write(struct.pack(">f", 0.0))
        fp.write(struct.pack(">9f", *np.eye(3, dtype=np.float32).reshape(9)))
        fp.write(struct.pack(">i", n_atoms))
        fp.write(struct.pack(">f", precision))
        fp.write(struct.pack(">3i", *minint))
        fp.write(struct.pack(">3i", *maxint))
        fp.write(struct.pack(">i", smallidx))
        fp.write(struct.pack(">i", len(payload)))
        fp.write(payload)
        fp.write(b"\x00" * ((-len(payload)) % 4))

    with pytest.raises(OSError):
        native.read_xtc(fn)
    with pytest.raises(OSError):
        native.read_xtc(fn, threads=2)


# ---------------------------------------------------------------------------
# TRR foreign-bytes validation: frames hand-assembled from the public
# trnheader spec (magic 1993; version string as outer i32 len+1 + inner
# xdr string; 13 i32 section sizes; t/lambda; box/vir/pres/x/v/f blocks),
# written with raw struct.pack — fully independent of io/gmx.write_trr.
# ---------------------------------------------------------------------------

def _build_foreign_trr_frame(xyz, box, time, step, double=False,
                             with_vir=False, with_vf=False):
    import struct

    f = "d" if double else "f"
    per = 8 if double else 4
    natoms = xyz.shape[0]
    out = bytearray()
    out += struct.pack(">i", 1993)
    out += struct.pack(">i", 13)           # strlen + 1
    out += struct.pack(">i", 12) + b"GMX_trn_file"
    sizes = dict(
        ir=0, e=0, box=9 * per,
        vir=9 * per if with_vir else 0,
        pres=9 * per if with_vir else 0,
        top=0, sym=0,
        x=natoms * 3 * per,
        v=natoms * 3 * per if with_vf else 0,
        f=natoms * 3 * per if with_vf else 0,
    )
    out += struct.pack(
        ">13i", sizes["ir"], sizes["e"], sizes["box"], sizes["vir"],
        sizes["pres"], sizes["top"], sizes["sym"], sizes["x"], sizes["v"],
        sizes["f"], natoms, step, 0,
    )
    out += struct.pack(f">2{f}", time, 0.0)  # t, lambda
    out += struct.pack(f">9{f}", *np.asarray(box, float).reshape(9))
    if with_vir:
        out += struct.pack(f">9{f}", *(np.arange(9) * 0.1))  # virial
        out += struct.pack(f">9{f}", *(np.arange(9) * 0.2))  # pressure
    out += struct.pack(f">{natoms * 3}{f}",
                       *np.asarray(xyz, float).reshape(-1))
    if with_vf:
        out += struct.pack(f">{natoms * 3}{f}",
                           *(np.zeros(natoms * 3) + 0.5))  # velocities
        out += struct.pack(f">{natoms * 3}{f}",
                           *(np.zeros(natoms * 3) - 0.5))  # forces
    return bytes(out)


@pytest.mark.parametrize("double", [False, True])
def test_trr_decodes_foreign_bytes(tmp_path, double):
    """io/gmx must decode TRR frames it did not write, including double
    precision, virial/pressure blocks, and velocity/force blocks."""
    from spinrelax_tpu.io import gmx

    rng = np.random.default_rng(4)
    box = np.diag([3.0, 3.5, 4.0])
    frames = [rng.uniform(0, 3, (7, 3)) for _ in range(3)]
    blob = b"".join(
        _build_foreign_trr_frame(
            x, box, time=2.5 * i, step=10 * i, double=double,
            with_vir=(i == 1), with_vf=(i == 2),
        )
        for i, x in enumerate(frames)
    )
    fn = tmp_path / ("foreign_d.trr" if double else "foreign_f.trr")
    fn.write_bytes(blob)
    xyz, boxes, times = gmx.read_trr(str(fn))
    assert xyz.shape == (3, 7, 3)
    tol = 1e-12 if double else 1e-6
    np.testing.assert_allclose(
        xyz, np.stack(frames).astype(np.float32), atol=1e-6
    )
    np.testing.assert_allclose(boxes[0], box, atol=tol)
    np.testing.assert_allclose(times, [0.0, 2.5, 5.0], atol=tol)

    # And our writer's bytes parse under the same foreign-layout reader
    # assumptions: header fields land where the spec places them.
    own = tmp_path / "own.trr"
    gmx.write_trr(str(own), np.stack(frames).astype(np.float32),
                  times=np.array([0.0, 2.5, 5.0]), box=box)
    raw = own.read_bytes()
    import struct as _s
    assert _s.unpack(">i", raw[:4])[0] == 1993
    assert raw[12:24] == b"GMX_trn_file"
