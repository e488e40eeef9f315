"""I/O round-trips + cross-parity with the reference's readers/writers."""

import os
import sys

import numpy as np
import pytest

from spinrelax_tpu.io import colvar, dx, experiments, fittedct, vectors, xvg
from spinrelax_tpu.models import CtModelSet

REF = "/root/reference"
SHIM = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "refshim")


@pytest.fixture(scope="module")
def refmod():
    sys.path.insert(0, SHIM)
    sys.path.insert(0, REF)
    import fitting_Ct_functions as fitCt
    import general_scripts as gs
    import plumedcolvario as pl

    yield dict(fitCt=fitCt, gs=gs, pl=pl)
    sys.path.remove(SHIM)
    sys.path.remove(REF)


def test_xy_roundtrip(tmp_path):
    fn = str(tmp_path / "a.dat")
    x = np.arange(5.0)
    y = np.linspace(0, 1, 5)
    xvg.print_xy(fn, x, y)
    x2, y2 = xvg.load_xy(fn)
    np.testing.assert_allclose(x2, x)
    np.testing.assert_allclose(y2, y)


def test_sxylist_roundtrip_with_dy(tmp_path):
    fn = str(tmp_path / "ct.dat")
    legs = ["2", "3", "7"]
    x = np.arange(1.0, 11.0)
    y = np.random.default_rng(0).random((3, 10, 2))
    xvg.print_sxylist(fn, legs, x, y)
    legs2, x2, y2, dy2 = xvg.load_sxydylist(fn, "legend")
    assert legs2 == legs
    np.testing.assert_allclose(np.asarray(x2)[0], x)
    # Rows render via numpy's aligned str() exactly like the reference
    # (print_sxylist, general_scripts.py:281-287), which carries numpy's
    # ~8-significant-digit print precision.
    np.testing.assert_allclose(np.asarray(y2), y[..., 0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(dy2), y[..., 1], atol=1e-8)


def test_sxylist_readable_by_reference(tmp_path, refmod):
    fn = str(tmp_path / "ct.dat")
    legs = ["2", "3"]
    x = np.arange(1.0, 6.0)
    y = np.random.default_rng(1).random((2, 5, 2))
    xvg.print_sxylist(fn, legs, x, y)
    legs2, x2, y2, dy2 = refmod["gs"].load_sxydylist(fn, "legend")
    assert legs2 == legs
    np.testing.assert_allclose(np.asarray(y2), y[..., 0])


def test_fittedct_roundtrip(tmp_path):
    cts = CtModelSet.from_lists(
        names=["2", "5", "9"],
        S2=[0.8, 0.7, 0.6],
        C_list=[[0.1], [0.05, 0.15], [0.1, 0.05, 0.02]],
        tau_list=[[50.0], [10.0, 500.0], [5.0, 80.0, 900.0]],
        s2fast=[True, False, True],
        chisq=[1e-5, 2e-5, 3e-5],
        dS2=[0.01, 0.0, 0.02],
        dC_list=[[0.001], [0.002, 0.003], [0.001, 0.001, 0.001]],
        dtau_list=[[1.0], [0.5, 20.0], [0.1, 2.0, 30.0]],
    )
    fn = str(tmp_path / "out_fittedCt.dat")
    dt = np.arange(1.0, 40.0)
    fittedct.write_fittedct(fn, cts, dt=dt, targets=np.asarray(cts.eval(dt)))
    back = fittedct.read_fittedct(fn)
    assert back.names == cts.names
    np.testing.assert_allclose(np.asarray(back.S2), np.asarray(cts.S2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(back.C) * np.asarray(back.mask),
        np.asarray(cts.C) * np.asarray(cts.mask),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(back.tau) * np.asarray(back.mask),
        np.asarray(cts.tau) * np.asarray(cts.mask),
        rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(back.s2fast), np.asarray(cts.s2fast))


def test_fittedct_readable_by_reference(tmp_path, refmod):
    cts = CtModelSet.from_lists(
        names=["4", "6"],
        S2=[0.82, 0.75],
        C_list=[[0.07, 0.05], [0.1]],
        tau_list=[[11.6, 195.0], [40.0]],
        s2fast=[True, True],
        chisq=[1e-5, 1e-5],
    )
    fn = str(tmp_path / "ref_fittedCt.dat")
    dt = np.arange(1.0, 10.0)
    fittedct.write_fittedct(fn, cts, dt=dt, targets=np.asarray(cts.eval(dt)))
    obj = refmod["fitCt"].read_fittedCt_parameters(fn)
    assert obj.nModels == 2
    m = obj.model["4"]
    np.testing.assert_allclose(m.S2, 0.82, rtol=1e-6)
    np.testing.assert_allclose(np.sort(m.tau), [11.6, 195.0], rtol=1e-6)


def test_reference_fittedct_readable_by_us(tmp_path, refmod):
    # Write with the *reference* writer, read with ours.
    fitCt = refmod["fitCt"]
    ac = fitCt.autoCorrelations()
    ac.add_model("3", listC=[0.2, 0.1], listTau=[20.0, 300.0], S2=0.65, bS2Fast=True)
    ac.add_model("4", listC=[0.15], listTau=[90.0], S2=None, bS2Fast=False)
    fn = str(tmp_path / "theirs_fittedCt.dat")
    with open(fn, "w") as fp:
        for m in ac.model.values():
            m.report(style="xmgrace", fp=fp)
            print("", file=fp)
    back = fittedct.read_fittedct(fn)
    assert back.names == ["3", "4"]
    np.testing.assert_allclose(np.asarray(back.S2), [0.65, 1.0 - 0.15], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.s2fast), [1.0, 0.0])


def test_experiment_roundtrip(tmp_path):
    expt = experiments.ExperimentData(
        expt_type="NOE",
        nuclei_a="15N",
        nuclei_b="1H",
        frequency=600.133,
        freq_unit="MHz",
        names=np.array(["2", "3", "4"]),
        values=np.array([0.5, 0.9, 0.7]),
        errors=np.array([0.05, 0.03, 0.04]),
    )
    fn = str(tmp_path / "expt.dat")
    experiments.write_experiment(fn, expt)
    back = experiments.read_experiment(fn)
    assert back.expt_type == "NOE"
    assert back.nuclei_a == "15N"
    np.testing.assert_allclose(back.values, expt.values)
    np.testing.assert_allclose(back.errors, expt.errors)


def test_colvar_roundtrip_and_reference_parity(tmp_path, refmod):
    rng = np.random.default_rng(2)
    data = rng.random((5, 30)).astype(np.float32)
    names = ["time", "q.w", "q.x", "q.y", "q.z"]
    fn = str(tmp_path / "colvar")
    colvar.write_colvar(fn, names, data)
    n2, d2 = colvar.read_colvar(fn)
    assert n2 == names
    np.testing.assert_allclose(d2, data, atol=1e-6)
    n3, d3 = refmod["pl"].read_from_plumedprint(fn)
    np.testing.assert_allclose(np.asarray(d3), d2, atol=1e-6)


def test_colvar_multi(tmp_path):
    rng = np.random.default_rng(3)
    names = ["time", "q.w", "q.x", "q.y", "q.z"]
    fn = str(tmp_path / "colvar-agg")
    with open(fn, "w") as fp:
        for _ in range(3):
            fp.write("#! FIELDS " + " ".join(names) + "\n")
            for i in range(4):
                fp.write(" ".join("%8f" % v for v in rng.random(5)) + "\n")
    fnames, data = colvar.read_colvar_multi(fn)
    assert len(fnames) == 3
    assert data.shape == (3, 4, 5)


def test_dx_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.random((4, 5, 6))
    dims = (4, 5, 6)
    orig = np.array([-1.0, -1.0, -1.0])
    abc = np.diag([0.5, 0.4, 0.3])
    fn = str(tmp_path / "hist.dx")
    dx.write_dx(fn, data, dims, orig, abc, units="A")
    data2, dims2, orig2, abc2 = dx.read_dx(fn, units="A")
    np.testing.assert_allclose(data2, data, rtol=1e-5)
    np.testing.assert_allclose(orig2, orig, atol=1e-12)
    np.testing.assert_allclose(abc2, abc, atol=1e-12)


def test_vector_npz_phitheta_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pts = np.stack(
        [rng.uniform(-np.pi, np.pi, (4, 10)), rng.uniform(0, np.pi, (4, 10))], axis=-1
    )
    fn = str(tmp_path / "v.npz")
    vectors.save_phitheta(fn, [2, 3, 4, 5], pts)
    names, vecs, weights = vectors.load_vector_distribution(fn)
    assert weights is None
    assert vecs.shape == (4, 10, 3)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-12)


def test_vector_npz_histogram_roundtrip(tmp_path):
    from spinrelax_tpu.core.geometry import lambert_histogram

    rng = np.random.default_rng(6)
    v = rng.normal(size=(3, 200, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    hist, ep, ec = lambert_histogram(v, 36, 18)
    fn = str(tmp_path / "h.npz")
    vectors.save_histogram(fn, [2, 3, 4], np.asarray(hist), np.asarray(ep), np.asarray(ec))
    names, vecs, weights = vectors.load_vector_distribution(fn)
    assert vecs.shape == (3, 36 * 18, 3)
    np.testing.assert_allclose(weights.sum(axis=-1), 200.0)


def test_trr_roundtrip(tmp_path):
    from spinrelax_tpu.io import gmx
    from spinrelax_tpu.io.trajectory import iter_trajectory, load_trajectory

    rng = np.random.default_rng(7)
    xyz = rng.normal(size=(5, 12, 3)).astype(np.float32)
    times = np.arange(5) * 2.0
    box = np.diag([4.0, 4.0, 4.0])
    fn = str(tmp_path / "traj.trr")
    gmx.write_trr(fn, xyz, times=times, box=box)

    x2, boxes, t2 = gmx.read_trr(fn)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(boxes[0], box, rtol=1e-6)
    np.testing.assert_allclose(t2, times)

    # Double precision variant.
    fn64 = str(tmp_path / "traj64.trr")
    gmx.write_trr(fn64, xyz.astype(np.float64), times=times, box=box, double=True)
    x3, _, _ = gmx.read_trr(fn64)
    np.testing.assert_allclose(x3, xyz, rtol=1e-6)

    # Through the generic loaders.
    x4, dt = load_trajectory(fn)
    np.testing.assert_allclose(x4, xyz, rtol=1e-6)
    assert dt == 2.0
    chunks = list(iter_trajectory(fn, chunk_frames=2))
    assert [c[0].shape[0] for c in chunks] == [2, 2, 1]
    np.testing.assert_allclose(np.concatenate([c[0] for c in chunks]), xyz, rtol=1e-6)


def test_xtc_roundtrip(tmp_path):
    from spinrelax_tpu.io import native
    from spinrelax_tpu.io.trajectory import load_trajectory

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")
    rng = np.random.default_rng(11)
    # Water-like clusters (run-encoded) + a few far-flung atoms (absolute).
    n_mol, nf = 20, 6
    centers = rng.uniform(0, 5, (n_mol, 3))
    xyz = np.zeros((nf, n_mol * 3 + 4, 3), dtype=np.float32)
    for f in range(nf):
        for m in range(n_mol):
            base = centers[m] + 0.002 * f * rng.normal(size=3)
            xyz[f, 3 * m + 0] = base
            xyz[f, 3 * m + 1] = base + [0.1, 0.0, 0.02]
            xyz[f, 3 * m + 2] = base + [-0.03, 0.09, 0.0]
        xyz[f, -4:] = rng.uniform(0, 5, (4, 3))
    times = np.arange(nf, dtype=np.float32) * 4.0
    fn = str(tmp_path / "traj.xtc")
    native.write_xtc(fn, xyz, times, precision=1000.0)

    x2, _boxes, t2 = native.read_xtc(fn)
    assert np.abs(x2 - xyz).max() <= 0.5 / 1000.0 + 1e-5
    np.testing.assert_allclose(t2, times)

    # Generic loader path.
    x3, dt = load_trajectory(fn)
    np.testing.assert_allclose(x3, x2)
    assert dt == 4.0
    # Compression actually happened.
    assert os.path.getsize(fn) < xyz.nbytes * 0.6


def test_xvg_utility_functions(tmp_path):
    # format_float_with_error
    s = xvg.format_float_with_error(0.00302, 4.52e-5, 2)
    assert "e-3" in s and "+-" in s

    # load_block_as_numpy: 2D and 3D
    fn = str(tmp_path / "blocks.dat")
    with open(fn, "w") as fp:
        fp.write("# c\n1 2\n3 4\n&\n5 6\n7 8\n&\n")
    out = xvg.load_block_as_numpy(fn)
    assert out.shape == (2, 2, 2)
    fn2 = str(tmp_path / "flat.dat")
    with open(fn2, "w") as fp:
        fp.write("1 2\n3 4\n")
    np.testing.assert_array_equal(xvg.load_block_as_numpy(fn2), [[1, 2], [3, 4]])

    # load_xylist / load_xydylist
    fn3 = str(tmp_path / "sets.dat")
    with open(fn3, "w") as fp:
        fp.write("1 2 0.1\n2 3 0.2\n&\n4 5 0.3\n&\n")
    xs, ys = xvg.load_xylist(fn3)
    assert len(xs) == 2 and ys[0] == [2.0, 3.0]
    xs, ys, dys = xvg.load_xydylist(fn3)
    assert dys[1] == [0.3]

    # print_R_hist / print_gplot_4d / print_numpy_block smoke + parse
    hist = np.arange(6).reshape(2, 3).astype(float)
    edges = [np.array([0, 1, 2.0]), np.array([0, 1, 2, 3.0])]
    xvg.print_R_hist(str(tmp_path / "r.hist"), hist, edges)
    m = xvg.load_matrix(str(tmp_path / "r.hist"))
    assert m.shape == (6, 5)

    xvg.print_gplot_4d(
        str(tmp_path / "g4.dat"), np.ones((2, 2, 2)), [0, 1], [0, 1], [0, 1]
    )
    assert xvg.load_matrix(str(tmp_path / "g4.dat")).shape == (8, 4)

    xvg.print_numpy_block(str(tmp_path / "b.dat"), np.ones((2, 3)))
    np.testing.assert_array_equal(
        xvg.load_matrix(str(tmp_path / "b.dat")), np.ones((2, 3))
    )


def test_colvar_multi_ragged(tmp_path):
    rng = np.random.default_rng(5)
    names = ["time", "q.w", "q.x", "q.y", "q.z"]
    fn = str(tmp_path / "colvar-ragged")
    lens = [4, 6, 3]
    with open(fn, "w") as fp:
        for n in lens:
            fp.write("#! FIELDS " + " ".join(names) + "\n")
            for i in range(n):
                fp.write(" ".join("%8f" % v for v in rng.random(5)) + "\n")
    fnames, data = colvar.read_colvar_multi(fn)
    assert len(fnames) == 3
    assert [d.shape for d in data] == [(4, 5), (6, 5), (3, 5)]


def test_xtc_streaming_iter(tmp_path):
    """iter_xtc / iter_trajectory stream an .xtc in chunks from the
    native handle-based reader (xtc_open/xtc_next/xtc_close) — the >RAM
    ingest path for run-all.bash:359-scale trajectories — and match the
    whole-file decode exactly."""
    from spinrelax_tpu.io import native
    from spinrelax_tpu.io.trajectory import iter_trajectory

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")
    rng = np.random.default_rng(5)
    nf, na = 11, 30
    xyz = rng.uniform(0, 4, (nf, na, 3)).astype(np.float32)
    times = np.arange(nf, dtype=np.float32) * 2.5
    boxes = np.zeros((nf, 3, 3), dtype=np.float32)
    boxes[:, [0, 1, 2], [0, 1, 2]] = 4.0
    fn = str(tmp_path / "stream.xtc")
    native.write_xtc(fn, xyz, times, boxes=boxes)

    whole, wboxes, wtimes = native.read_xtc(fn)
    chunks = list(native.iter_xtc(fn, chunk_frames=4))
    assert [c[0].shape[0] for c in chunks] == [4, 4, 3]
    np.testing.assert_allclose(
        np.concatenate([c[0] for c in chunks]), whole, atol=0
    )
    np.testing.assert_allclose(
        np.concatenate([c[1] for c in chunks]), wboxes, atol=0
    )
    np.testing.assert_allclose(
        np.concatenate([c[2] for c in chunks]), wtimes, atol=0
    )

    # Generic streaming entry point with timestep detection.
    tchunks = list(iter_trajectory(fn, chunk_frames=4))
    np.testing.assert_allclose(
        np.concatenate([c[0] for c in tchunks]), whole, atol=0
    )
    assert tchunks[0][1] == 2.5


def test_xtc_threaded_decode_identical(tmp_path):
    """xtc_next_mt (threaded chunk decode: offset scan + disjoint frame
    blocks per worker) must be bit-identical to the sequential reader
    for every thread count, including partial tail chunks, and must
    report the same -3/-4 errors."""
    from spinrelax_tpu.io import native

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")
    rng = np.random.default_rng(11)
    nf, na = 23, 31
    xyz = rng.uniform(0, 4, (nf, na, 3)).astype(np.float32)
    times = np.arange(nf, dtype=np.float32) * 0.5
    boxes = np.zeros((nf, 3, 3), dtype=np.float32)
    boxes[:, [0, 1, 2], [0, 1, 2]] = 4.0
    fn = str(tmp_path / "mt.xtc")
    native.write_xtc(fn, xyz, times, boxes=boxes)

    seq = native.read_xtc(fn, threads=1)
    for threads in (0, 2, 3, 7):
        mt = native.read_xtc(fn, threads=threads)
        for s, m in zip(seq, mt):
            np.testing.assert_array_equal(s, m)
        # chunked streaming with a partial tail (23 = 2*10 + 3)
        chunks = list(native.iter_xtc(fn, chunk_frames=10, threads=threads))
        assert [c[0].shape[0] for c in chunks] == [10, 10, 3]
        np.testing.assert_array_equal(
            np.concatenate([c[0] for c in chunks]), seq[0]
        )
        np.testing.assert_array_equal(
            np.concatenate([c[2] for c in chunks]), seq[2]
        )

    # Error parity: mid-stream natoms flip and corrupt tail raise the
    # same errors through the threaded path.
    other = str(tmp_path / "other.xtc")
    native.write_xtc(other, rng.uniform(0, 4, (2, 40, 3)).astype(np.float32))
    mixed = str(tmp_path / "mixed.xtc")
    with open(mixed, "wb") as out:
        out.write(open(fn, "rb").read())
        out.write(open(other, "rb").read())
    with pytest.raises(OSError, match="natoms mismatch"):
        for _ in native.iter_xtc(mixed, chunk_frames=50, threads=3):
            pass
    data = open(fn, "rb").read()
    trunc = str(tmp_path / "trunc_mt.xtc")
    with open(trunc, "wb") as out:
        out.write(data[: len(data) - 10])
    with pytest.raises(OSError, match="corrupt|truncated|failed"):
        for _ in native.iter_xtc(trunc, chunk_frames=50, threads=3):
            pass


def test_xtc_threaded_empty_file_and_unlink(tmp_path):
    """Threaded decode keeps the sequential reader's file-lifetime
    semantics: a zero-frame .xtc returns empty arrays (not an open
    error), and a file unlinked after the stream was opened keeps
    decoding through the held descriptor."""
    from spinrelax_tpu.io import native

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")

    empty = str(tmp_path / "empty.xtc")
    open(empty, "wb").close()
    for threads in (1, 3):
        xyz, boxes, times = native.read_xtc(empty, threads=threads)
        assert xyz.shape[0] == 0 and boxes.shape[0] == 0 and times.shape[0] == 0

    rng = np.random.default_rng(5)
    nf, na = 9, 25
    xyz = rng.uniform(0, 4, (nf, na, 3)).astype(np.float32)
    fn = str(tmp_path / "unlinked.xtc")
    native.write_xtc(fn, xyz, np.arange(nf, dtype=np.float32))
    ref = native.read_xtc(fn)[0]

    it = native.iter_xtc(fn, chunk_frames=4, threads=3)
    first = next(it)[0]
    os.unlink(fn)  # tempfile open-then-delete pattern
    rest = [c[0] for c in it]
    np.testing.assert_array_equal(
        np.concatenate([first] + rest), ref
    )


def test_xtc_mixed_natoms_and_corruption_raise(tmp_path):
    """A mid-stream frame with a different atom count must raise (not
    overrun the chunk buffer), and a corrupt tail must raise (not be
    silently truncated) — on both the streaming and whole-file readers."""
    from spinrelax_tpu.io import native

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 4, (3, 12, 3)).astype(np.float32)
    b = rng.uniform(0, 4, (2, 40, 3)).astype(np.float32)
    fa, fb = str(tmp_path / "a.xtc"), str(tmp_path / "b.xtc")
    native.write_xtc(fa, a)
    native.write_xtc(fb, b)
    mixed = str(tmp_path / "mixed.xtc")
    with open(mixed, "wb") as out:
        out.write(open(fa, "rb").read())
        out.write(open(fb, "rb").read())
    with pytest.raises(OSError, match="natoms mismatch"):
        for _ in native.iter_xtc(mixed, chunk_frames=2):
            pass
    with pytest.raises(OSError):
        native.read_xtc(mixed)

    # Corrupt tail: truncate the last frame mid-way.
    data = open(fa, "rb").read()
    trunc = str(tmp_path / "trunc.xtc")
    with open(trunc, "wb") as out:
        out.write(data[: len(data) - 10])
    with pytest.raises(OSError, match="corrupt|truncated|failed"):
        for _ in native.iter_xtc(trunc, chunk_frames=2):
            pass


def test_xtc_single_frame_chunk_timestep(tmp_path):
    """iter_trajectory(chunk_frames=1) must report the REAL frame spacing
    from the first yield (stage_ct_streamed probes dt with a single-frame
    read; a wrong default would mis-scale every Palmer chunk)."""
    from spinrelax_tpu.io import native
    from spinrelax_tpu.io.trajectory import iter_trajectory

    if not native.xtc_available():
        pytest.skip("no compiler for the native XTC codec")
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 4, (5, 10, 3)).astype(np.float32)
    fn = str(tmp_path / "dt.xtc")
    native.write_xtc(fn, xyz, times=np.arange(5, dtype=np.float32) * 10.0)
    chunks = list(iter_trajectory(fn, chunk_frames=1))
    assert len(chunks) == 5
    assert all(c[1] == 10.0 for c in chunks)


def test_trr_single_frame_chunk_timestep(tmp_path):
    """iter_trajectory(.trr, chunk_frames=1) must report the real frame
    spacing from the first yield (the stage_ct_streamed probe contract,
    same as the .xtc branch)."""
    from spinrelax_tpu.io import gmx
    from spinrelax_tpu.io.trajectory import iter_trajectory

    rng = np.random.default_rng(6)
    xyz = rng.uniform(0, 4, (5, 8, 3)).astype(np.float32)
    fn = str(tmp_path / "dt.trr")
    gmx.write_trr(fn, xyz, times=np.arange(5, dtype=np.float64) * 10.0)
    chunks = list(iter_trajectory(fn, chunk_frames=1))
    assert len(chunks) == 5
    assert all(c[1] == 10.0 for c in chunks)
    np.testing.assert_allclose(
        np.concatenate([c[0] for c in chunks]), xyz, atol=1e-6
    )
    # Chunk size larger than the 2-frame lookahead still yields evenly.
    chunks3 = list(iter_trajectory(fn, chunk_frames=3))
    assert [c[0].shape[0] for c in chunks3] == [3, 2]
    np.testing.assert_allclose(
        np.concatenate([c[0] for c in chunks3]), xyz, atol=1e-6
    )


def test_format_float_with_error_zero_operands():
    """A zero value or error must inherit the OTHER operand's exponent
    (the reference's log10(0) = -inf drops out of max()), not collapse
    both to e0."""
    assert xvg.format_float_with_error(0.0, 4.52e-5) == "0.0000e-5 +- 4.5200e-5"
    assert xvg.format_float_with_error(3.02e-3, 0.0) == "3.0200e-3 +- 0.0000e-3"
    assert xvg.format_float_with_error(0.0, 0.0) == "0.0000e0 +- 0.0000e0"


def test_phitheta_stream_writer_empty_and_cleanup(tmp_path):
    """Zero streamed frames must raise cleanly (not crash in np.memmap)
    and leave no temp files behind."""
    import os

    from spinrelax_tpu.io.vectors import PhiThetaStreamWriter

    fn = str(tmp_path / "pt.npz")
    w = PhiThetaStreamWriter(fn, ["2", "3"])
    with pytest.raises(ValueError, match="no vector frames"):
        w.close()
    assert os.listdir(tmp_path) == []  # no .stream.tmp / .data.npy left

    # abort(): a producing stage that fails BEFORE close() must be able
    # to remove the temp explicitly (idempotent; __del__ is best-effort).
    w2 = PhiThetaStreamWriter(fn, ["2", "3"])
    w2.append(np.zeros((4, 2, 2)))
    assert os.path.exists(fn + ".stream.tmp")
    w2.abort()
    w2.abort()
    assert os.listdir(tmp_path) == []


def test_fittedct_header_styles(tmp_path):
    """Header byte-forms match the reference report(style='xmgrace')
    (fitting_Ct_functions.py:244-261): fitted non-S2fast models carry a
    LITERAL '+- 0.0' on S2_0; unfitted models omit '+-' entirely; both
    re-parse losslessly."""
    from spinrelax_tpu.io import fittedct
    from spinrelax_tpu.models import CtModelSet

    # Fitted, no S2_fast (the 2-parameter ladder rung).
    cts = CtModelSet.from_lists(
        ["7"], [0.8], [[0.2]], [[50.0]], s2fast=[False],
        dS2=[0.01], dC_list=[[0.02]], dtau_list=[[5.0]], chisq=[0.5],
    )
    fn = str(tmp_path / "a.dat")
    fittedct.write_fittedct(fn, cts)
    text = open(fn).read()
    # LITERAL 0.0 even though dS2=0.01 internally (reference :251).
    assert "# Param S2_0: 0.8 +- 0.0\n" in text
    assert "# Param C_a: 0.2 +- 0.02" in text
    back = fittedct.read_fittedct(fn)
    np.testing.assert_allclose(np.asarray(back.S2), [0.8])

    # Unfitted (no chisq): STILL the '+-' form — the reference's own
    # reader (read_fittedCt_parameters:453) crashes on its no-'+-'
    # unfitted style, so the wire format keeps '+-' everywhere.
    cts2 = CtModelSet.from_lists(
        ["8"], [0.7], [[0.1]], [[20.0]], s2fast=[True],
    )
    fn2 = str(tmp_path / "b.dat")
    fittedct.write_fittedct(fn2, cts2)
    text2 = open(fn2).read()
    assert "# Param S2_0: 0.7 +- 0" in text2
    back2 = fittedct.read_fittedct(fn2)
    np.testing.assert_allclose(np.asarray(back2.S2), [0.7])


def test_trr_per_frame_boxes_roundtrip(tmp_path):
    """write_trr accepts the (nFrames, 3, 3) boxes read_trr returns (a
    mis-shaped box used to silently corrupt every frame after the
    first), and rejects other shapes loudly."""
    from spinrelax_tpu.io import gmx

    rng = np.random.default_rng(9)
    xyz = rng.uniform(0, 4, (3, 6, 3)).astype(np.float32)
    boxes = np.stack([np.diag([4.0 + i, 4.0, 4.0]) for i in range(3)])
    fn = str(tmp_path / "pf.trr")
    gmx.write_trr(fn, xyz, box=boxes)
    x2, b2, _ = gmx.read_trr(fn)
    np.testing.assert_allclose(x2, xyz, atol=1e-6)
    np.testing.assert_allclose(b2, boxes, atol=1e-6)
    with pytest.raises(ValueError, match="box must be"):
        gmx.write_trr(fn, xyz, box=np.zeros((2, 3, 3)))


def test_write_pdb_preserves_4char_resnames(tmp_path):
    """write_pdb keeps CHARMM 4-character residue names through a
    round-trip (truncation to 3 re-classified waters as solute)."""
    from spinrelax_tpu.io.pdb import Topology, read_pdb, write_pdb
    from spinrelax_tpu.ops.pbc import solute_mask

    top = Topology(
        atom_names=["CA", "OH2"], res_seqs=np.array([1, 2]),
        res_names=["ALA", "TIP3"], chain_ids=["A", "W"],
        occupancies=np.ones(2), elements=["C", "O"],
    )
    fn = str(tmp_path / "t.pdb")
    write_pdb(fn, top, np.zeros((1, 2, 3)))
    top2, _ = read_pdb(fn)
    assert top2.res_names == ["ALA", "TIP3"]
    assert solute_mask(top2).tolist() == [True, False]


def test_write_pdb_rejects_field_overflow(tmp_path):
    """resSeq > 9999 (or < -999) overflows the fixed %4d column and
    shifts every later field — read_pdb would then crash or silently
    mis-parse coordinates.  write_pdb must fail loudly instead."""
    from spinrelax_tpu.io.pdb import Topology, write_pdb

    top = Topology(
        atom_names=["CA"], res_seqs=np.array([10000]),
        res_names=["ALA"], chain_ids=["A"],
        occupancies=np.ones(1), elements=["C"],
    )
    with pytest.raises(ValueError, match="resSeq"):
        write_pdb(str(tmp_path / "o.pdb"), top, np.zeros((1, 1, 3)))
    top2 = Topology(
        atom_names=["CA"], res_seqs=np.array([-1000]),
        res_names=["ALA"], chain_ids=["A"],
        occupancies=np.ones(1), elements=["C"],
    )
    with pytest.raises(ValueError, match="resSeq"):
        write_pdb(str(tmp_path / "o.pdb"), top2, np.zeros((1, 1, 3)))


def test_text_phitheta_loads_as_vector_distribution(tmp_path, rng):
    """-vecstorage TextPhiTheta artefacts must round-trip into
    load_vector_distribution (run-all step 4 consumed them with np.load
    and crashed — review finding, round 3)."""
    import numpy as np

    from spinrelax_tpu.io import vectors as vecio

    names = ["2", "3", "4"]
    pt = np.stack(
        [rng.uniform(-np.pi, np.pi, (3, 11)), rng.uniform(0.1, 3.0, (3, 11))],
        axis=-1,
    )
    # text writer (residue-major xvg blocks)
    w = vecio.PhiThetaStreamWriter(str(tmp_path / "v.dat"), names, fmt="text")
    w.append(np.swapaxes(pt, 0, 1))  # (nFrames, nRes, 2)
    w.close()
    n_t, v_t, w_t = vecio.load_vector_distribution(str(tmp_path / "v.dat"))
    # npz path as the ground truth
    vecio.save_phitheta(str(tmp_path / "v.npz"), names, pt)
    n_z, v_z, w_z = vecio.load_vector_distribution(str(tmp_path / "v.npz"))
    assert [str(x) for x in n_t] == [str(x) for x in n_z]
    np.testing.assert_allclose(v_t, v_z, atol=1e-5)  # %g text rounding
    assert w_t is None and w_z is None


def test_colvar_header_scan_stops_at_first_data_row(tmp_path):
    """_read_field_names stops scanning at the first data row (a
    full-file scan cost ~0.8 s per 10^6-line colvar); disagreeing
    FIELDS headers BEFORE any data still raise, ones after data are
    read_colvar_multi's job."""
    from spinrelax_tpu.io import colvar

    fn = tmp_path / "colvar"
    fn.write_text(
        "#! FIELDS time q.w\n 0.0 1.0\n#! FIELDS time other\n 1.0 0.5\n"
    )
    names, data = colvar.read_colvar(str(fn))
    assert names == ["time", "q.w"]
    assert data.shape == (2, 2)  # both rows load; header scan just stops

    bad = tmp_path / "colvar-bad"
    bad.write_text("#! FIELDS time q.w\n#! FIELDS time other\n 0.0 1.0\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="disagree"):
        colvar.read_colvar(str(bad))
