"""Native fast-IO library: build, parse correctness vs numpy, throughput."""

import os
import time

import numpy as np
import pytest

from spinrelax_tpu.io import native


@pytest.fixture(scope="module")
def big_table(tmp_path_factory):
    fn = str(tmp_path_factory.mktemp("fastio") / "colvar")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(20000, 5))
    with open(fn, "w") as fp:
        fp.write("#! FIELDS time q.w q.x q.y q.z\n")
        for row in data:
            fp.write(" ".join("%16g" % v for v in row) + "\n")
    return fn, data


def test_native_available():
    assert native.available(), "native fastio library failed to build"


def test_parse_matches_numpy(big_table):
    fn, data = big_table
    got = native.load_table(fn)
    want = np.loadtxt(fn, comments="#")
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.shape == (20000, 5)


def test_skip_characters(tmp_path):
    fn = str(tmp_path / "mixed.dat")
    with open(fn, "w") as fp:
        fp.write("# comment\n@ xmgrace\n1 2\n3 4\n&\n5 6\n")
    got = native.load_table(fn, skip_chars="#@&")
    np.testing.assert_allclose(got, [[1, 2], [3, 4], [5, 6]])


def test_count_headers(tmp_path):
    fn = str(tmp_path / "agg")
    with open(fn, "w") as fp:
        for _ in range(3):
            fp.write("#! FIELDS time q.w\n")
            fp.write("0.0 1.0\n1.0 0.9\n")
    assert native.count_fields_headers(fn) == 3


def test_faster_than_python(big_table):
    fn, _ = big_table
    # Interleaved best-of-3 on BOTH paths: this 1-core container runs
    # the suite alongside other work, and a single descheduling blip
    # made the old mean-of-3 flake.  min() is the noise-robust
    # wall-clock estimator; interleaving balances any load drift.
    t_native, t_numpy = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        native.load_table(fn)
        t_native.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.loadtxt(fn, comments="#")
        t_numpy.append(time.perf_counter() - t0)
    # np.loadtxt is already C-backed; we only require the native path to
    # not be slower (it usually wins 2-5x on comment-heavy files).
    assert min(t_native) < min(t_numpy) * 1.5, (t_native, t_numpy)


def test_colvar_reader_uses_native(big_table):
    from spinrelax_tpu.io import colvar

    fn, data = big_table
    names, out = colvar.read_colvar(fn)
    assert names == ["time", "q.w", "q.x", "q.y", "q.z"]
    # %16g writes 6 significant digits and the reader returns float32
    # (PLUMED convention, plumedcolvario.py:11-12) -> ~1e-5 fidelity.
    np.testing.assert_allclose(out.T, data, rtol=2e-5, atol=1e-7)


def test_write_table_wide(tmp_path):
    """Wide tables (>240 columns) must not overflow the write buffer
    (the flush check now runs per value, not per row)."""
    from spinrelax_tpu.io import native

    if not native.available():
        pytest.skip("no compiler")
    rng = np.random.default_rng(1)
    data = rng.normal(size=(50, 300))
    fn = str(tmp_path / "wide.txt")
    assert native.write_table(fn, data)
    back = np.loadtxt(fn)
    np.testing.assert_allclose(back, data, rtol=1e-5, atol=1e-9)


def test_parse_table_rejects_wide_rows(tmp_path):
    """A row with MORE columns than the first must error (silently
    truncating it would misalign every downstream column)."""
    from spinrelax_tpu.io import native

    if not native.available():
        pytest.skip("no compiler")
    fn = tmp_path / "ragged.txt"
    fn.write_text("1 2 3\n4 5 6 7\n")
    with pytest.raises(OSError):
        native.load_table(str(fn))


class TestFormatSxy:
    """io.native.format_sxy must reproduce numpy's live rendering BYTE
    FOR BYTE: print_sxylist artefacts (_Ctext/_Ctint.dat) are parity-
    pinned against the reference, which prints str(ndarray) rows."""

    def test_differential_fuzz_vs_numpy(self):
        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(20260818)
        for dtype in (np.float64, np.float32):
            for trial in range(1500):
                k = int(rng.integers(1, 4))
                mag = 10.0 ** rng.uniform(-18, 18, k)
                vals = (rng.normal(size=k) * mag).astype(dtype)
                r = trial % 29
                if r == 0: vals[rng.integers(0, k)] = dtype(0.0)
                if r == 1: vals[rng.integers(0, k)] = dtype(-0.0)
                if r == 2: vals[rng.integers(0, k)] = dtype(np.nan)
                if r == 3: vals[rng.integers(0, k)] = dtype(np.inf)
                if r == 4: vals[rng.integers(0, k)] = dtype(-np.inf)
                if r == 5: vals[:] = dtype(np.nan)
                if r == 6:
                    vals = np.round(vals, int(rng.integers(0, 4))).astype(dtype)
                if r == 7: vals = np.trunc(vals).astype(dtype)
                if r == 8:
                    # large integral region: dragon4 min_digits=0 emits
                    # TRUE integer digits, not zero-filled shortest
                    vals = np.trunc(rng.uniform(1e7, 1e8, k)).astype(dtype)
                    vals *= np.where(rng.random(k) < 0.5, -1, 1).astype(dtype)
                if r == 9:
                    vals = (rng.normal(size=k) * 10.0 ** rng.uniform(
                        -44 if dtype == np.float32 else -320,
                        -30 if dtype == np.float32 else -300)).astype(dtype)
                if r == 10 and dtype == np.float64:
                    # full f64 exponent span: 3-digit positive exponents
                    # (exp_size=3) are unreachable from the +-18 draw
                    vals = (rng.normal(size=k)
                            * 10.0 ** rng.uniform(-310, 305, k)).astype(dtype)
                x = np.array([rng.normal() * 10.0 ** rng.uniform(-12, 24)])
                want = f"{x[0]} {str(vals).strip('[]')}\n"
                got = native.format_sxy(x, vals.reshape(1, -1))
                assert got is not None
                assert got.decode() == want, (
                    dtype.__name__, vals.tobytes().hex())

    def test_print_sxylist_fast_path_byte_identical(self, tmp_path):
        """File-level check: the fast path and the forced Python loop
        write identical bytes (incl. legends, '&' separators, headers)."""
        from spinrelax_tpu.io import xvg

        rng = np.random.default_rng(7)
        y = np.stack([rng.uniform(0, 1, (5, 40)).astype(np.float32),
                      (10 ** rng.uniform(-6, -2, (5, 40))).astype(np.float32)],
                     axis=-1)
        x = np.arange(1.0, 41.0)
        leg = [f"s{i}" for i in range(5)]
        fast_fn, slow_fn = str(tmp_path / "f.dat"), str(tmp_path / "s.dat")
        xvg.print_sxylist(fast_fn, leg, x, y, header=["# h1", "# h2"])
        orig = native.format_sxy
        try:
            native.format_sxy = lambda *a: None
            xvg.print_sxylist(slow_fn, leg, x, y, header=["# h1", "# h2"])
        finally:
            native.format_sxy = orig
        with open(fast_fn, "rb") as fa, open(slow_fn, "rb") as fb:
            assert fa.read() == fb.read()

    def test_print_sxylist_nondefault_printoptions_fall_back(self, tmp_path):
        """A user set_printoptions must reach the live numpy rendering."""
        from spinrelax_tpu.io import xvg

        y = np.array([[[0.123456789, 0.5]]])
        x = np.array([1.0])
        fn = str(tmp_path / "p.dat")
        try:
            np.set_printoptions(precision=3)
            xvg.print_sxylist(fn, ["a"], x, y)
        finally:
            np.set_printoptions(precision=8)
        with open(fn) as fh:
            body = fh.read()
        assert "0.123 0.5" in body  # precision-3 rendering, not 8

    def test_print_sxylist_formatter_falls_back(self, tmp_path):
        """A custom per-kind formatter must also reach the live loop."""
        from spinrelax_tpu.io import xvg

        y = np.array([[[0.123456789, 0.5]]])
        x = np.array([1.0])
        fn = str(tmp_path / "fmt.dat")
        try:
            np.set_printoptions(formatter={"float_kind": lambda v: "X%g" % v})
            xvg.print_sxylist(fn, ["a"], x, y)
        finally:
            np.set_printoptions(formatter=None)
        with open(fn) as fh:
            body = fh.read()
        assert "X0.123457 X0.5" in body
