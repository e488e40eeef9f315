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
