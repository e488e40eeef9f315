"""Fuzzing the text/binary parsers against malformed inputs.

Every loader must either parse correctly or raise a clean Python
exception — never crash the process (the native fastio/XTC paths are
C++ via ctypes, so memory-safety bugs would segfault the interpreter)
and never hang or return silently-corrupt shapes.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spinrelax_tpu.io import colvar, native, xvg

SETTINGS = dict(max_examples=40, deadline=None)


def _run_all_parsers(path):
    """Feed one file to every text parser; only clean exceptions allowed."""
    for fn in (
        lambda: native.load_table(path),
        lambda: colvar.read_colvar(path),
        lambda: list(colvar.iter_colvar_chunks(path, 3)),
        lambda: xvg.load_matrix(path),
        lambda: xvg.load_xy(path),
        lambda: xvg.load_xvg_block_as_numpy(path)
        if hasattr(xvg, "load_xvg_block_as_numpy")
        else None,
    ):
        try:
            fn()
        except (ValueError, OSError, IndexError, KeyError, StopIteration):
            pass


# Lines made of plausible-but-hostile tokens.
token = st.one_of(
    st.from_regex(r"-?[0-9]{1,12}(\.[0-9]{1,12})?([eE][+-]?[0-9]{1,3})?", fullmatch=True),
    st.sampled_from(["nan", "inf", "-inf", "1e999", "-1e999", "0x12", "..", "-", "+"]),
    st.text(alphabet="abcXYZ#@&!%", min_size=1, max_size=6),
)
line = st.lists(token, min_size=0, max_size=6).map(lambda t: " ".join(t))


@settings(**SETTINGS)
@given(st.lists(line, min_size=0, max_size=12))
def test_text_parsers_survive_token_soup(tmp_path_factory, lines):
    d = tmp_path_factory.mktemp("fuzz")
    path = str(d / "f.dat")
    with open(path, "w") as fp:
        fp.write("\n".join(lines))
    _run_all_parsers(path)


@settings(**SETTINGS)
@given(st.binary(min_size=0, max_size=512))
def test_parsers_survive_binary_garbage(tmp_path_factory, blob):
    d = tmp_path_factory.mktemp("fuzzbin")
    path = str(d / "f.bin")
    with open(path, "wb") as fp:
        fp.write(blob)
    try:
        _run_all_parsers(path)
    except UnicodeDecodeError:
        pass  # clean failure of the pure-python readers is acceptable


@settings(**SETTINGS)
@given(st.binary(min_size=0, max_size=600))
def test_native_xtc_reader_survives_garbage(tmp_path_factory, blob):
    if not native.xtc_available():
        pytest.skip("no native xtc codec")
    d = tmp_path_factory.mktemp("fuzzxtc")
    path = str(d / "f.xtc")
    with open(path, "wb") as fp:
        fp.write(blob)
    try:
        native.read_xtc(path)
    except (ValueError, OSError, RuntimeError):
        pass


def test_native_xtc_truncation(tmp_path):
    """A valid XTC truncated at every byte boundary must fail cleanly."""
    if not native.xtc_available():
        pytest.skip("no native xtc codec")
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 25, 3)).astype(np.float32)
    fn = str(tmp_path / "ok.xtc")
    native.write_xtc(fn, xyz)
    data = open(fn, "rb").read()
    for cut in range(0, len(data), 7):
        tf = str(tmp_path / "cut.xtc")
        with open(tf, "wb") as fp:
            fp.write(data[:cut])
        try:
            native.read_xtc(tf)
        except (ValueError, OSError, RuntimeError):
            pass


def test_ragged_and_mixed_rows(tmp_path):
    """Rows with differing column counts raise, never mis-shape."""
    path = str(tmp_path / "ragged.dat")
    with open(path, "w") as fp:
        fp.write("1.0 2.0 3.0\n1.0 2.0\n4 5 6\n")
    for fn in (lambda: xvg.load_matrix(path), lambda: colvar.read_colvar(path)):
        with pytest.raises((ValueError, OSError)):
            fn()


def test_empty_and_comment_only(tmp_path):
    p1 = str(tmp_path / "empty.dat")
    open(p1, "w").close()
    p2 = str(tmp_path / "comments.dat")
    with open(p2, "w") as fp:
        fp.write("# only\n@ comments\n& here\n")
    for path in (p1, p2):
        _run_all_parsers(path)
