"""Extended differential XTC fuzz campaign (out-of-suite).

Drives the suite's spec-grammar stream generator
(tests/test_xtc_fuzz.py::_gen_stream — valid compressed bitstreams built
directly at the 3dfcoord spec level, no encoder in the loop) across
thousands of fresh random configurations, and requires the C++ decoder
(native/xtc.cpp) to agree BIT-EXACTLY with the independent Python spec
transcription (tests/xdr_ref.py) on every stream.

This is the scalable arm of the VERDICT r2 "foreign XTC bytes" evidence:
GROMACS/mdtraj/MDAnalysis wheels are absent in this image and egress is
zero, so decoder-vs-transcription differentials over generator-free
grammar walks are the strongest available check.  Run:

    python tools/fuzz_xtc_campaign.py --n 2000 --seed 99

Any disagreement is dumped to fuzz_fail_<i>.xtc for triage.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000, help="streams to fuzz")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-atoms", type=int, default=500)
    args = ap.parse_args()

    import test_xtc_fuzz as tf
    import xdr_ref
    from spinrelax_tpu.io import native

    if not native.xtc_available():
        sys.exit("native XTC codec unavailable")

    rng = np.random.default_rng(args.seed)
    fails = 0
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fn = os.path.join(td, "fuzz.xtc")
        for i in range(args.n):
            n_atoms = int(rng.integers(10, args.max_atoms + 1))
            big = bool(rng.random() < 0.2)
            hot = bool(rng.random() < 0.5)
            n_frames = int(rng.integers(1, 4))
            frames = b"".join(
                tf._gen_stream(rng, n_atoms, big_path=big, hot_runs=hot)
                for _ in range(n_frames)
            )
            with open(fn, "wb") as fp:
                fp.write(frames)
            try:
                got_cpp, box_cpp, t_cpp = native.read_xtc(fn)
                got_py, box_py, t_py = xdr_ref.read_frames(fn)
                assert got_cpp.shape == (n_frames, n_atoms, 3)
                np.testing.assert_array_equal(got_cpp, got_py)
                np.testing.assert_array_equal(box_cpp, box_py)
                np.testing.assert_array_equal(t_cpp, t_py)
            except Exception as exc:  # noqa: BLE001 — triage dump
                fails += 1
                dump = f"fuzz_fail_{i}.xtc"
                with open(dump, "wb") as fp:
                    fp.write(frames)
                print(f"FAIL stream {i} (atoms={n_atoms} big={big} "
                      f"hot={hot} frames={n_frames}): {exc} -> {dump}")
            if (i + 1) % 200 == 0:
                print(f"... {i + 1}/{args.n} streams, {fails} failures")

    print(f"campaign done: {args.n} streams, {fails} disagreements")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
