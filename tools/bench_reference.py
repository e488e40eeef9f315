"""Measure the reference implementation's C(t) throughput on this host CPU.

This backs the REFERENCE_CPU_RATE constant in bench.py: the reference's
Palmer lag loop (calculate-Ct-from-traj.py:222-228) transliterated to
standalone numpy, timed at the canonical chunk size (1000 frames/chunk).

Usage: python tools/bench_reference.py
"""

import json
import time

import numpy as np


def np_ct_palmer(vecs):
    """Literal numpy transliteration of calculate_Ct_Palmer."""
    sh = vecs.shape
    n_rep, n_deltas = sh[0], sh[1] // 2
    Ct = np.zeros((n_deltas, sh[2]))
    dCt = np.zeros((n_deltas, sh[2]))
    for delta in range(1, 1 + n_deltas):
        n_vals = sh[1] - delta
        tmp = -0.5 + 1.5 * np.square(
            np.einsum("ijkl,ijkl->ijk", vecs[:, :-delta], vecs[:, delta:])
        )
        tmp = np.einsum("ijk->ik", tmp) / n_vals
        Ct[delta - 1] = np.mean(tmp, axis=0)
        dCt[delta - 1] = np.std(tmp, axis=0) / (np.sqrt(n_rep) - 1.0)
    return Ct, dCt


def main():
    rng = np.random.default_rng(0)
    n_rep, n_frames, n_res = 4, 1000, 64
    v = rng.normal(size=(n_rep, n_frames, n_res, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    t0 = time.perf_counter()
    np_ct_palmer(v)
    dt = time.perf_counter() - t0
    rate = n_rep * n_frames * n_res / dt
    print(
        json.dumps(
            {
                "metric": "reference_ct_frames_x_vectors_per_s",
                "value": rate,
                "unit": "frames*vectors/s",
                "config": f"{n_rep}x{n_frames}x{n_res}, chunk=1000 frames",
            }
        )
    )


if __name__ == "__main__":
    main()
