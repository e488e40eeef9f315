"""Stage-level Delta-q benchmark: `spinrelax dq` vs the reference
calculate-dq-distribution.py on the SAME synthetic colvar.

The dq stage is the reference workflow's second compute sink after C(t)
(calculate-dq-distribution.py:554-650: a Python loop over ~100 lags of
full-trajectory quaternion products, then scalar Powell fits whose
objective evaluates the model in a per-data-point Python loop,
:152-167).  This tool measures the product-level stage on identical
inputs and identical outputs (read colvar -> iso+aniso lag statistics
with sub-chunk uncertainties -> exponential fits -> artefact files):

  ours      pipeline.stages.stage_dq (native colvar parser, lag-vmapped
            jitted statistics, batched golden-section fits)
  reference calculate-dq-distribution.py via tools/refshim

Both walls include file read, statistics, fits and artefact writes.
A steady-state (second-call, same process) wall for ours is reported
separately: cold-process jit compile is part of the first call.

Usage: python tools/bench_dq.py [--frames 1000000] [--ref-frames 200000]
                                [--workdir DIR] [--keep]

The reference run is scaled down by default (--ref-frames) because its
wall is dominated by np.genfromtxt on the colvar text; its full-size
wall is extrapolated linearly in frames (read + per-lag statistics both
scale linearly; the Powell fit tail is frame-independent, so the
extrapolation UNDERSTATES the true full-size reference advantage gap).
Set --ref-frames equal to --frames for a direct measurement.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIM = os.path.join(REPO, "tools", "refshim")


def _qmult_np(a, b):
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def simulate_quats(n_frames, d_body, dt, seed):
    """Vectorised rotational Brownian motion: per-step rotation vectors
    ~ N(0, 2 D_i dt) in the body frame, composed by a Hillis-Steele
    cumulative Hamilton product (O(F log F), exact for the
    non-commutative case with the earlier block as the LEFT factor)."""
    rng = np.random.default_rng(seed)
    w = rng.normal(scale=np.sqrt(2.0 * np.asarray(d_body) * dt),
                   size=(n_frames, 3))
    th = np.linalg.norm(w, axis=-1, keepdims=True)
    ax = np.where(th > 0, w / np.maximum(th, 1e-300), [1.0, 0.0, 0.0])
    dq = np.concatenate([np.cos(th / 2), ax * np.sin(th / 2)], axis=-1)
    dq[0] = [1.0, 0, 0, 0]
    q = dq.copy()
    step = 1
    while step < n_frames:
        q[step:] = _qmult_np(q[:-step], q[step:])
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        step *= 2
    return q


def write_colvar_file(fn, q, dt):
    from spinrelax_tpu.io.colvar import write_colvar

    t = np.arange(q.shape[0], dtype=np.float64) * dt
    write_colvar(fn, ["time", "q.w", "q.x", "q.y", "q.z"],
                 np.concatenate([t[:, None], q], axis=1).T)


def run_ours(colvar, out_prefix, grid, n_chunks):
    from spinrelax_tpu.pipeline.stages import stage_dq

    t0 = time.perf_counter()
    stage_dq(colvar, out_prefix, grid[0], grid[1], grid[2],
             n_chunks=n_chunks)
    return time.perf_counter() - t0


def run_reference(colvar, out_prefix, grid, n_chunks, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + ":" + REF
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    out = subprocess.run(
        [
            sys.executable, os.path.join(REF, "calculate-dq-distribution.py"),
            "--iso", "--aniso", "-f", colvar, "-o", out_prefix,
            "--mindt", str(grid[0]), "--maxdt", str(grid[1]),
            "--skip", str(grid[2]), "--num_chunk", str(n_chunks),
        ],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    wall = time.perf_counter() - t0
    if out.returncode != 0:
        sys.exit("reference failed: " + out.stderr[-2000:])
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1_000_000)
    ap.add_argument("--ref-frames", type=int, default=200_000)
    ap.add_argument("--tau", type=float, default=2000.0,
                    help="target tau_c [ps] (sets D_iso = 1/(6 tau))")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-reference", action="store_true")
    a = ap.parse_args()

    work = a.workdir or tempfile.mkdtemp(prefix="benchdq_")
    os.makedirs(work, exist_ok=True)
    dt = 1.0
    d_iso = 1.0 / (6.0 * a.tau)
    # run-all's default lag grid: tau/100 steps out to tau (run-all.bash:97,386)
    grid = (a.tau / 100.0, a.tau, a.tau / 100.0)

    print(f"= generating {a.frames} frames (tau_c={a.tau} ps) ...")
    t0 = time.perf_counter()
    q = simulate_quats(a.frames, [d_iso] * 3, dt, seed=20260819)
    print(f"  ... {time.perf_counter() - t0:.1f} s (not timed)")
    colvar = os.path.join(work, "colvar-qorient")
    t0 = time.perf_counter()
    write_colvar_file(colvar, q, dt)
    print(f"  colvar write: {time.perf_counter() - t0:.1f} s "
          f"({os.path.getsize(colvar) / 1e6:.0f} MB, not timed)")

    ours_cold = run_ours(colvar, os.path.join(work, "tpu"), grid, a.chunks)
    ours_warm = run_ours(colvar, os.path.join(work, "tpu2"), grid, a.chunks)
    n_lags = len(np.arange(max(grid[2], grid[0]), grid[1] + grid[2] / 2,
                           grid[2]))
    result = {
        "metric": "dq_stage_wall_s",
        "frames": a.frames,
        "n_lags": n_lags,
        "ours_cold_s": round(ours_cold, 3),
        "ours_warm_s": round(ours_warm, 3),
    }

    if not a.skip_reference:
        if a.ref_frames == a.frames:
            ref_colvar = colvar
        else:
            ref_colvar = os.path.join(work, "colvar-ref")
            write_colvar_file(ref_colvar, q[: a.ref_frames], dt)
        ref_wall = run_reference(ref_colvar, os.path.join(work, "ref"),
                                 grid, a.chunks, timeout=5400)
        scale = a.frames / a.ref_frames
        result.update(
            ref_frames=a.ref_frames,
            ref_wall_s=round(ref_wall, 3),
            ref_wall_fullsize_extrapolated_s=round(ref_wall * scale, 1),
            speedup_vs_reference=round(ref_wall * scale / ours_warm, 1),
        )

    print(json.dumps(result))
    if not a.keep and a.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
