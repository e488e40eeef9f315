"""Benchmark: P2-autocorrelation C(t) throughput on the flagship pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): frames x vectors / second for the
Palmer C(t) stage — the #1 compute sink of the reference workflow
(calculate-Ct-from-traj.py:200-238, an O(nDeltas * nFrames) einsum loop).

Baseline: the reference's numpy lag-loop implementation measured on this
container's CPU at the same canonical chunk size (1000 frames/chunk):
2.95e5 frames*vectors/s (measured via tools/bench_reference.py).  The
TPU path computes the identical statistics via batched FFTs.
"""

import json
import time

import numpy as np

# Reference numpy implementation at nFrames=1000/chunk on this host CPU
# (see tools/bench_reference.py; O(N^2) in chunk length).
REFERENCE_CPU_RATE = 2.95e5

# Canonical workload: 8 Palmer chunks x 1000 frames x 1024 bond vectors.
N_REP, N_FRAMES, N_RES = 8, 1000, 1024


def main():
    import jax
    import jax.numpy as jnp

    from spinrelax_tpu.ops.autocorr import ct_palmer

    # Generate inputs ON DEVICE: host->device buffers tunnelled through the
    # axon relay report bogus (early-acknowledged) completion times.
    @jax.jit
    def gen(key):
        v = jax.random.normal(key, (N_REP, N_FRAMES, N_RES, 3), dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    step = jax.jit(ct_palmer)
    n_iter = 5
    keys = jax.random.split(jax.random.PRNGKey(0), n_iter + 1)
    inputs = [gen(k) for k in keys]
    jax.block_until_ready(inputs)
    # Warm-up / compile.
    jax.block_until_ready(step(inputs[-1]))

    t0 = time.perf_counter()
    outs = [step(x) for x in inputs[:n_iter]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n_iter

    rate = N_REP * N_FRAMES * N_RES / dt
    print(
        json.dumps(
            {
                "metric": "ct_palmer_frames_x_vectors_per_s",
                "value": rate,
                "unit": "frames*vectors/s",
                "vs_baseline": rate / REFERENCE_CPU_RATE,
            }
        )
    )


if __name__ == "__main__":
    main()
