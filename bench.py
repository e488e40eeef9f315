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

# Floor-amortising workload: 32 Palmer chunks x 1000 frames x 1024 bond
# vectors per dispatch.  The axon relay has a ~0.8 ms batch-independent
# floor per chained dispatch (tools/exp_scaling.py): at the canonical
# 8-chunk step that floor is ~25% of the measurement, at 32 chunks ~7%,
# so the official number reflects device throughput (docs/PERF.md keeps
# the canonical 8-chunk step for kernel-level comparisons).
N_REP, N_FRAMES, N_RES = 32, 1000, 1024


def main():
    import jax
    import jax.numpy as jnp

    from spinrelax_tpu.ops.autocorr import ct_palmer

    # Timing methodology for the axon-tunnelled TPU: block_until_ready
    # acknowledges before remote execution completes, so we chain all
    # iterations into a device-side scalar accumulator and force ONE value
    # fetch at the end — total wall time then covers every execution plus
    # a single ~40 ms tunnel round-trip, amortised over n_iter.
    @jax.jit
    def gen(key):
        v = jax.random.normal(key, (N_REP, N_FRAMES, N_RES, 3), dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # Fold the accumulation into the step: ONE dispatch per iteration
    # (each extra chained op costs ~8 ms of relay round-trip, see
    # docs/PERF.md "dispatch overhead").
    @jax.jit
    def step(x, acc):
        Ct, dCt = ct_palmer(x)
        return acc + Ct[0, 0] + dCt[0, 0]

    # 2*n_iter+1 pre-staged fresh inputs at 32x1000x1024x3 f32 = 393 MB
    # each: n_iter=10 keeps the resident set ~8 GB, inside v5e HBM.
    n_iter = 10
    seed = int(time.time()) & 0x7FFFFFFF  # defeat any server-side result cache
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n_iter + 1)
    inputs = [gen(k) for k in keys]
    # Warm-up / compile and force completion of input generation.
    float(step(inputs[-1], jnp.float32(0.0)))

    # Two timed rounds; report the second (the remote executor reaches
    # steady state only after a dozen executions).
    dt = None
    for rnd in range(2):
        batch = inputs[rnd * n_iter : (rnd + 1) * n_iter]
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for x in batch:
            acc = step(x, acc)
        acc_val = float(acc)  # single fetch forces the whole chain
        dt = (time.perf_counter() - t0) / n_iter
        assert np.isfinite(acc_val)

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
