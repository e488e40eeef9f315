"""Benchmark: P2-autocorrelation C(t) throughput on the flagship pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): frames x vectors / second for the
Palmer C(t) stage — the #1 compute sink of the reference workflow
(calculate-Ct-from-traj.py:200-238, an O(nDeltas * nFrames) einsum loop).

Baseline: the reference's numpy lag-loop implementation measured on this
container's CPU at the same canonical chunk size (1000 frames/chunk):
2.95e5 frames*vectors/s (measured via tools/bench_reference.py).  The
TPU path computes the identical statistics via batched FFTs.

What is timed: the streamed group step
(ops/autocorr.palmer_group_update_pretiled — fused Pallas ACF kernel +
per-chunk Palmer statistics folded into running sum/sum-of-squares
accumulators), the same compute the >HBM north-star driver runs per
group (tools/bench_northstar.py).  Inputs are pre-staged on device in
the kernel's native (nTiles, 3, nFrames, 128) tile layout — the layout
the north-star's device-side generator emits directly, and which a host
chunk loader can emit at ingest for free (the reorder is host-side
indexing, overlapped with file IO); the shipped file-fed stage
(stage_ct_streamed) computes bond vectors on device in (F, N, 3) and
pays one in-jit relayout instead.  So this number is the kernel +
statistics throughput without an XLA transpose pre-pass; see
docs/PERF.md for the transpose-inclusive step cost.  The pooled finish
(palmer_pooled_stats) runs once at the end, as in production streaming.
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
N_DELTAS = N_FRAMES // 2
N_TILES = (N_REP * N_RES) // 128


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: a fresh driver process deserialises the
    # compiled executables instead of re-paying remote AOT (minutes for
    # the fused Pallas program on a cold tunnel).
    try:
        from spinrelax_tpu.utils.compile_cache import enable_default

        enable_default()
    except Exception:
        pass

    from spinrelax_tpu.ops.autocorr import (
        palmer_group_update_pretiled,
        palmer_pooled_stats,
    )

    # Timing methodology for the axon-tunnelled TPU: block_until_ready
    # acknowledges before remote execution completes, so we chain all
    # iterations through device-side accumulators and force ONE value
    # fetch at the end — total wall time then covers every execution,
    # one finish() dispatch (~0.8 ms relay floor), and a single ~40 ms
    # tunnel round-trip, all amortised over n_iter.
    @jax.jit
    def gen(key):
        v = jax.random.normal(
            key, (N_TILES, 3, N_FRAMES, 128), dtype=jnp.float32
        )
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    # ONE dispatch per iteration (each extra chained op costs ~8 ms of
    # relay round-trip, see docs/PERF.md "dispatch overhead"): the whole
    # group step — ACF kernel + Palmer stats + accumulator update — is
    # one jitted program carrying the (nDeltas, nRes) running sums.
    @jax.jit
    def step(x, acc_s, acc_s2):
        return palmer_group_update_pretiled(x, acc_s, acc_s2, N_REP, N_RES)

    @jax.jit
    def finish(acc_s, acc_s2, count):
        mean, dct = palmer_pooled_stats(acc_s, acc_s2, count)
        return mean[0, 0] + dct[0, 0]

    # 2*n_iter+1 pre-staged fresh inputs, each (256, 3, 1000, 128) f32
    # = 393 MB (the tile layout of 32 chunks x 1000 frames x 1024
    # bonds): n_iter=10 keeps the resident set ~8 GB, inside v5e HBM.
    n_iter = 10
    seed = int(time.time()) & 0x7FFFFFFF  # defeat any server-side result cache
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n_iter + 1)
    inputs = [gen(k) for k in keys]
    zeros = lambda: jnp.zeros((N_DELTAS, N_RES), jnp.float32)  # noqa: E731
    # Warm-up / compile and force completion of input generation.
    a1, a2 = step(inputs[-1], zeros(), zeros())
    float(finish(a1, a2, jnp.float32(N_REP)))

    # Two timed rounds; report the second (the remote executor reaches
    # steady state only after a dozen executions).
    dt = None
    for rnd in range(2):
        batch = inputs[rnd * n_iter : (rnd + 1) * n_iter]
        t0 = time.perf_counter()
        acc_s, acc_s2 = zeros(), zeros()
        for x in batch:
            acc_s, acc_s2 = step(x, acc_s, acc_s2)
        # single fetch forces the whole chain
        probe = float(finish(acc_s, acc_s2, jnp.float32(n_iter * N_REP)))
        dt = (time.perf_counter() - t0) / n_iter
        assert np.isfinite(probe)

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
