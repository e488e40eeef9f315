"""Separate device compute from the relay floor by workload scaling.

Measures the production ACF step at 1x/2x/4x the canonical batch in ONE
process run, then fits time = floor + slope * work.  The slope is the
true device time per canonical workload (the relay's per-dispatch cost
is batch-independent), giving the kernel's on-device throughput that
bench.py cannot resolve below the 0.9-1.9 ms dispatch floor
(docs/PERF.md "Kernel v2 iteration" / CLAUDE.md measurement rules).

Usage: python tools/exp_scaling.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

N_FRAMES, N_RES = 1000, 1024
N_DELTAS = N_FRAMES // 2


def measure(n_rep, iters=30):
    from spinrelax_tpu.ops.autocorr import ct_palmer

    @jax.jit
    def gen(key):
        v = jax.random.normal(key, (n_rep, N_FRAMES, N_RES, 3),
                              dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    @jax.jit
    def step(x, acc):
        Ct, dCt = ct_palmer(x)
        return acc + Ct[0, 0] + dCt[0, 0]

    x = gen(jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF))
    acc = step(x, jnp.zeros((), jnp.float32))
    for _ in range(10):
        acc = step(x, acc)
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = step(x, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    sizes = [8, 16, 32]
    times = []
    for n_rep in sizes:
        ms = measure(n_rep) * 1e3
        times.append(ms)
        print(f"n_rep={n_rep:3d}: {ms:7.2f} ms/step "
              f"({n_rep * N_FRAMES * N_RES / ms * 1e3:.3g} fv/s raw)",
              flush=True)
    # time = floor + slope * (n_rep / 8)
    A = np.stack([np.ones(len(sizes)), np.asarray(sizes) / 8.0], axis=1)
    (floor, slope), *_ = np.linalg.lstsq(A, np.asarray(times), rcond=None)
    fv = 8 * N_FRAMES * N_RES
    print(f"\nfit: time = {floor:.2f} ms (relay floor) + {slope:.2f} ms "
          f"per canonical 8x1000x1024 step")
    print(f"device-only throughput: {fv / slope * 1e3:.3g} frames*vectors/s")


if __name__ == "__main__":
    main()
