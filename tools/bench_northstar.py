"""North-star benchmark (BASELINE.json): 10^4 bond vectors x 10^6 frames,
C(t) + multi-exponential fit + R1/R2/NOE end-to-end, target < 1 min on one
TPU v5e.

The frame axis streams through the device in groups of Palmer chunks with
running (sum, sum-of-squares) accumulators — the full trajectory never
exists in HBM.  Synthetic vectors are generated on device per group
(host->device streaming is a separate I/O concern; this measures the
compute path, matching how BASELINE.md defines the metric).

Usage: python tools/bench_northstar.py [--nres 10000] [--chunks 1000]
"""

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nres", type=int, default=10_000)
    p.add_argument("--chunks", type=int, default=1000, help="Palmer chunks")
    p.add_argument("--frames", type=int, default=1000, help="frames per chunk")
    p.add_argument("--group", type=int, default=4, help="chunks per device step")
    p.add_argument(
        "--mesh", type=int, default=0,
        help="shard over an N-device ('rep','res') mesh via the production "
        "sharded stream (parallel/streamed.py); 0 = single device",
    )
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "pallas"],
                   help="force the ACF backend (autocorr.ACF_IMPL)")
    a = p.parse_args()

    from spinrelax_tpu.ops import autocorr as _ac

    _ac.ACF_IMPL = a.impl

    import jax
    import jax.numpy as jnp

    from spinrelax_tpu.constants import NucleusPair
    from spinrelax_tpu.fit.lm import fit_multiexp
    from spinrelax_tpu.ops.autocorr import _acf_sums
    from spinrelax_tpu.ops.jomega import j_combine_isotropic
    from spinrelax_tpu.ops import relaxation as rx

    R, F, N, G = a.chunks, a.frames, a.nres, a.group
    assert R % G == 0
    D = F // 2

    if a.mesh:
        return run_sharded(a, R, F, N, G)

    n_vals = F - jnp.arange(1, D + 1, dtype=jnp.float32)

    from spinrelax_tpu.ops.pallas_acf import supports

    use_pretiled = (
        a.impl != "xla"
        and jax.default_backend() == "tpu"
        and supports(F, D)
    )
    if use_pretiled:
        # Generate straight into the kernel's native (nTiles, 3, F, 128)
        # tile layout (a loader can DMA host data into this layout just
        # as cheaply — it is only an index reordering at ingest), so no
        # XLA transpose/pad pre-pass runs per group.  Lag-leading
        # accumulators; one tiny transpose in finish().
        B = G * N
        n_tiles = -(-B // 128)

        from spinrelax_tpu.ops.autocorr import palmer_group_update_pretiled

        @jax.jit
        def group_step(key, acc_s, acc_s2):
            v = jax.random.normal(
                key, (n_tiles, 3, F, 128), dtype=jnp.float32
            )
            v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
            return palmer_group_update_pretiled(v, acc_s, acc_s2, G, N)
    else:

        @jax.jit
        def group_step(key, acc_s, acc_s2):
            v = jax.random.normal(key, (G, N, F, 3), dtype=jnp.float32)
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            s = _acf_sums(v, D)  # (G, N, D)
            # palmer_pooled_stats convention: e = per - 1, e**2.
            e = -1.5 + 1.5 * s / n_vals
            return acc_s + jnp.sum(e, axis=0), acc_s2 + jnp.sum(e**2, axis=0)

    pair = NucleusPair(time_unit="ps")
    omega = jnp.asarray(pair.omega5(), dtype=jnp.float32)
    f_dd, f_csa, tf = pair.factor_dd(), pair.factor_csa(), pair.time_fact
    gr = pair.gamma_b / pair.gamma_a

    @jax.jit
    def finish(acc_s, acc_s2):
        if use_pretiled:  # lag-leading accumulators: one tiny transpose
            acc_s, acc_s2 = acc_s.T, acc_s2.T
        from spinrelax_tpu.ops.autocorr import palmer_pooled_stats

        mean, dCt = palmer_pooled_stats(acc_s, acc_s2, float(R))
        dt = (jnp.arange(D, dtype=jnp.float32) + 1.0)
        sigma = jnp.where(dCt > 0, dCt, 1.0)  # SEM-weighted like the
        # reference (calculate-fitted-Ct.py:171)
        fit = fit_multiexp(dt, mean, sigma, K=2, s2_free=True)
        J = j_combine_isotropic(omega, 4242.0, fit.S2, fit.C, fit.tau)
        R1 = rx.r1_from_j(J, f_dd, f_csa, tf)
        R2 = rx.r2_from_j(J, f_dd, f_csa, tf)
        NOE = rx.noe_from_j(J, f_dd, tf, gr, R1)
        return mean, dCt, fit.S2, R1, R2, NOE

    # Warm-up compile of both programs on tiny state.
    key0 = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    acc_shape = (D, N) if use_pretiled else (N, D)
    acc_s = jnp.zeros(acc_shape, jnp.float32)
    acc_s2 = jnp.zeros(acc_shape, jnp.float32)
    w1, w2 = group_step(key0, acc_s, acc_s2)
    out = finish(w1, w2)
    float(out[3][0])  # force completion

    keys = jax.random.split(key0, R // G)
    t0 = time.perf_counter()
    acc_shape = (D, N) if use_pretiled else (N, D)
    acc_s = jnp.zeros(acc_shape, jnp.float32)
    acc_s2 = jnp.zeros(acc_shape, jnp.float32)
    for k in keys:
        acc_s, acc_s2 = group_step(k, acc_s, acc_s2)
    Ct, dCt, S2, R1, R2, NOE = finish(acc_s, acc_s2)
    r1_mean = float(jnp.mean(R1))  # single fetch forces everything
    elapsed = time.perf_counter() - t0
    assert np.isfinite(r1_mean)

    total_fv = R * F * N
    print(
        json.dumps(
            {
                "metric": "northstar_end_to_end_seconds",
                "value": elapsed,
                "unit": "s",
                "config": f"{N} vectors x {R * F} frames, C(t)+fit+R1R2NOE",
                "frames_x_vectors_per_s": total_fv / elapsed,
                "target_s": 60.0,
                "passed": elapsed < 60.0,
            }
        )
    )


def run_sharded(a, R, F, N, G):
    """North star over an n-device ("rep", "res") mesh via the production
    sharded stream: device-generated groups (already mesh-sharded, no host
    round-trip), shard_map ACF steps with one psum over "rep" per group,
    then the residue-sharded fit+rates finish."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spinrelax_tpu.parallel.mesh import make_mesh
    from spinrelax_tpu.parallel.streamed import (
        ShardedCtStream, make_sharded_finish,
    )

    mesh = make_mesh(a.mesh)
    stream = ShardedCtStream(mesh, F, N)
    Np = stream.n_res_pad
    # Device-generated groups must land evenly on the "rep" axis; round
    # the group size up and re-derive the chunk count.
    rep_dim = stream.rep_dim
    G = -(-G // rep_dim) * rep_dim
    n_groups = max(R // G, 1)
    R = n_groups * G
    group_sharding = NamedSharding(mesh, P("rep", None, "res", None))

    @partial(jax.jit, out_shardings=group_sharding)
    def gen(key):
        v = jax.random.normal(key, (G, F, Np, 3), dtype=jnp.float32)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    finish = make_sharded_finish(mesh, tau_iso=4242.0, delta_t=1.0,
                                 n_components=2)

    key0 = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    # Warm-up compile of both programs, then reset the statistics.
    stream.update(gen(key0))
    float(np.asarray(finish(*stream.accumulators()).R1)[0])
    stream.reset()

    keys = jax.random.split(key0, n_groups)
    t0 = time.perf_counter()
    for k in keys:
        stream.update(gen(k))
    out = finish(*stream.accumulators())
    r1_mean = float(jnp.mean(out.R1[:N]))  # single fetch forces everything
    elapsed = time.perf_counter() - t0
    assert np.isfinite(r1_mean)

    total_fv = R * F * N
    print(
        json.dumps(
            {
                "metric": "northstar_end_to_end_seconds",
                "value": elapsed,
                "unit": "s",
                "config": (
                    f"{N} vectors x {R * F} frames, C(t)+fit+R1R2NOE, "
                    f"sharded over {mesh.devices.shape} ('rep','res') mesh"
                ),
                "frames_x_vectors_per_s": total_fv / elapsed,
                "target_s": 60.0,
                "passed": elapsed < 60.0,
            }
        )
    )


if __name__ == "__main__":
    main()
