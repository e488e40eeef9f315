"""True multi-process ingest worker (one OS process = one "host").

Run N of these concurrently (tests/test_multihost_process.py does) to
execute the multi-host ingest design of ARCHITECTURE.md for real — not a
single-process simulation: each process owns a disjoint replica slice,
streams it through the production accumulator path
(parallel/ingest.host_stream), contributes its partial on its own "rep"
row of a GLOBAL mesh via ``jax.make_array_from_process_local_data``, and
ONE jitted sum over the sharded axis performs the cross-process
all-reduce (the DCN hop) through jax's gloo CPU collectives.

Usage: multihost_worker.py PROC_ID N_PROCS PORT OUT_NPZ
"""

import os
import sys


def main():
    proc_id, n_procs = int(sys.argv[1]), int(sys.argv[2])
    port, outfn = sys.argv[3], sys.argv[4]
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spinrelax_tpu.ops.autocorr import palmer_pooled_stats
    from spinrelax_tpu.parallel.ingest import host_stream

    # Deterministic synthetic replicas; each process OWNS a disjoint
    # slice (in production: its own trajectory files).
    R, F, N = 8, 32, 20
    rng = np.random.default_rng(123)
    vecs = rng.normal(size=(R, F, N, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    # Contiguous split that covers ALL replicas even when n_procs does
    # not divide R (the last host takes the remainder) — silently
    # dropping the tail would break the single-host equivalence this
    # worker exists to demonstrate.
    bounds = np.linspace(0, R, n_procs + 1).astype(int)
    own = vecs[bounds[proc_id] : bounds[proc_id + 1]]
    part = host_stream(iter([own]), F)

    # Global ("rep", "res") mesh across all processes' devices; jax
    # device order is process-major, so row p belongs to process p.
    devs = np.array(jax.devices()).reshape(n_procs, -1)
    mesh = Mesh(devs, ("rep", "res"))
    sh = NamedSharding(mesh, P("rep"))
    gshape = (n_procs,) + part.acc_s.shape
    gs = jax.make_array_from_process_local_data(sh, part.acc_s[None], gshape)
    gs2 = jax.make_array_from_process_local_data(
        sh, part.acc_s2[None], gshape
    )
    gc = jax.make_array_from_process_local_data(
        sh, np.asarray([float(part.count)]), (n_procs,)
    )

    @jax.jit
    def pool(s, s2, c):
        # The sum over the process-sharded axis IS the DCN all-reduce.
        return jnp.sum(s, axis=0), jnp.sum(s2, axis=0), jnp.sum(c)

    acc_s, acc_s2, count = pool(gs, gs2, gc)
    mean, dct = palmer_pooled_stats(acc_s, acc_s2, count)
    Ct, dCt = np.asarray(mean).T, np.asarray(dct).T
    if proc_id == 0:
        np.savez(outfn, Ct=Ct, dCt=dCt, count=float(count))
    assert float(count) == R, (float(count), R)
    print(f"[host {proc_id}] pooled {float(count):g} chunks OK", flush=True)


if __name__ == "__main__":
    main()
