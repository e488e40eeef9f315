"""True multi-process ingest worker (one OS process = one "host").

Run N of these concurrently (tests/test_multihost_process.py does) to
execute the multi-host ingest design of ARCHITECTURE.md for real — not a
single-process simulation: each process owns a disjoint replica slice,
streams it through the production accumulator path
(parallel/ingest.host_stream), contributes its partial on its own "rep"
row of a GLOBAL mesh via ``jax.make_array_from_process_local_data``, and
ONE jitted sum over the sharded axis performs the cross-process
all-reduce (the DCN hop) through jax's gloo CPU collectives.

Usage: multihost_worker.py PROC_ID N_PROCS PORT OUT_NPZ [flagship]

With the optional ``flagship`` mode the worker continues PAST the pooled
C(t): the pooled accumulators are laid out residue-sharded over the
GLOBAL (all-process) mesh and the FULL flagship finish
(parallel/streamed.run_sharded_finish: pooled Palmer stats -> DoF-ladder
model selection -> axisymmetric J with per-residue PAF vector ensembles
-> legacy ensemble rates) executes across every process's devices — the
ladder's per-rung LM and the ensemble-rates program are GSPMD-partitioned
over the multi-process mesh, and each rung's packed results reach the
host selection walk via a cross-process all-gather
(parallel/mesh.fetch).  This is the reference workhorse physics
(spectral_densities.py:2057-2077, fitting_Ct_functions.py:278-304) run
multi-HOST, not just multi-device.
"""

import os
import sys

# Deterministic flagship configuration shared by every process AND by
# the single-host reference computation in tests/test_multihost_process.
FLAGSHIP_SEED = 20260820
FLAGSHIP_R, FLAGSHIP_F, FLAGSHIP_N, FLAGSHIP_SAMP = 8, 32, 9, 12


def flagship_data():
    """Correlated random-walk bond vectors (real exponential structure —
    iid noise decays make the ladder's rung selection flip on 1-ulp
    reduction-order differences, see tests/test_flagship_sharded.py) plus
    a PAF vector ensemble, weights and per-residue CSA."""
    import numpy as np

    R, F, N, S = FLAGSHIP_R, FLAGSHIP_F, FLAGSHIP_N, FLAGSHIP_SAMP
    rng = np.random.default_rng(FLAGSHIP_SEED)
    steps = rng.normal(size=(R * F, N, 3))
    walk = np.empty((R * F, N, 3))
    walk[0] = steps[0] / np.linalg.norm(steps[0], axis=-1, keepdims=True)
    for t in range(1, R * F):
        w = walk[t - 1] + 0.25 * steps[t]
        walk[t] = w / np.linalg.norm(w, axis=-1, keepdims=True)
    chunks = walk.reshape(R, F, N, 3)
    vecs = rng.normal(size=(N, S, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    weights = rng.uniform(0.5, 2.0, (N, S))
    csa = rng.uniform(-180e-6, -160e-6, N)
    names = [str(i + 2) for i in range(N)]
    return chunks, vecs, weights, csa, names


def main():
    proc_id, n_procs = int(sys.argv[1]), int(sys.argv[2])
    port, outfn = sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "ingest"
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

    if mode == "flagship":
        return _run_flagship(proc_id, n_procs, outfn)
    if mode != "ingest":
        raise SystemExit(f"unknown mode {mode!r} (ingest|flagship)")

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


def _run_flagship(proc_id: int, n_procs: int, outfn: str):
    """Flagship finish over the GLOBAL multi-process mesh (see module
    docstring).  Every process runs identical host code in lockstep —
    the ladder's selection walk reads all-gathered rung results, so its
    ragged host decisions are identical on every process."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spinrelax_tpu.constants import NucleusPair, field_from_mhz
    from spinrelax_tpu.models import Diffusion
    from spinrelax_tpu.parallel.ingest import host_stream

    chunks, vecs, weights, csa, names = flagship_data()
    R, F, N = chunks.shape[:3]

    # 1. Per-host ingest of the OWN replica slice (production streaming
    # accumulator path), exactly as in the ingest mode.
    bounds = np.linspace(0, R, n_procs + 1).astype(int)
    part = host_stream(iter([chunks[bounds[proc_id]: bounds[proc_id + 1]]]), F)

    # 2. Cross-process pool: one jitted sum over the process-sharded
    # axis (gloo all-reduce), result replicated on every process.
    devs = np.array(jax.devices()).reshape(n_procs, -1)
    mesh = Mesh(devs, ("rep", "res"))
    sh = NamedSharding(mesh, P("rep"))
    gshape = (n_procs,) + part.acc_s.shape
    import jax.numpy as jnp

    gs = jax.make_array_from_process_local_data(sh, part.acc_s[None], gshape)
    gs2 = jax.make_array_from_process_local_data(sh, part.acc_s2[None], gshape)
    gc = jax.make_array_from_process_local_data(
        sh, np.asarray([float(part.count)]), (n_procs,)
    )
    pool = jax.jit(
        lambda s, s2, c: (jnp.sum(s, axis=0), jnp.sum(s2, axis=0), jnp.sum(c))
    )
    acc_s, acc_s2, count = (np.asarray(x) for x in pool(gs, gs2, gc))
    assert float(count) == R, (float(count), R)

    # 3. Residue-shard the pooled accumulators over the GLOBAL mesh
    # (pad the residue axis to a device-count multiple; the finish
    # slices back to n_res) and run the flagship finish across all
    # processes' devices.
    ndev = int(mesh.devices.size)
    pad = (-N) % ndev
    acc_s = np.pad(acc_s, ((0, pad), (0, 0)))
    acc_s2 = np.pad(acc_s2, ((0, pad), (0, 0)))
    res_sh = NamedSharding(mesh, P(("rep", "res"), None))
    acc_s_g = jax.device_put(acc_s, res_sh)
    acc_s2_g = jax.device_put(acc_s2, res_sh)

    from spinrelax_tpu.parallel.streamed import run_sharded_finish

    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    out = run_sharded_finish(
        mesh, acc_s_g, acc_s2_g, float(count),
        n_res=N, delta_t=1.0,
        diffusion=Diffusion.axisymmetric(diso=4e-5, aniso=1.5),
        pair=pair, vecs=vecs, weights=weights, csa=csa, zeta=0.89,
        names=names,
    )
    for f in ("R1", "R2", "NOE", "rho"):
        assert np.all(np.isfinite(getattr(out, f))), f
    if proc_id == 0:
        np.savez(
            outfn,
            Ct=out.Ct, dCt=out.dCt,
            S2=np.asarray(out.cts.S2), mask=np.asarray(out.cts.mask),
            C=np.asarray(out.cts.C), tau=np.asarray(out.cts.tau),
            R1=out.R1, R2=out.R2, NOE=out.NOE, rho=out.rho,
            dR1=out.dR1, dR2=out.dR2, dNOE=out.dNOE, drho=out.drho,
        )
    print(
        f"[host {proc_id}] flagship finish over global mesh OK "
        f"(ladder Kmax={int(np.asarray(out.cts.mask).sum(axis=1).max())})",
        flush=True,
    )


if __name__ == "__main__":
    main()
