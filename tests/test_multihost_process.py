"""REAL multi-process ingest: two OS processes, each a jax "host" with
its own devices, pool their streamed C(t) partials through an actual
cross-process collective (gloo CPU backend) — executing, not simulating,
the multi-host design of ARCHITECTURE.md / SURVEY §2.5 "communication
backend"."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_ingest_matches_single_host(tmp_path):
    out = str(tmp_path / "pooled.npz")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"host {i} failed:\n{log[-2000:]}"
        assert f"[host {i}] pooled 8 chunks OK" in log

    pooled = np.load(out)

    # Single-host reference on the identical deterministic data.
    import jax.numpy as jnp

    from spinrelax_tpu.ops.autocorr import ct_palmer

    rng = np.random.default_rng(123)
    vecs = rng.normal(size=(8, 32, 20, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    Ct, dCt = ct_palmer(jnp.asarray(vecs))
    np.testing.assert_allclose(pooled["Ct"], np.asarray(Ct), atol=1e-10)
    np.testing.assert_allclose(pooled["dCt"], np.asarray(dCt), atol=1e-10)


@pytest.mark.slow
def test_two_process_flagship_matches_single_process(tmp_path):
    """The FLAGSHIP physics (pooled stats -> DoF ladder -> symmtop J with
    vector ensembles -> legacy ensemble rates) executed across TWO OS
    processes over gloo — the ladder LM and the rates program
    GSPMD-partitioned over the global 2-process mesh, rung results
    reaching each process's selection walk via a cross-process
    all-gather (parallel/mesh.fetch) — equals the same finish run in ONE
    process on a mesh of the same shape."""
    import importlib.util

    out = str(tmp_path / "flagship.npz")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), out, "flagship"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"host {i} failed:\n{log[-3000:]}"
        assert f"[host {i}] flagship finish over global mesh OK" in log

    got = np.load(out)

    # Single-PROCESS control on a mesh of the same shape (2x2 over the
    # virtual CPU devices), from byte-identical pooled accumulators
    # (same per-slice host_stream + two-partial sum the workers ran).
    spec = importlib.util.spec_from_file_location("mh_worker", WORKER)
    mh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mh)
    from spinrelax_tpu.constants import NucleusPair, field_from_mhz
    from spinrelax_tpu.models import Diffusion
    from spinrelax_tpu.parallel.ingest import host_stream
    from spinrelax_tpu.parallel.mesh import make_mesh
    from spinrelax_tpu.parallel.streamed import run_sharded_finish

    chunks, vecs, weights, csa, names = mh.flagship_data()
    R, F, N = chunks.shape[:3]
    parts = [host_stream(iter([chunks[:4]]), F),
             host_stream(iter([chunks[4:]]), F)]
    acc_s = parts[0].acc_s + parts[1].acc_s
    acc_s2 = parts[0].acc_s2 + parts[1].acc_s2
    mesh = make_mesh(4)  # (2, 2): same shape as the workers' global mesh
    pad = (-N) % 4
    ref = run_sharded_finish(
        mesh,
        np.pad(acc_s, ((0, pad), (0, 0))),
        np.pad(acc_s2, ((0, pad), (0, 0))),
        float(R),
        n_res=N, delta_t=1.0,
        diffusion=Diffusion.axisymmetric(diso=4e-5, aniso=1.5),
        pair=NucleusPair(B0=field_from_mhz(600.133), time_unit="ps"),
        vecs=vecs, weights=weights, csa=csa, zeta=0.89, names=names,
    )

    np.testing.assert_allclose(got["Ct"], ref.Ct, rtol=1e-12)
    np.testing.assert_allclose(got["dCt"], ref.dCt, rtol=1e-12)
    np.testing.assert_array_equal(got["mask"], np.asarray(ref.cts.mask))
    np.testing.assert_allclose(
        got["S2"], np.asarray(ref.cts.S2), rtol=1e-8, atol=1e-12
    )
    for f in ("R1", "R2", "NOE", "rho", "dR1", "dR2", "dNOE", "drho"):
        np.testing.assert_allclose(
            got[f], getattr(ref, f), rtol=1e-8, atol=1e-12, err_msg=f
        )
