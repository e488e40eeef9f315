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
