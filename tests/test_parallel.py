"""Multi-device sharding tests on the 8-device virtual CPU mesh, plus the
fused pipeline's numerical agreement with the staged path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spinrelax_tpu.parallel.mesh import make_mesh, vecs_sharding
from spinrelax_tpu.parallel.pipeline import make_forward, make_sharded_forward


def make_vecs(rng, n_rep=4, n_frames=64, n_res=8):
    # Smooth random walks so the fits see real decays.
    v = rng.normal(size=(n_rep, 1, n_res, 3))
    out = [v / np.linalg.norm(v, axis=-1, keepdims=True)]
    for _ in range(n_frames - 1):
        nxt = out[-1] + 0.12 * rng.normal(size=(n_rep, 1, n_res, 3))
        nxt /= np.linalg.norm(nxt, axis=-1, keepdims=True)
        out.append(nxt)
    return np.concatenate(out, axis=1)


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("rep", "res")
    # 8 -> (4, 2) balanced split
    assert sorted(mesh.devices.shape) == [2, 4]


def test_pipeline_single_device(rng):
    vecs = make_vecs(rng)
    fwd = jax.jit(make_forward(tau_iso=500.0))
    out = fwd(jnp.asarray(vecs))
    assert out.R1.shape == (8,)
    assert np.all(np.isfinite(np.asarray(out.R1)))
    assert np.all(np.asarray(out.S2) >= 0) and np.all(np.asarray(out.S2) <= 1)


def test_sharded_matches_single_device(rng):
    vecs = make_vecs(rng, n_rep=4, n_frames=64, n_res=8)
    fwd1 = jax.jit(make_forward(tau_iso=500.0))
    ref = fwd1(jnp.asarray(vecs))

    mesh = make_mesh(8)
    fwd8 = make_sharded_forward(mesh, tau_iso=500.0)
    vd = jax.device_put(jnp.asarray(vecs), vecs_sharding(mesh))
    out = fwd8(vd)
    np.testing.assert_allclose(np.asarray(out.Ct), np.asarray(ref.Ct), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out.R1), np.asarray(ref.R1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.NOE), np.asarray(ref.NOE), rtol=1e-6)


def test_graft_entry_compiles():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    assert np.all(np.isfinite(np.asarray(out.R1)))
    # dryrun path (8 virtual devices already active in the test session)
    mod.dryrun_multichip(8)
