"""Fused Pallas LM engine (fit.engine / ops.pallas_lm) vs the vmapped
XLA path — interpret-mode on CPU (the real-TPU arm lives in
tools/tpu_smoke.py)."""

import numpy as np
import pytest

import spinrelax_tpu.fit.engine as eng
from spinrelax_tpu.fit.lm import _multiexp_res_jac, fit_multiexp
from spinrelax_tpu.ops import pallas_lm as plm


def _cohort(rng, B=192, T=300, noise=2e-3):
    dt = np.arange(1, T + 1, dtype=np.float32)
    S2 = rng.uniform(0.6, 0.9, B)
    C1 = rng.uniform(0.05, 0.2, B)
    tau1 = rng.uniform(5, 30, B)
    C2 = 1 - S2 - C1
    tau2 = rng.uniform(100, 400, B)
    y = (S2[:, None] + C1[:, None] * np.exp(-dt / tau1[:, None])
         + C2[:, None] * np.exp(-dt / tau2[:, None])
         + rng.normal(scale=noise, size=(B, T))).astype(np.float32)
    return dt, y, np.full_like(y, noise)


@pytest.mark.parametrize("K,s2f", [(1, False), (2, True), (4, True)])
def test_kernel_hgc_matches_jacobian_oracle(rng, K, s2f):
    """The fused H/g/cost kernel equals the explicit J^T J / J^T r /
    0.5||r||^2 from the analytic Jacobian to f32 rounding, including
    zeroed contributions from padded lags."""
    import jax.numpy as jnp

    P = plm.n_par(K, s2f)
    B, T, T_pad, P_pad = 128, 100, 104, 16
    dt = np.linspace(1, 100, T).astype(np.float32)
    y = rng.uniform(0.3, 1.0, (B, T)).astype(np.float32)
    sg = rng.uniform(0.5, 2.0, (B, T)).astype(np.float32)
    C = rng.uniform(0.01, 0.4, (B, K))
    tau = rng.uniform(1.0, 500.0, (B, K))
    S2 = rng.uniform(0.2, 0.8, B)
    cols = [C, tau] + ([S2[:, None]] if s2f else [])
    p = np.concatenate(cols, axis=1).astype(np.float32)

    p_t = np.zeros((P_pad, B), np.float32)
    p_t[:P] = p.T
    y_t = np.zeros((T_pad, B), np.float32)
    y_t[:T] = y.T
    isg_t = np.zeros((T_pad, B), np.float32)
    isg_t[:T] = (1.0 / sg).T
    dt_t = np.zeros((T_pad, plm.LANES), np.float32)
    dt_t[:T] = dt[:, None]

    H, g, c = plm.hgc(jnp.asarray(p_t), jnp.asarray(y_t),
                      jnp.asarray(isg_t), jnp.asarray(dt_t), K, s2f,
                      interpret=True)
    c2 = plm.cost(jnp.asarray(p_t), jnp.asarray(y_t), jnp.asarray(isg_t),
                  jnp.asarray(dt_t), K, s2f, interpret=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2), rtol=1e-6)

    for b in range(0, B, 17):
        r, J = _multiexp_res_jac(
            jnp.asarray(p[b]), jnp.asarray(dt), jnp.asarray(y[b]),
            jnp.asarray(sg[b]), K, s2f)
        r, J = np.asarray(r), np.asarray(J)
        np.testing.assert_allclose(np.asarray(H[b]), J.T @ J, rtol=3e-5,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g[b]), J.T @ r, rtol=3e-5,
                                   atol=1e-3)
        np.testing.assert_allclose(float(c[b]), 0.5 * np.sum(r * r),
                                   rtol=1e-5)


@pytest.mark.parametrize("K,s2f,ns", [(1, False, 1), (2, True, 1),
                                      (3, True, 1), (2, True, 4)])
def test_engine_matches_vmapped_path(rng, K, s2f, ns):
    """Engine (interpret mode) vs the vmapped XLA fit: agreement to f32
    trajectory tolerance — median chisq at rounding level, quality
    flags nearly everywhere (knife-edge accept/reject flips on
    overparameterised lanes are the expected residual, symmetric in
    direction)."""
    dt, y, sg = _cohort(rng)
    a = fit_multiexp(dt, y, sg, K=K, s2_free=s2f, n_starts=ns)
    b = eng.fit_multiexp_engine(dt, y, sg, K=K, s2_free=s2f, n_starts=ns,
                                interpret=True)
    ca, cb = np.asarray(a.chisq), np.asarray(b.chisq)
    rel = np.abs(cb - ca) / np.maximum(ca, 1e-12)
    assert np.median(rel) < 1e-4, np.median(rel)
    assert np.mean(rel < 1e-2) > 0.95, np.mean(rel < 1e-2)
    oka = np.asarray(a.ok_fit & a.ok_err & a.ok_sum)
    okb = np.asarray(b.ok_fit & b.ok_err & b.ok_sum)
    assert np.mean(oka == okb) > 0.95


def test_engine_skip_freezes_lanes(rng):
    """skip=True lanes return the projected initial guess (the walk
    discards them); skip=False lanes are unaffected by the skipped
    lanes' presence."""
    dt, y, sg = _cohort(rng, B=64)
    skip = np.zeros(64, bool)
    skip[::2] = True
    a = eng.fit_multiexp_engine(dt, y, sg, K=2, s2_free=True,
                                skip=skip, interpret=True)
    b = eng.fit_multiexp_engine(dt, y, sg, K=2, s2_free=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(a.chisq)[1::2],
                               np.asarray(b.chisq)[1::2], rtol=1e-6)
    # skipped lanes did NOT converge to the fit
    assert not np.allclose(np.asarray(a.chisq)[::2],
                           np.asarray(b.chisq)[::2])


def test_walk_with_engine_selects_like_xla(rng):
    """The in-graph ladder walk with the engine forced (interpret mode)
    selects the same models as the XLA walk on a clean hetero cohort."""
    from spinrelax_tpu.fit.expfit import fit_ct_ladder

    B, T = 96, 300
    dt = np.arange(1, T + 1, dtype=float)
    y = np.empty((B, T), np.float32)
    for b in range(B):
        k = b % 2 + 1
        S2 = rng.uniform(0.55, 0.9)
        C = rng.uniform(0.05, 0.2, k)
        C *= (1 - S2) / max(C.sum(), 1e-9) * rng.uniform(0.6, 1.0)
        tau = np.sort(rng.uniform(5, 40, k)) * (np.arange(k) * 9 + 1)
        y[b] = S2 + (C[:, None] * np.exp(-dt / tau[:, None])).sum(0)
    y += rng.normal(scale=1e-3, size=y.shape).astype(np.float32)
    dy = np.full_like(y, 1e-3)
    names = [str(i) for i in range(B)]

    xla = fit_ct_ladder(names, dt, y, dy)
    old_impl, old_int = eng.LM_IMPL, eng.LM_INTERPRET
    eng.LM_IMPL, eng.LM_INTERPRET = "pallas", True
    try:
        pal = fit_ct_ladder(names, dt, y, dy)
    finally:
        eng.LM_IMPL, eng.LM_INTERPRET = old_impl, old_int
    k_x = np.asarray(xla.mask).sum(1)
    k_p = np.asarray(pal.mask).sum(1)
    assert np.mean(k_x == k_p) >= 0.97, (k_x, k_p)
    agree = k_x == k_p
    np.testing.assert_allclose(np.asarray(pal.S2)[agree],
                               np.asarray(xla.S2)[agree], atol=5e-3)
