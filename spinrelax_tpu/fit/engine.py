"""Batched multi-exponential LM engine over the fused Pallas kernels.

``fit_multiexp_engine`` solves a (B, T) batch of bounded multi-exp fits
with EXACTLY the trust-region/convergence semantics of
``fit.lm.lm_solve`` (damping schedule, ftol/xtol/stall gates, lane
freeze, covariance tail, reference quality flags via
``_finalise_multiexp``) — but the per-iteration heavy lifting (model,
Jacobian-free H = J^T J, g = J^T r, trial cost) runs in
``ops.pallas_lm``'s fused kernels on (T, B) lag-major operands, so the
(B, T, P) Jacobian never touches HBM.  ~6x per-iteration at the ladder
workload (docs/PERF.md round 5).

Routing (``LM_IMPL``): "auto" uses the engine for f32 batches on a
single-TPU-chip backend — the production ladder/finish path — and the
vmapped XLA path everywhere else (CPU, f64, multi-chip meshes, where
the byte-pinned parity tests live).  "xla" forces the classic path,
"pallas" forces the engine (tests use interpret mode on CPU).

Accuracy: H/g/cost agree with the XLA path to f32 rounding (summation
order differs; both are exact-f32-MAC pipelines), so LM trajectories
can diverge at accept/reject knife edges for individual lanes — the
same class of difference as running the XLA path at a different batch
fusion.  Selection-level agreement is pinned by the interpret-mode
tests against the vmapped path on realistic cohorts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pallas_lm as plm
from .lm import (
    MultiExpFit, _finalise_multiexp, _multiexp_res_jac, _spd_inv_diag_small,
    _chol_solve_small, _to_constrained, _to_unconstrained,
)

# "auto" | "xla" | "pallas" — see module docstring.
LM_IMPL = "auto"
# Interpret-mode default for the kernels (tests force the engine on CPU
# with LM_IMPL="pallas" + LM_INTERPRET=True).
LM_INTERPRET = False


def use_engine(dtype) -> bool:
    if LM_IMPL == "pallas":
        return True
    return (
        LM_IMPL == "auto"
        and jnp.dtype(dtype) == jnp.float32
        and jax.default_backend() == "tpu"
        and len(jax.devices()) == 1
    )


def impl_token():
    """Hashable token of everything the LM routing depends on.  Any jit
    wrapper whose TRACE consults the routing (fit.expfit._packed_fit,
    fit.walk.fit_ct_walk) must key its cache on this, or a mid-process
    LM_IMPL flip would silently keep executing the previously traced
    backend (the LM_INLOOP_PRECISION stale-jit trap, docs/PERF.md)."""
    return (LM_IMPL, LM_INTERPRET, jax.default_backend(),
            len(jax.devices()))


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def fit_multiexp_engine(dt, decay, sigma, K: int, s2_free: bool,
                        n_starts: int = 1, skip=None,
                        interpret: bool | None = None,
                        max_iter: int = 60) -> MultiExpFit:
    """Drop-in batched replacement for ``fit_multiexp`` (same bounds,
    initialisation, convergence gates, flags; see fit.lm).

    skip : optional (B,) bool — lanes created already-done (the
        in-graph walk's frozen broken lanes; their returned values are
        the projected initial guess, discarded by the caller).
    interpret : None resolves the LM_INTERPRET module flag at CALL time
        (so test flips take effect; it is a static jit arg below).
    """
    if interpret is None:
        interpret = LM_INTERPRET
    return _engine_jit(dt, decay, sigma, K, s2_free, n_starts, skip,
                       interpret, max_iter)


@partial(jax.jit, static_argnames=("K", "s2_free", "n_starts", "interpret",
                                   "max_iter"))
def _engine_jit(dt, decay, sigma, K: int, s2_free: bool,
                n_starts: int = 1, skip=None,
                interpret: bool = False,
                max_iter: int = 60) -> MultiExpFit:
    dt = jnp.asarray(dt)
    decay = jnp.asarray(decay)
    sigma = jnp.asarray(sigma)
    f32 = decay.dtype
    B, T = decay.shape
    P = plm.n_par(K, s2_free)
    tau_max = dt[-1] * 10.0
    n_sample = 10

    # --- initialisation (vectorised _init_multiexp) -------------------
    step = jnp.mean(dt[1:] - dt[:-1])
    tau0_shared = jnp.logspace(
        jnp.log10(step), jnp.log10(dt[-1] * 2.0), K + 2
    )[1:-1].astype(f32)
    avg_beg = jnp.mean(decay[:, :n_sample], axis=1)
    avg_end = jnp.mean(decay[:, -n_sample:], axis=1)
    C0s = jnp.abs(avg_beg - avg_end) / K  # (B,)
    C0 = jnp.repeat(C0s[:, None], K, axis=1)
    S20 = avg_end if s2_free else 1.0 - C0s

    # --- multi-start stacking (starts fold into the batch axis) -------
    if n_starts > 1:
        u = jnp.asarray(
            np.random.default_rng(12345).uniform(size=(n_starts - 1, K)),
            dt.dtype,
        )
        lo_l, hi_l = jnp.log(step * 0.5), jnp.log(dt[-1] * 2.0)
        extra = jnp.sort(jnp.exp(lo_l + u * (hi_l - lo_l)), axis=1)
        starts = jnp.concatenate([tau0_shared[None], extra], axis=0)
    else:
        starts = tau0_shared[None]
    S = starts.shape[0]
    BS = B * S
    # start-major stacking: lane b, start s -> row s*B + b
    dec_s = jnp.tile(decay, (S, 1))
    sig_s = jnp.tile(sigma, (S, 1))
    C0_s = jnp.tile(C0, (S, 1))
    S20_s = jnp.tile(S20, (S,))
    tau0_s = jnp.repeat(starts, B, axis=0)  # (BS, K)
    skip_s = (jnp.tile(skip, (S,)) if skip is not None
              else jnp.zeros((BS,), bool))

    if s2_free:
        p0 = jnp.concatenate([C0_s, tau0_s, S20_s[:, None]], axis=1)
        lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8), jnp.zeros(1)])
        hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max), jnp.ones(1)])
    else:
        p0 = jnp.concatenate([C0_s, tau0_s], axis=1)
        lo = jnp.concatenate([jnp.zeros(K), jnp.full(K, 1e-8)])
        hi = jnp.concatenate([jnp.ones(K), jnp.full(K, tau_max)])
    lo = lo.astype(f32)
    hi = hi.astype(f32)

    # --- padded lag-major operands for the kernels --------------------
    B_pad = _pad_up(BS, plm.LANES)
    T_pad = _pad_up(T, 8)
    P_pad = _pad_up(P, 8)

    def pad_tb(x):  # (BS, T) -> (T_pad, B_pad)
        out = jnp.zeros((T_pad, B_pad), f32)
        return out.at[:T, :BS].set(x.T)

    y_t = pad_tb(dec_s)
    isg_t = pad_tb(1.0 / sig_s)
    dt_t = jnp.zeros((T_pad, plm.LANES), f32).at[:T].set(
        dt.astype(f32)[:, None]
    )

    span = hi - lo
    t0 = _to_unconstrained(p0, lo, hi)  # (BS, P)

    ftol_v = 10.0 * jnp.finfo(f32).eps
    xtol = 1e-10
    xtol_rel_v = float(np.sqrt(jnp.finfo(f32).eps))
    stall_window = 8
    lam0 = 1e-3
    lam_stuck = 1e6

    def pt_of_t(t):  # (BS, P) -> (P_pad, B_pad) constrained
        p = _to_constrained(t, lo, hi)
        out = jnp.zeros((P_pad, B_pad), f32)
        return out.at[:P, :BS].set(p.T)

    def body(state):
        t, lam, it, done, c_best, c_mark = state
        H_p, g_p, c_old_pad = plm.hgc(pt_of_t(t), y_t, isg_t, dt_t, K,
                                      s2_free, interpret=interpret)
        H_p = H_p[:BS]
        g_p = g_p[:BS]
        c_old = c_old_pad[:BS]
        s = jax.nn.sigmoid(t)
        D = span[None, :] * s * (1.0 - s)  # (BS, P) chain rule
        H = H_p * D[:, :, None] * D[:, None, :]
        g = g_p * D
        A = H + (lam[:, None, None]
                 * jnp.eye(P, dtype=f32)
                 * jnp.maximum(
                     jnp.diagonal(H, axis1=1, axis2=2), 1e-12
                 )[:, None, :] * jnp.eye(P, dtype=f32))
        step_v = -_chol_solve_small(A, g)
        t_new = t + step_v
        c_new = plm.cost(pt_of_t(t_new), y_t, isg_t, dt_t, K, s2_free,
                         interpret=interpret)[:BS]
        improved = (c_new < c_old) & jnp.isfinite(c_new)
        t_next = jnp.where(improved[:, None], t_new, t)
        lam_next = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-12),
                             jnp.minimum(lam * 3.0, 1e10))
        small = jnp.max(jnp.abs(step_v), axis=1) < xtol
        flat = improved & ((c_old - c_new) <= ftol_v * c_old)
        small_rel = improved & (lam <= lam0) & (
            jnp.linalg.norm(step_v, axis=1)
            < xtol_rel_v * (xtol_rel_v + jnp.linalg.norm(t, axis=1))
        )
        c_best_next = jnp.minimum(
            jnp.minimum(c_best, jnp.where(jnp.isfinite(c_old), c_old,
                                          c_best)),
            jnp.where(jnp.isfinite(c_new), c_new, c_best),
        )
        at_window = (it + 1) % stall_window == 0
        stalled = (
            at_window & jnp.isfinite(c_mark) & (lam_next <= 100.0 * lam0)
            & ((c_mark - c_best_next)
               <= stall_window * ftol_v * c_best_next)
        )
        c_mark_next = jnp.where(at_window, c_best_next, c_mark)
        done_next = (done | (improved & small) | flat | small_rel
                     | stalled | (lam_next >= lam_stuck))
        t_next = jnp.where(done[:, None], t, t_next)
        lam_next = jnp.where(done, lam, lam_next)
        it_next = jnp.where(done, it, it + 1)
        return (t_next, lam_next, it_next, done_next, c_best_next,
                c_mark_next)

    def cond(state):
        _, _, it, done, _, _ = state
        return jnp.any((it < max_iter) & (~done))

    inf0 = jnp.full((BS,), jnp.inf, f32)
    t_fin, _, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (t0, jnp.full((BS,), lam0, f32), jnp.zeros((BS,), jnp.int32),
         skip_s, inf0, inf0),
    )
    p_fin = _to_constrained(t_fin, lo, hi)  # (BS, P)

    # --- per-lane covariance tail + finalisation (XLA, as lm_solve) ---
    def tail(p, y, sg, C0r, S20r):
        r_fin, Jp = _multiexp_res_jac(p, dt.astype(f32), y, sg, K, s2_free)
        cost_fin = 0.5 * jnp.sum(r_fin * r_fin)
        H = jnp.matmul(Jp.T, Jp, precision=jax.lax.Precision.HIGHEST)
        dof = jnp.maximum(r_fin.shape[0] - P, 1)
        red_chisq = jnp.sum(r_fin * r_fin) / dof
        dead = jnp.diag(H) == 0.0
        eye = jnp.eye(P, dtype=H.dtype)
        Hs = jnp.where(dead[:, None] | dead[None, :], eye, H)
        var = jnp.where(dead, 0.0, _spd_inv_diag_small(Hs)) * red_chisq
        perr = jnp.sqrt(jnp.clip(var, 0.0))
        C = p[:K]
        tau = p[K : 2 * K]
        S2 = p[-1] if s2_free else 1.0 - jnp.sum(C)
        dC = perr[:K]
        dtau = perr[K : 2 * K]
        dS2 = perr[-1] if s2_free else jnp.asarray(0.0, C.dtype)
        fin = _finalise_multiexp(dt.astype(f32), y, sg, C, tau, S2, dC,
                                 dtau, dS2, C0r, S20r, s2_free)
        return fin, cost_fin

    fin, cost_fin = jax.vmap(tail)(p_fin, dec_s, sig_s, C0_s, S20_s)
    if S > 1:
        # best start per lane by final cost; exact ties keep the cold
        # start (index 0), like fit_multiexp's argmin-first rule.
        cost_sb = cost_fin.reshape(S, B)
        best = jnp.argmin(cost_sb, axis=0)  # (B,)
        idx = best * B + jnp.arange(B)
        fin = tuple(f[idx] for f in fin)
    return MultiExpFit(*fin)
