"""Fused Pallas evaluation kernels for the batched multi-exponential LM.

The vmapped XLA LM iteration (fit.lm.lm_solve over _multiexp_residual)
is HBM-bound, not FLOP-bound: each iteration materialises the
(B, T, P) Jacobian and streams it through two HIGHEST-precision
batched matmuls plus two residual passes — ~2.8 ms/iteration at the
ladder's K=4 rung (B=1e4, T=500) against a ~0.3 ms traffic floor
(docs/PERF.md round 5).  These kernels compute everything an LM
iteration needs from ONE pass over the (T, B) data resident in VMEM:

  ``hgc``  : packed upper-triangular J^T J, J^T r and 0.5*||r||^2
  ``cost`` : 0.5*||r||^2 only (the trial-step evaluation)

in the model's natural building blocks (the K exponential planes are
computed once and every Jacobian column is a closed-form scaling of
them — fit.lm._multiexp_res_jac's algebra, evaluated in-kernel so the
(T, P) Jacobian never exists in HBM).

Layout: batch on the LANE axis (tiles of 128 problems), lags on
sublanes — (T_pad, B_pad) operands, (P or NH, B_pad) params/outputs.
Pad lags carry isg = 0 so they contribute exactly nothing; pad lanes
are discarded by the caller.

Accuracy: in-kernel f32 accumulation over T (a tree reduction) differs
from the XLA HIGHEST f32 matmul only in summation order — both are
exact-f32-MAC pipelines — so H/g agree to f32 rounding (pinned by the
interpret-mode parity test).  The engine built on these kernels
(fit.engine) is therefore gated to the TPU f32 path, like the fused
ACF kernel; f64/CPU keep the XLA path bit-for-bit.

Reference: the kernels accelerate the same curve_fit-style fits the
reference runs sequentially per residue (fitting_Ct_functions.py:
306-345); semantics live one level up in fit.lm / fit.engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def n_par(K: int, s2_free: bool) -> int:
    return 2 * K + (1 if s2_free else 0)


def _planes(p_ref, dt, isg, K: int, s2_free: bool):
    """Shared model/Jacobian-plane algebra: returns (r-free) pieces.

    p_ref rows: [C_0..C_{K-1}, tau_0..tau_{K-1}, (S2)].
    Returns (model (T,L), planes list of P (T,L) arrays already * isg).
    """
    C = [p_ref[k : k + 1, :] for k in range(K)]
    tau = [p_ref[K + k : K + k + 1, :] for k in range(K)]
    E = [jnp.exp(-dt / tau[k]) for k in range(K)]
    if s2_free:
        S2 = p_ref[2 * K : 2 * K + 1, :]
    else:
        S2 = 1.0
        for k in range(K):
            S2 = S2 - C[k]
    model = S2 + sum(C[k] * E[k] for k in range(K))
    planes = []
    for k in range(K):  # dC columns
        planes.append((E[k] if s2_free else E[k] - 1.0) * isg)
    for k in range(K):  # dtau columns
        planes.append((C[k] / (tau[k] * tau[k])) * dt * E[k] * isg)
    if s2_free:
        planes.append(jnp.ones_like(model) * isg)
    return model, planes


def _hgc_kernel(p_ref, y_ref, isg_ref, dt_ref, out_ref, *, K: int,
                s2_free: bool):
    dt = dt_ref[...]
    isg = isg_ref[...]
    model, planes = _planes(p_ref, dt, isg, K, s2_free)
    r = (model - y_ref[...]) * isg
    P = len(planes)
    rows = []
    for i in range(P):  # packed upper triangle of J^T J
        for j in range(i, P):
            rows.append(jnp.sum(planes[i] * planes[j], axis=0,
                                keepdims=True))
    for i in range(P):  # J^T r
        rows.append(jnp.sum(planes[i] * r, axis=0, keepdims=True))
    rows.append(0.5 * jnp.sum(r * r, axis=0, keepdims=True))  # cost
    nh = len(rows)
    pad = (-nh) % 8
    if pad:
        rows.append(jnp.zeros((pad, r.shape[1]), r.dtype))
    out_ref[...] = jnp.concatenate(rows, axis=0)


def _cost_kernel(p_ref, y_ref, isg_ref, dt_ref, out_ref, *, K: int,
                 s2_free: bool):
    dt = dt_ref[...]
    isg = isg_ref[...]
    C = [p_ref[k : k + 1, :] for k in range(K)]
    tau = [p_ref[K + k : K + k + 1, :] for k in range(K)]
    E = [jnp.exp(-dt / tau[k]) for k in range(K)]
    if s2_free:
        S2 = p_ref[2 * K : 2 * K + 1, :]
    else:
        S2 = 1.0
        for k in range(K):
            S2 = S2 - C[k]
    model = S2 + sum(C[k] * E[k] for k in range(K))
    r = (model - y_ref[...]) * isg
    c = 0.5 * jnp.sum(r * r, axis=0, keepdims=True)
    out_ref[...] = jnp.concatenate(
        [c, jnp.zeros((7, r.shape[1]), r.dtype)], axis=0
    )


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("K", "s2_free", "interpret"))
def hgc(p_t, y_t, isg_t, dt_t, K: int, s2_free: bool,
        interpret: bool = False):
    """Fused H/g/cost over a (P_pad, B_pad) parameter batch.

    p_t   : (P_pad, B_pad) constrained params, rows as in _planes.
    y_t   : (T_pad, B_pad) decays (lag-major).
    isg_t : (T_pad, B_pad) 1/sigma, 0 on padded lags.
    dt_t  : (T_pad, LANES) lag times replicated across lanes.

    Returns (H (B_pad, P, P) symmetric, g (B_pad, P), cost (B_pad,)).
    """
    P = n_par(K, s2_free)
    T_pad, B_pad = y_t.shape
    nh = P * (P + 1) // 2 + P + 1
    nh_pad = _pad_up(nh, 8)
    grid = (B_pad // LANES,)
    out = pl.pallas_call(
        functools.partial(_hgc_kernel, K=K, s2_free=s2_free),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_t.shape[0], LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nh_pad, LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nh_pad, B_pad), y_t.dtype),
        interpret=interpret,
    )(p_t, y_t, isg_t, dt_t)
    # unpack: upper-tri H, then g, then cost
    iu, ju = np.triu_indices(P)
    H = jnp.zeros((B_pad, P, P), y_t.dtype)
    tri = out[: len(iu)]  # (ntri, B)
    H = H.at[:, iu, ju].set(tri.T)
    H = H.at[:, ju, iu].set(tri.T)
    g = out[len(iu) : len(iu) + P].T
    cost = out[len(iu) + P]
    return H, g, cost


@functools.partial(
    jax.jit, static_argnames=("K", "s2_free", "interpret"))
def cost(p_t, y_t, isg_t, dt_t, K: int, s2_free: bool,
         interpret: bool = False):
    """Fused 0.5*||r||^2 (trial-step evaluation) -> (B_pad,)."""
    T_pad, B_pad = y_t.shape
    grid = (B_pad // LANES,)
    out = pl.pallas_call(
        functools.partial(_cost_kernel, K=K, s2_free=s2_free),
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_t.shape[0], LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, i)),
            pl.BlockSpec((T_pad, LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, B_pad), y_t.dtype),
        interpret=interpret,
    )(p_t, y_t, isg_t, dt_t)
    return out[0]
