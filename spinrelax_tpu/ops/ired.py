"""iRED / wiRED order parameters (Gu, Li & Brueschweiler, JCTC 2014).

The reference ships only empty stubs for these
(calculate-Ct-from-traj.py:156-180); this module provides working,
batched implementations.

isotropic Reorientational Eigenmode Dynamics (iRED):
  1. M_ij = < P2( v_i(t) . v_j(t) ) >  over a time window.
  2. Eigendecompose M (symmetric, nRes x nRes).
  3. The 5 largest-eigenvalue modes describe collective reorientation
     (the rank-2 global tumbling subspace); the remainder are internal.
  4. S2_i = 1 - sum_{k internal} lambda_k |psi_k,i|^2.

Window lengths: iRED averages over blocks of ~5*tau_c, wiRED over ~2*tau_c
(reference stub comments :156-180).  Per-block S2 estimates give a mean
and SEM, mirroring the Palmer block statistics convention.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class IredResult(NamedTuple):
    S2: jnp.ndarray  # (nRes,) mean over blocks
    dS2: jnp.ndarray  # (nRes,) SEM over blocks (sqrt(n)-1 convention)
    eigenvalues: jnp.ndarray  # (nBlocks, nRes) descending
    modes: jnp.ndarray  # (nBlocks, nRes, nRes) eigenvectors (columns)


def _ired_matrix(vecs):
    """M_ij = < P2(v_i . v_j) > over the frame axis.

    vecs : (nFrames, nRes, 3) unit vectors.

    Identity: (v_i . v_j)^2 = Q_i . Q_j with Q_i = vec(v_i v_i^T) (9
    components), so the frame average collapses to ONE MXU matmul over
    the (T*9) axis — O(T * nRes * 9) memory instead of materialising the
    (T, nRes, nRes) dot tensor (0.5 GB/block at 250 res x 1000 frames)."""
    T = vecs.shape[0]
    Q = vecs[:, :, :, None] * vecs[:, :, None, :]  # (T, nRes, 3, 3)
    Q = Q.reshape(T, vecs.shape[1], 9)
    return (1.5 / T) * jnp.einsum(
        "tic,tjc->ij", Q, Q, precision=jax.lax.Precision.HIGHEST
    ) - 0.5


@partial(jax.jit, static_argnames=("n_global",))
def ired_block_s2(vecs, n_global: int = 5):
    """S2 from one time block. vecs (nFrames, nRes, 3)."""
    M = _ired_matrix(vecs)
    vals, vecs_e = jnp.linalg.eigh(M)  # ascending
    n_res = M.shape[0]
    if n_res <= n_global:
        # vals[: n_res - n_global] would be a NEGATIVE slice, silently
        # misclassifying the smallest modes as internal; with every mode
        # global there is no internal relaxation at all.
        raise ValueError(
            f"iRED needs more residues ({n_res}) than global modes "
            f"({n_global}) to separate internal motion"
        )
    # Internal modes: all but the n_global largest.
    lam_int = vals[: n_res - n_global]
    psi_int = vecs_e[:, : n_res - n_global]  # (nRes, nInternal)
    s2 = 1.0 - jnp.sum(lam_int[None, :] * psi_int**2, axis=1)
    return s2, vals[::-1], vecs_e[:, ::-1]


def calculate_s2_ired(
    vecs, delta_t: float, tau: float, window_factor: float = 5.0, n_global: int = 5
) -> IredResult:
    """iRED S2 with block statistics.

    vecs : (nFrames, nRes, 3) lab-frame unit vectors (NOT superposed —
        iRED separates global from internal motion spectrally).
    tau  : isotropic tumbling time estimate; block length =
        window_factor * tau (5 for iRED, 2 for wiRED).
    """
    vecs = jnp.asarray(vecs)
    n_frames, n_res = vecs.shape[0], vecs.shape[1]
    n_per_block = max(int(window_factor * tau / delta_t), 2)
    n_blocks = n_frames // n_per_block
    if n_blocks < 1:
        raise ValueError(
            f"trajectory too short: {n_frames} frames < one window of "
            f"{n_per_block}"
        )
    v = vecs[: n_blocks * n_per_block].reshape(n_blocks, n_per_block, n_res, 3)
    s2, vals, modes = jax.vmap(lambda x: ired_block_s2(x, n_global=n_global))(v)
    S2 = jnp.mean(s2, axis=0)
    denom = jnp.sqrt(jnp.asarray(float(n_blocks), vecs.dtype)) - 1.0
    # n_blocks == 1 -> NaN, matching the repo-wide Palmer block-stats
    # convention (core.stats.palmer_pooled_stats): a single block has no
    # spread estimate, and a silent 0.0 would give that S2 infinite
    # weight in any chi-square.
    dS2 = jnp.where(
        denom > 0,
        jnp.std(s2, axis=0) / jnp.where(denom > 0, denom, 1.0),
        jnp.nan,
    )
    return IredResult(S2, dS2, vals, modes)


def calculate_s2_wired(vecs, delta_t: float, tau: float, n_global: int = 5) -> IredResult:
    """windowed iRED: 2*tau windows (reference stub :156-167)."""
    return calculate_s2_ired(vecs, delta_t, tau, window_factor=2.0, n_global=n_global)
