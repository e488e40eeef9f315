"""P2 orientational autocorrelation C(t) and order parameters S^2.

This is the #1 compute sink of the reference workflow
(``calculate-Ct-from-traj.py:200-238``): an O(nDeltas * nFrames) explicit
lag loop of einsums.  Here it becomes an O(N log N) FFT over the frame
axis using the tensor-component identity

    P2(v(t).v(t+dt)) = 1.5 * (v.v')^2 - 0.5
    (v.v')^2 = sum_ab [v_a v_b](t) * [v_a v_b](t+dt)

so the full lag profile is six real autocorrelations of the unique
outer-product components w_ab = v_a v_b.  Palmer's chunk statistics
(replicate mean +- SEM with the reference's sqrt(n)-1 denominator,
calculate-Ct-from-traj.py:228) are reproduced exactly.

Two drivers are provided:
- :func:`ct_palmer`       -- one fused jit for data that fits in HBM.
- :func:`ct_palmer_scan`  -- lax.scan over the replicate axis with
  sum/sum-of-squares accumulators for arbitrarily many replicates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Index pairs of the 6 unique outer-product components and their weights.
# Off-diagonals count twice in sum_ab; the weight enters the *component*
# (which is auto-correlated with itself), so it must be sqrt(2) to
# contribute a factor 2 in the correlation product.
_PAIR_I = (0, 1, 2, 0, 0, 1)
_PAIR_J = (0, 1, 2, 1, 2, 2)
_SQRT2 = 2.0**0.5
_PAIR_W = (1.0, 1.0, 1.0, _SQRT2, _SQRT2, _SQRT2)


def _fft_len(n: int) -> int:
    """Smallest power of two >= 2n (linear, non-circular correlation)."""
    m = 1
    while m < 2 * n:
        m *= 2
    return m


def _outer6(vecs):
    """(..., nF, 3) -> (..., nF, 6) weighted unique outer products."""
    comps = [
        w * vecs[..., i] * vecs[..., j]
        for i, j, w in zip(_PAIR_I, _PAIR_J, _PAIR_W)
    ]
    return jnp.stack(comps, axis=-1)


def _acf_sums(vecs, n_deltas: int):
    """Sum_t (v(t).v(t+delta))^2 for delta = 1..n_deltas via FFT.

    vecs : (..., nFrames, 3) -> (..., n_deltas)
    """
    n_frames = vecs.shape[-2]
    nfft = _fft_len(n_frames)
    w6 = _outer6(vecs)  # (..., nF, 6)
    W = jnp.fft.rfft(w6, n=nfft, axis=-2)
    acf = jnp.fft.irfft(W * jnp.conj(W), n=nfft, axis=-2)  # (..., nfft, 6)
    s = jnp.sum(acf[..., 1 : n_deltas + 1, :], axis=-1)  # weighted sum over ab
    return s


def ct_palmer(vecs):
    """C(t) with Palmer chunk statistics, one fused computation.

    Parameters
    ----------
    vecs : (nReplicates, nFrames, nResidues, 3) unit bond vectors, already
        reshaped into memory-time chunks (reference
        ``reformat_vecs_by_tau``, calculate-Ct-from-traj.py:245-275).

    Returns
    -------
    Ct, dCt : (nDeltas, nResidues) with nDeltas = nFrames // 2, matching
        calculate_Ct_Palmer (calculate-Ct-from-traj.py:200-238) exactly:
        per-replicate lag means, then mean / std/(sqrt(nRep)-1) across
        replicates.
    """
    vecs = jnp.asarray(vecs)
    n_rep, n_frames = vecs.shape[0], vecs.shape[1]
    n_deltas = n_frames // 2
    # (nRep, nRes, nF, 3) for FFT along a trailing-adjacent axis
    v = jnp.swapaxes(vecs, 1, 2)
    s = _acf_sums(v, n_deltas)  # (nRep, nRes, nDeltas)
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=vecs.dtype)
    per_rep = -0.5 + 1.5 * s / n_vals  # (nRep, nRes, nDeltas)
    Ct = jnp.mean(per_rep, axis=0)
    dCt = jnp.std(per_rep, axis=0) / (jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0)
    return Ct.T, dCt.T


def ct_palmer_scan(vecs, batch: int = 1):
    """Replicate-streamed variant for trajectories too large for one fused
    FFT buffer.  Scans over the replicate axis, accumulating per-lag sum and
    sum-of-squares; numerically equivalent to :func:`ct_palmer` (population
    std via E[x^2]-E[x]^2).

    vecs : (nReplicates, nFrames, nResidues, 3); nReplicates % batch == 0.
    """
    vecs = jnp.asarray(vecs)
    n_rep, n_frames, n_res, _ = vecs.shape
    n_deltas = n_frames // 2
    if n_rep % batch != 0:
        raise ValueError(f"nReplicates ({n_rep}) must be divisible by batch ({batch})")
    groups = vecs.reshape(n_rep // batch, batch, n_frames, n_res, 3)
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=vecs.dtype)

    def body(carry, chunk):
        acc_s, acc_s2 = carry
        v = jnp.swapaxes(chunk, 1, 2)  # (batch, nRes, nF, 3)
        s = _acf_sums(v, n_deltas)
        per_rep = -0.5 + 1.5 * s / n_vals  # (batch, nRes, nDeltas)
        acc_s = acc_s + jnp.sum(per_rep, axis=0)
        acc_s2 = acc_s2 + jnp.sum(per_rep**2, axis=0)
        return (acc_s, acc_s2), None

    init = (
        jnp.zeros((n_res, n_deltas), vecs.dtype),
        jnp.zeros((n_res, n_deltas), vecs.dtype),
    )
    (acc_s, acc_s2), _ = jax.lax.scan(body, init, groups)
    mean = acc_s / n_rep
    var = jnp.maximum(acc_s2 / n_rep - mean**2, 0.0)
    dCt = jnp.sqrt(var) / (jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0)
    return mean.T, dCt.T


def ct_palmer_direct(vecs):
    """O(N^2) lag-loop reference implementation (for parity tests against
    the FFT path; mirrors calculate-Ct-from-traj.py:222-228 literally)."""
    vecs = jnp.asarray(vecs)
    n_rep, n_frames, n_res, _ = vecs.shape
    n_deltas = n_frames // 2

    def one_delta(delta):
        n_vals = n_frames - delta
        # Use masking over a fixed-size slice so the shape is static.
        dots = jnp.einsum("ijkl,ijkl->ijk", vecs[:, : n_frames - 1], jnp.roll(vecs, -delta, axis=1)[:, : n_frames - 1])
        mask = (jnp.arange(n_frames - 1) < n_vals)[None, :, None]
        p2 = (-0.5 + 1.5 * dots**2) * mask
        per_rep = jnp.sum(p2, axis=1) / n_vals
        return per_rep  # (nRep, nRes)

    deltas = jnp.arange(1, n_deltas + 1)
    per_rep = jax.vmap(one_delta)(deltas)  # (nDeltas, nRep, nRes)
    Ct = jnp.mean(per_rep, axis=1)
    dCt = jnp.std(per_rep, axis=1) / (jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0)
    return Ct, dCt


def lag_times(delta_t: float, tau_memory: float):
    """The lag-time grid matching calculate_dt
    (calculate-Ct-from-traj.py:240-243)."""
    n_pts = int(0.5 * tau_memory / delta_t)
    return (jnp.arange(n_pts) + 1.0) * delta_t


def reformat_by_tau(vec_list, delta_t: float, tau_memory: float):
    """Concatenate per-trajectory (nFrames, nBonds, 3) arrays and reshape
    into Palmer chunks (nChunks, framesPerChunk, nBonds, 3), dropping
    remainder frames per source (calculate-Ct-from-traj.py:245-275)."""
    import numpy as np

    frames_per_chunk = int(tau_memory / delta_t)
    used = []
    for v in vec_list:
        n = (v.shape[0] // frames_per_chunk) * frames_per_chunk
        used.append(np.asarray(v[:n]))
    out = np.concatenate(used, axis=0)
    n_chunks = out.shape[0] // frames_per_chunk
    return out.reshape(n_chunks, frames_per_chunk, out.shape[-2], out.shape[-1])


# ---------------------------------------------------------------------------
# S^2 order parameters (calculate-Ct-from-traj.py:96-145)
# ---------------------------------------------------------------------------

def s2_outer(vecs):
    """S2 = 1.5 * sum_ab <v_a v_b>^2 - 0.5 with no block averaging.

    vecs : (nFrames, nResidues, 3) or (nFrames, 3).
    Returns (nResidues,) or scalar.
    """
    vecs = jnp.asarray(vecs)
    if vecs.ndim == 2:
        outer = jnp.einsum("ij,ik->jk", vecs, vecs) / vecs.shape[0]
        return 1.5 * jnp.sum(outer**2) - 0.5
    outer = jnp.einsum("ijk,ijl->jkl", vecs, vecs) / vecs.shape[0]
    return 1.5 * jnp.sum(outer**2, axis=(-2, -1)) - 0.5


def s2_outer_blocked(vecs, delta_t: float, tau_memory: float):
    """Block-averaged S2 with SEM using the reference's sqrt(n)-1
    denominator (calculate-Ct-from-traj.py:116-142).

    vecs : (nFrames, nResidues, 3).
    Returns (nResidues, 2) stacked [S2, dS2].
    """
    vecs = jnp.asarray(vecs)
    n_per_block = int(tau_memory / delta_t)
    n_blocks = vecs.shape[0] // n_per_block
    v = vecs[: n_blocks * n_per_block].reshape(
        n_blocks, n_per_block, vecs.shape[-2], vecs.shape[-1]
    )
    outer = jnp.einsum("ijkl,ijkm->iklm", v, v) / n_per_block
    s2 = 1.5 * jnp.sum(outer**2, axis=(-2, -1)) - 0.5  # (nBlocks, nRes)
    S2 = jnp.mean(s2, axis=0)
    dS2 = jnp.std(s2, axis=0) / (jnp.sqrt(jnp.asarray(n_blocks, vecs.dtype)) - 1.0)
    return jnp.stack([S2, dS2], axis=-1)
