"""Fused Pallas TPU kernel for the P2 autocorrelation lag sums.

The XLA matmul-DFT path (`ops/autocorr._acf_sums`) materialises the
stage-1/stage-2 complex spectra and the power spectrum in HBM (~1 GB of
traffic per canonical step).  This kernel keeps the whole chain per
(replicate, residue-tile) program in VMEM:

    stage-1 DFT (K=N1 matmul) -> twiddle -> stage-2 DFT (K=128 matmul)
    -> power spectrum summed over the 6 outer components
    -> cosine-matrix inverse straight to the lag grid (K=nfft matmul)

Layout rules honoured for Mosaic: the FFT is factored as nfft = N1 * 128
so every reshape either merges/splits leading dims or splits the lane
dimension into (*, 128) — both supported.  The cheap elementwise outer
products stay on the host XLA side (fused into the producer).

Numerics identical to `_acf_sums` (same factor matrices); verified in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # TPU-only import; interpret mode works without it.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .autocorr import _PAIR_I, _PAIR_J, _PAIR_W

_N2 = 128  # lane width; nfft = N1 * 128


@functools.lru_cache(maxsize=8)
def _pallas_dft_constants(n_frames: int, n_deltas: int):
    """Factor matrices for nfft = N1 * 128, plus the cosine inverse whose
    row index is the (k1, k2) row-major position p = k1*128 + k2 of the
    in-kernel spectrum layout (frequency k = k1 + N1*k2)."""
    n_min = n_frames + n_deltas
    nfft = _N2
    while nfft < n_min:
        nfft *= 2
    N1 = nfft // _N2
    k1 = np.arange(N1)
    n2 = np.arange(_N2)
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(N1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / _N2)  # (n2, k2)
    TW = np.exp(-2j * np.pi * np.outer(k1, n2) / nfft)
    d = np.arange(1, n_deltas + 1)
    # p = k1*128 + k2  <->  k = k1 + N1*k2
    kk = (k1[:, None] + N1 * n2[None, :]).reshape(-1)  # row-major (k1, k2)
    CINV_T = (np.cos(2 * np.pi * np.outer(kk, d) / nfft) / nfft).astype(np.float32)
    f32 = np.float32
    return (
        nfft, N1,
        W1.real.astype(f32), W1.imag.astype(f32),
        TW.real.astype(f32), TW.imag.astype(f32),
        W2.real.astype(f32), W2.imag.astype(f32),
        CINV_T,  # (nfft, n_deltas)
    )


def _kernel(w6_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
            out_ref, *, N1, n_frames, c6):
    f32 = jnp.float32
    nfft = N1 * _N2
    w6 = w6_ref[0, 0]  # (C6, nFrames)
    x = jnp.concatenate(
        [w6, jnp.zeros((c6, nfft - n_frames), f32)], axis=1
    ).reshape(c6, N1, _N2)  # lane split into (*, 128): legal
    # Stage 1: contract n1 (size N1) -> A[c, k1, n2]
    A_r = jax.lax.dot_general(
        x, w1r_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (c, n2, k1)? dims: remaining x dims (c, n2), rhs remaining (k1) -> (c, n2, k1)
    A_i = jax.lax.dot_general(
        x, w1i_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # A currently (c, n2, k1); want (c, k1, n2) for the twiddle/stage-2.
    Ar = jnp.swapaxes(A_r, 1, 2)
    Ai = jnp.swapaxes(A_i, 1, 2)
    twr = twr_ref[...][None, :, :]
    twi = twi_ref[...][None, :, :]
    Br = Ar * twr - Ai * twi
    Bi = Ar * twi + Ai * twr
    # Stage 2: contract n2 (=128 lanes) -> X[(c,k1), k2]
    Br2 = Br.reshape(c6 * N1, _N2)
    Bi2 = Bi.reshape(c6 * N1, _N2)
    Xr = (
        jnp.dot(Br2, w2r_ref[...], preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        - jnp.dot(Bi2, w2i_ref[...], preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
    )
    Xi = (
        jnp.dot(Br2, w2i_ref[...], preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(Bi2, w2r_ref[...], preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
    )
    P = Xr * Xr + Xi * Xi  # ((c, k1), k2)
    T = c6 // 6
    P = P.reshape(6, T, N1, _N2)  # leading splits: legal
    P = jnp.sum(P, axis=0)  # (T, N1, 128)
    # The cosine-inverse matmul runs outside the kernel (its 6-pass
    # HIGHEST scratch blows the VMEM budget); the power spectrum is the
    # small tensor of the chain, so writing it to HBM costs little.
    out_ref[0, 0] = P.reshape(T, N1 * _N2)  # lane merge with 128 base


@functools.partial(jax.jit, static_argnames=("res_tile", "interpret", "n_min_len"))
def _power_spectrum_pallas(vecs, res_tile: int = 8, interpret: bool = False,
                           n_min_len: int = 0):
    """Pallas part only: (nRep, nRes, nFrames, 3) -> power spectrum
    (nRep, nRes, nfft).  Kept in its own jit so the (large) output buffer
    lands in HBM — fused into one program XLA tries to stage it in VMEM
    and OOMs."""
    vecs = jnp.asarray(vecs, jnp.float32)
    n_rep, n_res, n_frames, _ = vecs.shape
    if n_res % res_tile != 0:
        raise ValueError(f"nRes ({n_res}) must be divisible by res_tile ({res_tile})")
    (nfft, N1, W1r, W1i, TWr, TWi, W2r, W2i, _) = _pallas_dft_constants(
        n_frames, n_min_len
    )
    # Host-side outer products, laid out (rep, tile, comp*res_tile, F):
    # component-major within the tile so the kernel reshape is a pure
    # leading-dim split.
    comps = jnp.stack(
        [
            w * vecs[..., i] * vecs[..., j]
            for i, j, w in zip(_PAIR_I, _PAIR_J, _PAIR_W)
        ],
        axis=1,
    )  # (rep, 6, nRes, F)
    n_tiles = n_res // res_tile
    w6 = comps.reshape(n_rep, 6, n_tiles, res_tile, n_frames)
    w6 = jnp.moveaxis(w6, 2, 1).reshape(n_rep, n_tiles, 6 * res_tile, n_frames)

    c6 = 6 * res_tile
    kernel = functools.partial(_kernel, N1=N1, n_frames=n_frames, c6=c6)
    mem = {} if not _HAS_PLTPU else dict(memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape), **mem)
    power = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rep, n_tiles, res_tile, nfft), jnp.float32),
        grid=(n_rep, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, c6, n_frames), lambda i, j: (i, j, 0, 0), **mem),
            const_spec((N1, N1)),
            const_spec((N1, N1)),
            const_spec((N1, _N2)),
            const_spec((N1, _N2)),
            const_spec((_N2, _N2)),
            const_spec((_N2, _N2)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, res_tile, nfft), lambda i, j: (i, j, 0, 0), **mem
        ),
        interpret=interpret,
    )(w6, W1r, W1i, TWr, TWi, W2r, W2i)
    return power.reshape(n_rep, n_res, nfft)


@functools.partial(jax.jit, static_argnames=("n_frames", "n_deltas"))
def _cosine_inverse(power, n_frames: int, n_deltas: int):
    (_, _, _, _, _, _, _, _, CINV_T) = _pallas_dft_constants(
        int(n_frames), n_deltas
    )
    return jnp.einsum(
        "...k,kd->...d", power, CINV_T, precision=jax.lax.Precision.HIGHEST
    )


def acf_sums_pallas(vecs, n_deltas: int, res_tile: int = 8, interpret: bool = False):
    """Pallas-fused lag sums.  vecs (nRep, nRes, nFrames, 3) float32
    -> (nRep, nRes, n_deltas)."""
    n_frames = vecs.shape[-2]
    power = _power_spectrum_pallas(
        vecs, res_tile=res_tile, interpret=interpret, n_min_len=n_deltas
    )
    return _cosine_inverse(power, n_frames, n_deltas)


def ct_palmer_pallas(vecs, res_tile: int = 8, interpret: bool = False):
    """Drop-in ct_palmer using the fused Pallas kernel.
    vecs (nRep, nFrames, nRes, 3) -> (Ct, dCt) each (nDeltas, nRes)."""
    vecs = jnp.asarray(vecs, jnp.float32)
    n_rep, n_frames = vecs.shape[0], vecs.shape[1]
    n_deltas = n_frames // 2
    v = jnp.swapaxes(vecs, 1, 2)
    s = acf_sums_pallas(v, n_deltas, res_tile=res_tile, interpret=interpret)
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=jnp.float32)
    per_rep = -0.5 + 1.5 * s / n_vals
    Ct = jnp.mean(per_rep, axis=0)
    dCt = jnp.std(per_rep, axis=0) / (jnp.sqrt(jnp.float32(n_rep)) - 1.0)
    return Ct.T, dCt.T
