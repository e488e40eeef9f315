"""Fully-fused Pallas TPU kernel for the P2 autocorrelation lag sums.

Computes the same quantity as :func:`autocorr._acf_sums` — the matmul-DFT
correlation of the six outer-product components, complex-packed into
three signals — but keeps the ENTIRE chain (outer products, two-stage
DFT, twiddles, power spectrum, cosine inverse) in VMEM for one batch
tile of 128 bond vectors.  The XLA version materialises ~5 GB of f32
intermediates in HBM per canonical step (measured bandwidth-bound,
docs/PERF.md); here HBM traffic is just the input read + lag-sum write.

Dataflow per grid cell (one tile of 128 batch rows, batch on LANES):
    v     (3, nfft, 128)  component planes, frames on sublanes
    x     (nfft, 128) -> view (N1, N2*128): n = n1*N2 + n2 is a pure
                         row-major alias, no data movement
    A     = W1 @ x        contraction over n1        (N1, N2*128)
    B     = A * twiddle   (k1, n2) factors pre-broadcast over lanes
    B'    (N2, N1*128)    sublane-block transpose
    X     = W2^T @ B'     contraction over n2        (N2, N1*128)
    P    += |X|^2         accumulated over the 3 packed signals
    out   = CINV_K @ P    cosine inverse on the (k2, k1) frequency
                          order, straight to lags    (nD, 128)

Reference for the quantity: calculate-Ct-from-traj.py:200-238.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .autocorr import _PAIR_I, _PAIR_J, _PAIR_W

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=8)
def _kernel_constants(n_frames: int, n_deltas: int, dtype_name: str):
    """Host numpy constants for the fused kernel (lane-broadcast twiddles,
    (k2, k1)-ordered cosine inverse, lag rows padded to a sublane
    multiple)."""
    dt = np.dtype(dtype_name)
    n_min = n_frames + n_deltas
    nfft = ((n_min + 127) // 128) * 128
    N1 = int(np.sqrt(nfft))
    while nfft % N1 != 0:
        N1 += 1
    N2 = nfft // N1
    if N1 < N2:
        N1, N2 = N2, N1
    k1 = np.arange(N1)
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(N1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    TW = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / nfft)
    # Lane-broadcast twiddles: (k1, n2) -> (k1, n2*128)
    twr = np.repeat(TW.real, 128, axis=1).astype(dt)
    twi = np.repeat(TW.imag, 128, axis=1).astype(dt)
    # Cosine inverse on the kernel's (k2, k1) flattened frequency order:
    # position q = k2*N1 + k1 holds frequency f = k1 + N1*k2.
    d = np.arange(1, n_deltas + 1)
    kk = (np.arange(N1)[None, :] + N1 * np.arange(N2)[:, None]).reshape(-1)
    nd_pad = ((n_deltas + 7) // 8) * 8
    CINV = np.zeros((nd_pad, nfft), dtype=dt)
    CINV[:n_deltas] = np.cos(2 * np.pi * np.outer(d, kk) / nfft) / nfft
    return (
        nfft, N1, N2, nd_pad,
        W1.real.astype(dt), W1.imag.astype(dt),
        twr, twi,
        W2.real.T.copy().astype(dt), W2.imag.T.copy().astype(dt),
        CINV,
    )


def _acf_kernel(v_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2rt_ref,
                w2it_ref, cinv_ref, out_ref, *, N1, N2, nfft):
    f32 = v_ref.dtype
    vx = v_ref[0]
    vy = v_ref[1]
    vz = v_ref[2]
    comp_planes = {0: vx * vx, 1: vy * vy, 2: vz * vz}
    prods = {(0, 1): vx * vy, (1, 2): vy * vz, (0, 2): vx * vz}

    w1r, w1i = w1r_ref[...], w1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    w2rt, w2it = w2rt_ref[...], w2it_ref[...]

    def component(idx):
        i, j, w = _PAIR_I[idx], _PAIR_J[idx], _PAIR_W[idx]
        base = comp_planes[i] if i == j else prods[(i, j)]
        return w * base

    def half_dft(xr, xi):
        # x: (nfft, 128) -> (N1, N2*128) pure view
        xr = xr.reshape(N1, N2 * 128)
        xi = xi.reshape(N1, N2 * 128)
        ar = (jnp.dot(w1r, xr, precision=_HI)
              - jnp.dot(w1i, xi, precision=_HI))
        ai = (jnp.dot(w1i, xr, precision=_HI)
              + jnp.dot(w1r, xi, precision=_HI))
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        # (N1, N2, 128) -> (N2, N1, 128): sublane-block transpose
        brt = jnp.swapaxes(br.reshape(N1, N2, 128), 0, 1).reshape(N2, N1 * 128)
        bit = jnp.swapaxes(bi.reshape(N1, N2, 128), 0, 1).reshape(N2, N1 * 128)
        xr2 = (jnp.dot(w2rt, brt, precision=_HI)
               - jnp.dot(w2it, bit, precision=_HI))
        xi2 = (jnp.dot(w2it, brt, precision=_HI)
               + jnp.dot(w2rt, bit, precision=_HI))
        return xr2 * xr2 + xi2 * xi2  # (N2, N1*128)

    power = jnp.zeros((N2, N1 * 128), f32)
    for pair in range(3):
        xr = component(2 * pair)
        xi = component(2 * pair + 1)
        power = power + half_dft(xr, xi)

    pf = power.reshape(nfft, 128)
    out_ref[...] = jnp.dot(cinv_ref[...], pf, precision=_HI)


def acf_sums_pallas(vecs, n_deltas: int):
    """Drop-in replacement for autocorr._acf_sums on TPU.

    vecs : (..., nFrames, 3) -> (..., n_deltas) lag sums of
    (v(t).v(t+delta))^2.
    """
    lead = vecs.shape[:-2]
    n_frames = vecs.shape[-2]
    dtype = jnp.float32  # the fused kernel is f32; f64 falls back upstream
    (nfft, N1, N2, nd_pad, W1r, W1i, twr, twi, W2rt, W2it, CINV) = (
        _kernel_constants(n_frames, n_deltas, "float32")
    )
    B = int(np.prod(lead)) if lead else 1
    b_pad = ((B + 127) // 128) * 128
    v = vecs.reshape(B, n_frames, 3).astype(dtype)
    # (B, F, 3) -> (3, F, B) with frame and batch padding
    v = jnp.transpose(v, (2, 1, 0))
    v = jnp.pad(v, ((0, 0), (0, nfft - n_frames), (0, b_pad - B)))

    grid = (b_pad // 128,)
    consts = [jnp.asarray(c) for c in (W1r, W1i, twr, twi, W2rt, W2it, CINV)]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim) for c in consts
    ]
    out = pl.pallas_call(
        functools.partial(_acf_kernel, N1=N1, N2=N2, nfft=nfft),
        grid=grid,
        in_specs=[pl.BlockSpec((3, nfft, 128), lambda i: (0, 0, i))]
        + const_specs,
        out_specs=pl.BlockSpec((nd_pad, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nd_pad, b_pad), dtype),
    )(v, *consts)
    out = out[:n_deltas, :B]  # drop sublane/batch padding
    return jnp.transpose(out).reshape(lead + (n_deltas,)).astype(vecs.dtype)
