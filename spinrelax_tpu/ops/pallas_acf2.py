"""Experimental v2 fused ACF kernel (perf iteration; merged into
pallas_acf.py when a variant wins).

Differences from pallas_acf.py:
- input layout (nTiles, 3, F, 128): each grid cell's tile is CONTIGUOUS
  in HBM (the v1 (3, nfft, B) layout makes every tile a strided gather
  of 512-byte rows — suspected DMA bottleneck), and frames are NOT
  nfft-padded in HBM (kernel zero-pads in VMEM), cutting input traffic
  by nfft/F (~1.5x).
- optional 3-pass compensated-bf16 dots (precision="split3"): operands
  split into bf16 hi+lo, products hi*hi + hi*lo + lo*hi with f32
  accumulation — half the MXU passes of HIGHEST.
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
def _kernel_constants(n_frames: int, n_deltas: int, dtype_name: str,
                      n1: int = 0):
    """Host numpy constants (lane-broadcast twiddles, (k2, k1)-ordered
    cosine inverse, lag rows padded to a sublane multiple).  ``n1``
    overrides the near-square radix split (must divide nfft)."""
    dt = np.dtype(dtype_name)
    n_min = n_frames + n_deltas
    nfft = ((n_min + 127) // 128) * 128
    if n1:
        if nfft % n1 != 0:
            # grow nfft to the next multiple of lcm(128, n1)
            import math

            step = 128 * n1 // math.gcd(128, n1)
            nfft = ((n_min + step - 1) // step) * step
        N1 = n1
    else:
        N1 = int(np.sqrt(nfft))
        while nfft % N1 != 0:
            N1 += 1
    N2 = nfft // N1
    if not n1 and N1 < N2:
        N1, N2 = N2, N1
    k1 = np.arange(N1)
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(N1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    TW = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / nfft)
    twr = np.repeat(TW.real, 128, axis=1).astype(dt)
    twi = np.repeat(TW.imag, 128, axis=1).astype(dt)
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


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b):
    """3-pass compensated bf16 matmul ~= f32 dot at half HIGHEST cost."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    f32 = jnp.float32
    return (
        jnp.dot(ah, bh, preferred_element_type=f32)
        + jnp.dot(ah, bl, preferred_element_type=f32)
        + jnp.dot(al, bh, preferred_element_type=f32)
    )


def _dot4(a, b):
    """4-pass split: keeps the lo*lo term (one extra bit of headroom)."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    f32 = jnp.float32
    return (
        jnp.dot(ah, bh, preferred_element_type=f32)
        + jnp.dot(ah, bl, preferred_element_type=f32)
        + jnp.dot(al, bh, preferred_element_type=f32)
        + jnp.dot(al, bl, preferred_element_type=f32)
    )


# Compensated splits packed into the CONTRACTION dimension: on K < 128
# contractions the MXU pads K to a full tile, so the extra split terms
# ride along "for free" — one matmul of K = T*K0 replaces T separate
# passes.  Term pairs (w_term, x_term) with terms ordered hi, mid, lo:
_PAIRS_CAT3 = ((0, 0), (0, 1), (1, 0))                      # ~2^-18 error
# cat4 adds the lo*lo term: K = 4*K0 pads to the SAME number of 128-wide
# MXU K-tiles as 3*K0 for K0 in {48, 32} — strictly better accuracy at
# identical matmul cost.
_PAIRS_CAT4 = ((0, 0), (0, 1), (1, 0), (1, 1))
_PAIRS_CAT6 = ((0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (0, 2))  # ~HIGHEST


def _split_terms_np(W, n):
    """Host-side n-term bf16 decomposition of an f32 constant matrix."""
    import ml_dtypes

    terms = []
    r = W.astype(np.float32)
    for _ in range(n):
        h = r.astype(ml_dtypes.bfloat16)
        terms.append(h)
        r = r - h.astype(np.float32)
    return terms


def _cat_lhs_np(W, pairs):
    """Pre-concatenated LHS for the K-packed compensated dot:
    (M, K) f32 -> (M, T*K) bf16 with one block per term pair."""
    n_w = max(wi for wi, _ in pairs) + 1
    terms = _split_terms_np(np.asarray(W), n_w)
    return np.concatenate([terms[wi] for wi, _ in pairs], axis=1)


def _cat_rhs(x, pairs):
    """In-kernel RHS: (K, N) f32 -> (T*K, N) bf16 stacked split terms."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    n_x = max(xi for _, xi in pairs) + 1
    terms = []
    r = x
    for _ in range(n_x):
        h = r.astype(bf16)
        terms.append(h)
        r = r - h.astype(f32)
    return jnp.concatenate([terms[xi] for _, xi in pairs], axis=0)


def _make_cat_dot(pairs):
    def cat_dot(w_cat_ref_value, x_rhs):
        return jnp.dot(w_cat_ref_value, x_rhs,
                       preferred_element_type=jnp.float32)

    return cat_dot


# mode -> (stage1 pairs, stage2 pairs, centered); None pairs = HIGHEST /
# split3 handled separately.  Mixed modes exist because the two stages
# limit accuracy differently: stage-2 operates on the spectral output of
# stage 1 whose magnitudes are ~sqrt(F) larger, so its bf16 operand
# residual dominates — cat46c upgrades only stage 2 to the 3-term split.
_CAT_MODES = {
    "cat3c": (_PAIRS_CAT3, _PAIRS_CAT3, True),
    "cat4c": (_PAIRS_CAT4, _PAIRS_CAT4, True),
    "cat6c": (_PAIRS_CAT6, _PAIRS_CAT6, True),
    "cat6": (_PAIRS_CAT6, _PAIRS_CAT6, False),
    "cat46c": (_PAIRS_CAT4, _PAIRS_CAT6, True),
    "cat64c": (_PAIRS_CAT6, _PAIRS_CAT4, True),
}


def _acf_kernel2(v_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2rt_ref,
                 w2it_ref, cinv_ref, out_ref, *, N1, N2, nfft, F, mode,
                 tri_ref=None, nd_pad=None, cinv_mode="same",
                 pcenter=False, ablate=0, fuse_transpose=False):
    f32 = v_ref.dtype
    pairs1, pairs2, centered = _CAT_MODES.get(
        mode, (None, None, mode == "split3c")
    )
    hi_dot = lambda a, b: jnp.dot(a, b, precision=_HI)  # noqa: E731
    if pairs1:
        # bf16 LHS (pre-cat) x bf16 RHS with f32 accumulation.
        dot = lambda a, b: jnp.dot(  # noqa: E731
            a, b, preferred_element_type=jnp.float32
        )
        dot2 = dot
    else:
        dot = _dot3 if mode in ("split3", "split3c") else hi_dot
        dot2 = dot
    cinv_dot = {"same": _dot3 if pairs1 else dot, "highest": hi_dot,
                "split4": _dot4}[cinv_mode]

    # ablate (perf diagnosis only): truncate the chain after stage
    # -1=input DMA only, 1=comps, 2=+stage1 dots, 3=+twiddle,
    # 4=+transpose, 5=+stage2 dots; partial results are sum-reduced into
    # the output so nothing is DCE'd.
    if fuse_transpose:
        # Input block is the free (128, 3F) view of 128 bonds' (F, 3)
        # rows; one in-VMEM transpose replaces the whole-array XLA
        # pre-pass (which the ablation showed costs ~half the step).
        x2d = jnp.swapaxes(v_ref[0], 0, 1)  # (3F, 128)
        if ablate == -1:
            out_ref[...] = jnp.zeros((nd_pad, 128), f32) + jnp.sum(x2d)
            return
        x3 = x2d.reshape(F, 3, 128)  # leading-dim split: free view
        vx = x3[:, 0, :]
        vy = x3[:, 1, :]
        vz = x3[:, 2, :]
    else:
        if ablate == -1:
            out_ref[...] = (jnp.zeros((nd_pad, 128), f32)
                            + jnp.sum(v_ref[0, 0]) + jnp.sum(v_ref[0, 1])
                            + jnp.sum(v_ref[0, 2]))
            return
        vx = v_ref[0, 0]  # (F, 128)
        vy = v_ref[0, 1]
        vz = v_ref[0, 2]
    comp_planes = {0: vx * vx, 1: vy * vy, 2: vz * vz}
    prods = {(0, 1): vx * vy, (1, 2): vy * vz, (0, 2): vx * vz}

    w1r, w1i = w1r_ref[...], w1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    w2rt, w2it = w2rt_ref[...], w2it_ref[...]

    zpad = jnp.zeros((nfft - F, 128), f32)

    # Mean-centering accumulators (split3c): the bf16-split dots lose
    # ~2^-18 relative per product, amplified by the DC spike of the
    # outer-product signals.  Centering each component by its own mean
    # removes the spike; the EXACT algebraic identity
    #   acf_w(d) = acf_delta(d) + m*(2*S - P_d - T_d) + m^2*(F-d),
    #   P_d = sum_{t<d} delta_t,  T_d = sum_{t>=F-d} delta_t,
    #   S = sum_t delta_t  (held for ANY m-hat)
    # restores the uncentered statistics via cheap 1-D corrections: one
    # (nd_pad, 2*nd_pad) triangular matmul for all P/T at once plus
    # per-lane scalar rows.
    head_acc = jnp.zeros((nd_pad, 128), f32) if centered else None
    tail_acc = jnp.zeros((nd_pad, 128), f32) if centered else None
    sc_acc = jnp.zeros((1, 128), f32) if centered else None
    msq_acc = jnp.zeros((1, 128), f32) if centered else None

    def component(idx):
        i, j, w = _PAIR_I[idx], _PAIR_J[idx], _PAIR_W[idx]
        base = comp_planes[i] if i == j else prods[(i, j)]
        return w * base  # (F, 128)

    abl_acc = jnp.zeros((nd_pad, 128), f32) if ablate else None

    def half_dft(xr, xi):
        nonlocal abl_acc
        xr = xr.reshape(N1, N2 * 128)
        xi = xi.reshape(N1, N2 * 128)
        if ablate == 1:
            abl_acc = abl_acc + jnp.sum(xr) + jnp.sum(xi)
            return None
        if pairs1:
            xr_rhs = _cat_rhs(xr, pairs1)
            xi_rhs = _cat_rhs(xi, pairs1)
            ar = dot(w1r, xr_rhs) - dot(w1i, xi_rhs)
            ai = dot(w1i, xr_rhs) + dot(w1r, xi_rhs)
        else:
            ar = dot(w1r, xr) - dot(w1i, xi)
            ai = dot(w1i, xr) + dot(w1r, xi)
        if ablate == 2:
            abl_acc = abl_acc + jnp.sum(ar) + jnp.sum(ai)
            return None
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        if ablate == 3:
            abl_acc = abl_acc + jnp.sum(br) + jnp.sum(bi)
            return None
        brt = jnp.swapaxes(br.reshape(N1, N2, 128), 0, 1).reshape(N2, N1 * 128)
        bit = jnp.swapaxes(bi.reshape(N1, N2, 128), 0, 1).reshape(N2, N1 * 128)
        if ablate == 4:
            abl_acc = abl_acc + jnp.sum(brt) + jnp.sum(bit)
            return None
        if pairs2:
            brt_rhs = _cat_rhs(brt, pairs2)
            bit_rhs = _cat_rhs(bit, pairs2)
            xr2 = dot2(w2rt, brt_rhs) - dot2(w2it, bit_rhs)
            xi2 = dot2(w2it, brt_rhs) + dot2(w2rt, bit_rhs)
        else:
            xr2 = dot2(w2rt, brt) - dot2(w2it, bit)
            xi2 = dot2(w2it, brt) + dot2(w2rt, bit)
        if ablate == 5:
            abl_acc = abl_acc + jnp.sum(xr2) + jnp.sum(xi2)
            return None
        return xr2 * xr2 + xi2 * xi2  # (N2, N1*128)

    power = jnp.zeros((N2, N1 * 128), f32)
    for pair in range(3):
        planes = []
        for idx in (2 * pair, 2 * pair + 1):
            plane = component(idx)  # (F, 128)
            if centered:
                m = jnp.sum(plane, axis=0, keepdims=True) * (1.0 / F)
                delta = plane - m
                s_tot = jnp.sum(delta, axis=0, keepdims=True)
                head_acc = head_acc + m * delta[:nd_pad]
                tail_acc = tail_acc + m * delta[F - nd_pad : F]
                sc_acc = sc_acc + m * (2.0 * s_tot)
                msq_acc = msq_acc + m * m
                plane = delta
            planes.append(jnp.concatenate([plane, zpad], axis=0))
        p = half_dft(planes[0], planes[1])
        if p is not None:
            power = power + p
    if ablate:
        out_ref[...] = abl_acc
        return

    pf = power.reshape(nfft, 128)
    if pcenter:
        # CINV rows sum to zero over k (geometric sum), so subtracting
        # the per-lane spectral mean is EXACT — and it removes the
        # all-positive offset of the power spectrum that otherwise
        # dominates the compensated-bf16 contraction error.
        pf = pf - jnp.mean(pf, axis=0, keepdims=True)
    out = cinv_dot(cinv_ref[...], pf)
    if centered:
        pt = _dot3(tri_ref[...], jnp.concatenate([head_acc, tail_acc], axis=0))
        d = (
            jax.lax.broadcasted_iota(jnp.int32, (nd_pad, 1), 0).astype(f32)
            + 1.0
        )
        out = out - pt + sc_acc + msq_acc * (F - d)
    out_ref[...] = out


def acf_sums_pallas2(vecs, n_deltas: int, mode: str = "highest",
                     n1: int = 0, cinv: str = "same", pcenter: bool = False,
                     ablate: int = 0, fuse_transpose: bool = False):
    """vecs : (..., nFrames, 3) -> (..., n_deltas)."""
    lead = vecs.shape[:-2]
    n_frames = vecs.shape[-2]
    dtype = jnp.float32
    cinv_mode = cinv
    (nfft, N1, N2, nd_pad, W1r, W1i, twr, twi, W2rt, W2it, CINV) = (
        _kernel_constants(n_frames, n_deltas, "float32", n1)
    )
    B = int(np.prod(lead)) if lead else 1
    b_pad = ((B + 127) // 128) * 128
    n_tiles = b_pad // 128
    v = vecs.reshape(B, n_frames, 3).astype(dtype)
    if b_pad != B:
        v = jnp.concatenate(
            [v, jnp.zeros((b_pad - B, n_frames, 3), dtype)], axis=0
        )
    if fuse_transpose:
        # Free row-major view: (B, F, 3) -> (nTiles, 128, F*3); the
        # kernel transposes each tile in VMEM (one XLU pass) instead of
        # XLA materialising the transposed copy in HBM.
        v = v.reshape(n_tiles, 128, n_frames * 3)
        v_spec = pl.BlockSpec(
            (1, 128, n_frames * 3), lambda i: (i, 0, 0)
        )
    else:
        # (B, F, 3) -> (nTiles, 3, F, 128): contiguous 3*F*128*4B/tile.
        v = jnp.transpose(v.reshape(n_tiles, 128, n_frames, 3), (0, 3, 2, 1))
        v_spec = pl.BlockSpec(
            (1, 3, n_frames, 128), lambda i: (i, 0, 0, 0)
        )

    pairs1, pairs2, _ = _CAT_MODES.get(mode, (None, None, None))
    if pairs1:
        W1r = _cat_lhs_np(W1r, pairs1)
        W1i = _cat_lhs_np(W1i, pairs1)
        W2rt = _cat_lhs_np(W2rt, pairs2)
        W2it = _cat_lhs_np(W2it, pairs2)
    const_arrays = [W1r, W1i, twr, twi, W2rt, W2it, CINV]
    if mode in ("split3c", "cat3c", "cat4c", "cat6c", "cat46c", "cat64c"):
        if n_frames < nd_pad:
            raise ValueError(
                f"split3c needs nFrames ({n_frames}) >= padded lag rows "
                f"({nd_pad})"
            )
        # TRI = [L | U]: L[r, t] = 1 for t <= r (prefix sums P_d, d=r+1);
        # U[r, j] = 1 for j >= nd_pad-1-r (suffix sums T_d over the last
        # nd_pad rows).
        r = np.arange(nd_pad)[:, None]
        L = (np.arange(nd_pad)[None, :] <= r).astype(np.float32)
        U = (np.arange(nd_pad)[None, :] >= nd_pad - 1 - r).astype(np.float32)
        TRI = np.concatenate([L, U], axis=1)
        const_arrays.append(TRI)
    consts = [jnp.asarray(c) for c in const_arrays]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim) for c in consts
    ]

    def kernel(v_ref, w1r, w1i, twr_, twi_, w2rt, w2it, cinv, *rest):
        if mode in ("split3c", "cat3c", "cat4c", "cat6c", "cat46c",
                    "cat64c"):
            tri_ref, out_ref = rest
        else:
            tri_ref, out_ref = None, rest[0]
        _acf_kernel2(v_ref, w1r, w1i, twr_, twi_, w2rt, w2it, cinv, out_ref,
                     N1=N1, N2=N2, nfft=nfft, F=n_frames, mode=mode,
                     tri_ref=tri_ref, nd_pad=nd_pad, cinv_mode=cinv_mode,
                     pcenter=pcenter, ablate=ablate,
                     fuse_transpose=fuse_transpose)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[v_spec] + const_specs,
        out_specs=pl.BlockSpec((nd_pad, 128), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nd_pad, b_pad), dtype),
    )(v, *consts)
    out = out[:n_deltas, :B]
    return jnp.transpose(out).reshape(lead + (n_deltas,)).astype(vecs.dtype)
