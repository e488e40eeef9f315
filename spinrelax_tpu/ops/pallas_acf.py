"""Fused Pallas ACF kernel — the production TPU fast path for the
Palmer C(t) lag sums (selected by ``autocorr.ACF_IMPL``; replaces the
reference's O(nDeltas*nFrames) einsum lag loop,
calculate-Ct-from-traj.py:200-238).

Design (one 128-bond tile per grid program, whole chain in VMEM):
- input layout (nTiles, 3, F, 128): each tile CONTIGUOUS in HBM, frames
  NOT nfft-padded in HBM (the kernel zero-pads in VMEM), cutting input
  traffic by nfft/F (~1.5x);
- two-stage Cooley-Tukey matmul DFT with the 2-for-1 complex packing
  (6 real outer-product signals -> 3 complex DFTs);
- stage-1 contraction truncated to K1 = ceil(F/N2) rows (the zero pad
  fills whole trailing rows of the row-major (n1, n2) split);
- complex multiplies as single stacked [W_r; W_i] @ [X_r | X_i] dots;
- compensated bf16 MXU dots: operands split into bf16 hi/mid/lo terms
  CONCATENATED along the contraction axis (the split terms ride the
  MXU's K-padding for free — modes cat3c/cat4c/cat6c/cat64c/cat46c
  choose the term-pair set per stage), with exact mean-centering and
  closed-form corrections to keep the DC-heavy signals accurate;
- the production default ``cat64c + split4 CINV + pcenter`` measures
  3.0 ms/step at the canonical 8x1000x1024 workload (2.7e9 fv/s) with
  9.7e-7 max C(t) error vs float64 (docs/PERF.md, tools/exp_acf.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .autocorr import _PAIR_I, _PAIR_J, _PAIR_W

_HI = jax.lax.Precision.HIGHEST

# Mosaic's DEFAULT scoped-VMEM limit is 16 MiB — but that is a compiler
# default, not the hardware: TPU v5e has 128 MiB of physical VMEM.  The
# round-2/3 "VMEM OOM" negatives (fuse_transpose, dg2, 256-lane tiles)
# were artifacts of the default limit; raising it per-kernel via
# CompilerParams(vmem_limit_bytes=...) compiles and runs fine (measured
# 2026-08-17 on the v5e: the pretiled-parameter operand case needs
# 16.91 MiB and executes correctly at a 64 MiB limit).  Half the
# physical VMEM is a safe ceiling that still leaves the scheduler room
# for double-buffered DMA windows.
# All three were re-measured under the unlock; all three are now
# MEASURED negatives, not OOM inferences — lanes=256 (acf_sums_pallas
# lanes=) runs 13.0 vs 11.0-11.1 ms/step for v10 at nrep=32 in either
# execution order, identical Ct_err 9.74e-7 (2026-08-20, round 4,
# tools/exp_acf.py v10_l256; docs/PERF.md).  The wider tile halves the
# grid but doubles every VMEM working plane, and the deeper DMA/compute
# windows schedule worse than two independent 128-lane programs.
VMEM_LIMIT_BYTES = 64 * 1024 * 1024


@functools.lru_cache(maxsize=8)
def _kernel_constants(n_frames: int, n_deltas: int, dtype_name: str,
                      n1: int = 0, lanes: int = 128):
    """Host numpy constants (lane-broadcast twiddles, (k2, k1)-ordered
    cosine inverse, lag rows padded to a sublane multiple).  ``n1``
    overrides the near-square radix split (must divide nfft);
    ``lanes`` is the tile's lane width (twiddles broadcast per lane)."""
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
    # Stage-1 contraction truncation: with the row-major (n1, n2) split
    # (n = N2*n1 + n2), the zero-padded tail t >= nFrames fills WHOLE
    # trailing rows n1 >= ceil(F/N2) — those columns of W1 multiply
    # zeros, so the stage-1 DFT only needs K1 = ceil(F/N2) of its N1
    # contraction terms (a 1/3 MXU cut at the canonical 1000/1536 shape).
    K1 = int(np.ceil(n_frames / N2))
    k1 = np.arange(N1)
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(K1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    TW = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / nfft)
    twr = np.repeat(TW.real, lanes, axis=1).astype(dt)
    twi = np.repeat(TW.imag, lanes, axis=1).astype(dt)
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
# Modes that carry the exact mean-centering corrections (need the TRI
# constant and nFrames >= nd_pad) — derived, so a new _CAT_MODES entry
# cannot drift out of sync with the kernel plumbing.
_CENTERED_MODES = frozenset(
    m for m, (_, _, c) in _CAT_MODES.items() if c
) | {"split3c"}


def _tri_dot(tri, x):
    """Exact 2-pass compensated dot for the BINARY (0/1) TRI constant:
    tri is bf16-representable exactly, so _dot3's al term is identically
    zero and its al@bh pass pure waste — hi/lo split the RHS only.
    Bit-identical to _dot3 (the dropped pass contributes exact zeros)."""
    th = tri.astype(jnp.bfloat16)
    xh, xl = _split_bf16(x)
    f32 = jnp.float32
    return (
        jnp.dot(th, xh, preferred_element_type=f32)
        + jnp.dot(th, xl, preferred_element_type=f32)
    )


def _acf_kernel2(vx, vy, vz, w1r_ref, w1i_ref, twr_ref, twi_ref, w2rt_ref,
                 w2it_ref, cinv_ref, *, N1, N2, nfft, F, mode,
                 tri_ref=None, nd_pad=None, cinv_mode="same",
                 pcenter=False, ablate=0, dg2=False, lanes=128):
    """One ``lanes``-bond tile's full chain: (F, lanes) component planes
    -> (nd_pad, lanes) lag sums (pure value function; refs only for
    consts).  lanes=128 is the production tile; wider lanes halve the
    grid-program count at proportionally wider dots (the round-4
    A/B lever the scoped-VMEM unlock made possible)."""
    f32 = vx.dtype
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
    if ablate == -1:
        return (jnp.zeros((nd_pad, lanes), f32)
                + jnp.sum(vx) + jnp.sum(vy) + jnp.sum(vz))
    comp_planes = {0: vx * vx, 1: vy * vy, 2: vz * vz}
    prods = {(0, 1): vx * vy, (1, 2): vy * vz, (0, 2): vx * vz}

    w1r, w1i = w1r_ref[...], w1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    w2rt, w2it = w2rt_ref[...], w2it_ref[...]

    K1 = -(-F // N2)  # stage-1 truncated contraction length
    # No zero-row pad when F is an exact multiple of N2: Mosaic rejects
    # 0-sized vector constants ("positive constant sizes but got 0, N"),
    # so the flagship forward failed to compile ON TPU for exactly those
    # shapes (latent since round 1 — the CPU-backend driver check passes
    # because XLA:CPU tolerates the empty broadcast; found round 4).
    n_zpad = K1 * N2 - F
    zpad = jnp.zeros((n_zpad, lanes), f32) if n_zpad else None

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
    head_acc = jnp.zeros((nd_pad, lanes), f32) if centered else None
    tail_acc = jnp.zeros((nd_pad, lanes), f32) if centered else None
    sc_acc = jnp.zeros((1, lanes), f32) if centered else None
    msq_acc = jnp.zeros((1, lanes), f32) if centered else None

    def component(idx):
        i, j, w = _PAIR_I[idx], _PAIR_J[idx], _PAIR_W[idx]
        base = comp_planes[i] if i == j else prods[(i, j)]
        return w * base  # (F, 128)

    abl_acc = jnp.zeros((nd_pad, lanes), f32) if ablate else None

    def half_dft(xr, xi):
        nonlocal abl_acc
        xr = xr.reshape(K1, N2 * lanes)
        xi = xi.reshape(K1, N2 * lanes)
        if ablate == 1:
            abl_acc = abl_acc + jnp.sum(xr) + jnp.sum(xi)
            return None
        # Complex multiply as ONE stacked dot: [W_r; W_i] @ [X_r | X_i]
        # yields all four cross products in a single MXU pass with
        # M = 2*N1 <= 128 — two 48-row dots waste 5/8 of every padded
        # 128-row MXU tile, the stacked 96-row dot only 1/4.
        if pairs1:
            xr_rhs = _cat_rhs(xr, pairs1)
            xi_rhs = _cat_rhs(xi, pairs1)
        else:
            xr_rhs, xi_rhs = xr, xi
        n_c = N2 * lanes
        w1s = jnp.concatenate([w1r, w1i], axis=0)  # (2*N1, K)
        rhs1 = jnp.concatenate([xr_rhs, xi_rhs], axis=1)  # (K, 2*n_c)
        o1 = dot(w1s, rhs1)  # (2*N1, 2*n_c)
        ar = o1[:N1, :n_c] - o1[N1:, n_c:]
        ai = o1[N1:, :n_c] + o1[:N1, n_c:]
        if ablate == 2:
            abl_acc = abl_acc + jnp.sum(ar) + jnp.sum(ai)
            return None
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        if ablate == 3:
            abl_acc = abl_acc + jnp.sum(br) + jnp.sum(bi)
            return None
        if dg2:
            # Stage-2 via dot_general contracting the MIDDLE dim of the
            # (N1, N2, 128) view: the corner turn rides the MXU operand
            # staging instead of an explicit Mosaic relayout (the
            # transpose measures 1.5 ms/step of the nrep=32 ablation).
            def dg_dot(w, b3):
                if pairs2:
                    # K-packed split terms concatenated on the CONTRACTED
                    # middle dim, mirroring _cat_rhs.
                    n_x = max(xi for _, xi in pairs2) + 1
                    terms, r = [], b3
                    for _ in range(n_x):
                        h = r.astype(jnp.bfloat16)
                        terms.append(h)
                        r = r - h.astype(jnp.float32)
                    b3 = jnp.concatenate(
                        [terms[xi] for _, xi in pairs2], axis=1
                    )
                return jax.lax.dot_general(
                    w, b3,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=None if pairs2 else _HI,
                )  # (2*N2, N1, 128)

            w2s = jnp.concatenate([w2rt, w2it], axis=0)
            o2r = dg_dot(w2s, br.reshape(N1, N2, lanes))
            o2i = dg_dot(w2s, bi.reshape(N1, N2, lanes))
            if ablate == 5:
                abl_acc = abl_acc + jnp.sum(o2r) + jnp.sum(o2i)
                return None
            xr2 = o2r[:N2] - o2i[N2:]  # (N2, N1, lanes)
            xi2 = o2i[:N2] + o2r[N2:]
            # Leading-dim merge (N2, N1, lanes) -> (nfft, lanes): a free
            # row-major view, flat index k2*N1 + k1 matching CINV's kk.
            return (xr2 * xr2 + xi2 * xi2).reshape(nfft, lanes)
        brt = jnp.swapaxes(br.reshape(N1, N2, lanes), 0, 1).reshape(N2, N1 * lanes)
        bit = jnp.swapaxes(bi.reshape(N1, N2, lanes), 0, 1).reshape(N2, N1 * lanes)
        if ablate == 4:
            abl_acc = abl_acc + jnp.sum(brt) + jnp.sum(bit)
            return None
        if pairs2:
            brt_rhs = _cat_rhs(brt, pairs2)
            bit_rhs = _cat_rhs(bit, pairs2)
        else:
            brt_rhs, bit_rhs = brt, bit
        n_c2 = N1 * lanes
        w2s = jnp.concatenate([w2rt, w2it], axis=0)  # (2*N2, K)
        rhs2 = jnp.concatenate([brt_rhs, bit_rhs], axis=1)
        o2 = dot2(w2s, rhs2)  # (2*N2, 2*n_c2)
        xr2 = o2[:N2, :n_c2] - o2[N2:, n_c2:]
        xi2 = o2[N2:, :n_c2] + o2[:N2, n_c2:]
        if ablate == 5:
            abl_acc = abl_acc + jnp.sum(xr2) + jnp.sum(xi2)
            return None
        return xr2 * xr2 + xi2 * xi2  # (N2, N1*lanes)

    power = jnp.zeros((nfft, lanes) if dg2 else (N2, N1 * lanes), f32)
    for pair in range(3):
        planes = []
        for idx in (2 * pair, 2 * pair + 1):
            plane = component(idx)  # (F, lanes)
            if centered:
                m = jnp.sum(plane, axis=0, keepdims=True) * (1.0 / F)
                delta = plane - m
                s_tot = jnp.sum(delta, axis=0, keepdims=True)
                head_acc = head_acc + m * delta[:nd_pad]
                tail_acc = tail_acc + m * delta[F - nd_pad : F]
                sc_acc = sc_acc + m * (2.0 * s_tot)
                msq_acc = msq_acc + m * m
                plane = delta
            planes.append(
                plane if zpad is None
                else jnp.concatenate([plane, zpad], axis=0)
            )
        p = half_dft(planes[0], planes[1])
        if p is not None:
            power = power + p
    if ablate:
        return abl_acc

    pf = power if dg2 else power.reshape(nfft, lanes)
    if pcenter:
        # CINV rows sum to zero over k (geometric sum), so subtracting
        # the per-lane spectral mean is EXACT — and it removes the
        # all-positive offset of the power spectrum that otherwise
        # dominates the compensated-bf16 contraction error.
        pf = pf - jnp.mean(pf, axis=0, keepdims=True)
    out = cinv_dot(cinv_ref[...], pf)
    if centered:
        pt = _tri_dot(tri_ref[...], jnp.concatenate([head_acc, tail_acc], axis=0))
        d = (
            jax.lax.broadcasted_iota(jnp.int32, (nd_pad, 1), 0).astype(f32)
            + 1.0
        )
        out = out - pt + sc_acc + msq_acc * (F - d)
    return out


def vmem_estimate(n_frames: int, n_deltas: int) -> int:
    """Rough bytes of VMEM the kernel needs for one tile (constants +
    input block + working planes) — used by the dispatcher to fall back
    to the XLA chain for shapes that exceed the scoped-VMEM budget.
    Under-predicts Mosaic's actual scoped allocation by ~15% at the
    canonical shape (14.5 MB estimated vs 16.9 MB measured), hence the
    safety margin between the ``supports`` budget and VMEM_LIMIT_BYTES."""
    n_min = n_frames + n_deltas
    nfft = ((n_min + 127) // 128) * 128
    nd_pad = ((n_deltas + 7) // 8) * 8
    consts = (nd_pad * nfft + nd_pad * 2 * nd_pad + 2 * nfft * 128) * 4
    tile_in = 3 * n_frames * 128 * 4
    working = 8 * nfft * 128 * 4
    return consts + tile_in + working


def supports(n_frames: int, n_deltas: int, budget: int = 52_000_000):
    """True when the fused kernel handles this shape: VMEM working set
    within budget AND enough frames for the centered-correction rows.

    The budget tracks VMEM_LIMIT_BYTES (64 MiB) minus the estimate's
    ~15% under-prediction margin.  Hardware-validated 2026-08-17:
    F=2000/D=1000 (estimate 39 MB) runs at canonical accuracy (9.7e-7)
    and 1.8x the XLA chain (15.6 vs 28.5 ms at 16x1024 chunks);
    F=3000/D=1500 (estimate 74 MB) correctly exceeds the limit and must
    keep falling back to XLA."""
    nd_pad = ((n_deltas + 7) // 8) * 8
    return (
        n_frames >= nd_pad
        and vmem_estimate(n_frames, n_deltas) <= budget
    )


def acf_sums_pallas(vecs, n_deltas: int, mode: str = "cat64c",
                    n1: int = 0, cinv: str = None, pcenter: bool = None,
                    ablate: int = 0, fuse_transpose: bool = False,
                    tiles: int = 1, transpose_out: bool = True,
                    pretiled: bool = False, dg2: bool = False,
                    lanes: int = 128):
    """vecs : (..., nFrames, 3) -> (..., n_deltas) lag sums
    sum_t (v(t).v(t+delta))^2 for delta = 1..n_deltas.

    Defaults are the measured production config (see module docstring);
    mode="highest" gives 6-pass f32-exact dots for cross-checks —
    cinv/pcenter default to None = follow the mode ("highest" gets an
    exact HIGHEST CINV contraction; compensated modes get split4 +
    spectrum centering).  Chunks too short for the centered corrections
    (nFrames < padded lag rows) automatically drop to mode="highest".
    tiles : 128-bond tiles per grid program (unrolled in-kernel).
    transpose_out=False returns the kernel's native (n_deltas, B) layout
    (B = prod of the leading dims, row-major) so lag-leading consumers
    (the Palmer statistics) skip the final XLA transpose.

    Alternatively pass vecs already in the kernel's native tile layout
    (nTiles, 3, nFrames, 128) [set ``pretiled=True``] — producers that
    can emit this layout (device-side generators, tiled loaders) skip
    the XLA transpose pre-pass entirely, which dominates the step at
    large batch (measured pathological at B ~ 4e4).

    CONTRACT NOTE for pretiled: the true batch size is unknown here
    (tiles are lane-padded by the producer), so the output keeps ALL
    nTiles*128 lanes — including any zero-pad lanes — in both output
    layouts; the caller slices to its true batch (in-repo callers pass
    ``transpose_out=False`` and slice, e.g. palmer_group_update_pretiled).
    The standard layout slices to B = prod(leading dims) itself.
    """
    if lanes % 128 != 0 or lanes < 128:
        raise ValueError(f"lanes must be a positive multiple of 128, got {lanes}")
    if lanes != 128 and (fuse_transpose or pretiled):
        raise ValueError("lanes != 128 requires the standard input layout")
    nf_in = vecs.shape[-2]  # F in both layouts
    nd_pad_probe = ((n_deltas + 7) // 8) * 8
    if mode in _CENTERED_MODES and nf_in < nd_pad_probe:
        # Chunks too short for the centered-correction rows: the exact
        # 6-pass mode handles any shape (keeps a forced ACF_IMPL='pallas'
        # working on tiny debug workloads).
        mode = "highest"
    if cinv is None:
        cinv = "highest" if mode == "highest" else "split4"
    if pcenter is None:
        pcenter = mode != "highest"
    if pretiled:
        n_tiles, _three, n_frames, _lanes = vecs.shape
        if _three != 3 or _lanes != 128:
            raise ValueError(
                f"pretiled input must be (nTiles, 3, nFrames, 128), got "
                f"{vecs.shape}"
            )
        lead = (n_tiles * 128,)
        B = b_pad = n_tiles * 128
        if fuse_transpose:
            raise ValueError("pretiled and fuse_transpose are exclusive")
    else:
        lead = vecs.shape[:-2]
        n_frames = vecs.shape[-2]
    dtype = jnp.float32
    cinv_mode = cinv
    (nfft, N1, N2, nd_pad, W1r, W1i, twr, twi, W2rt, W2it, CINV) = (
        _kernel_constants(n_frames, n_deltas, "float32", n1, lanes)
    )
    if not pretiled:
        B = int(np.prod(lead)) if lead else 1
        b_pad = ((B + lanes - 1) // lanes) * lanes
        n_tiles = b_pad // lanes
        v = vecs.reshape(B, n_frames, 3).astype(dtype)
        if b_pad != B:
            v = jnp.concatenate(
                [v, jnp.zeros((b_pad - B, n_frames, 3), dtype)], axis=0
            )
    if tiles < 1:
        raise ValueError(f"tiles must be >= 1, got {tiles}")
    req_tiles = tiles
    while n_tiles % tiles != 0:  # clamp to a divisor of the tile count
        tiles -= 1
    if tiles != req_tiles:
        import warnings

        # Loud, not silent: a perf experiment requesting tiles=4 on a
        # 6-tile batch would otherwise record tiles=4 timings that
        # actually ran tiles=2.
        warnings.warn(
            f"acf_sums_pallas: tiles={req_tiles} does not divide the "
            f"{n_tiles}-tile batch; running tiles={tiles}"
        )
    if pretiled:
        v = vecs.astype(dtype)
        v_spec = pl.BlockSpec(
            (tiles, 3, n_frames, 128), lambda i: (i, 0, 0, 0)
        )
    elif fuse_transpose:
        # Free row-major view: (B, F, 3) -> (nTiles, 128, F*3); the
        # kernel transposes each tile in VMEM (one XLU pass) instead of
        # XLA materialising the transposed copy in HBM.
        v = v.reshape(n_tiles, 128, n_frames * 3)
        v_spec = pl.BlockSpec(
            (tiles, 128, n_frames * 3), lambda i: (i, 0, 0)
        )
    else:
        # (B, F, 3) -> (nTiles, 3, F, lanes): contiguous
        # 3*F*lanes*4B per tile.
        v = jnp.transpose(v.reshape(n_tiles, lanes, n_frames, 3), (0, 3, 2, 1))
        v_spec = pl.BlockSpec(
            (tiles, 3, n_frames, lanes), lambda i: (i, 0, 0, 0)
        )

    pairs1, pairs2, _ = _CAT_MODES.get(mode, (None, None, None))
    if pairs1:
        W1r = _cat_lhs_np(W1r, pairs1)
        W1i = _cat_lhs_np(W1i, pairs1)
        W2rt = _cat_lhs_np(W2rt, pairs2)
        W2it = _cat_lhs_np(W2it, pairs2)
    const_arrays = [W1r, W1i, twr, twi, W2rt, W2it, CINV]
    if mode in _CENTERED_MODES:
        if n_frames < nd_pad:
            raise ValueError(
                f"centered mode {mode!r} needs nFrames ({n_frames}) >= "
                f"padded lag rows ({nd_pad})"
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
        # n=c.ndim binds NOW: a bare closure would late-bind the loop
        # variable and give every spec the LAST constant's rank.
        pl.BlockSpec(c.shape, lambda i, n=c.ndim: (0,) * n) for c in consts
    ]

    def kernel(v_ref, w1r, w1i, twr_, twi_, w2rt, w2it, cinv, *rest):
        if mode in _CENTERED_MODES:
            tri_ref, out_ref = rest
        else:
            tri_ref, out_ref = None, rest[0]
        for t in range(tiles):
            if fuse_transpose:
                x2d = jnp.swapaxes(v_ref[t], 0, 1)  # (3F, 128)
                x3 = x2d.reshape(n_frames, 3, 128)  # leading split: free
                vx, vy, vz = x3[:, 0, :], x3[:, 1, :], x3[:, 2, :]
            else:
                vx, vy, vz = v_ref[t, 0], v_ref[t, 1], v_ref[t, 2]
            res = _acf_kernel2(
                vx, vy, vz, w1r, w1i, twr_, twi_, w2rt, w2it, cinv,
                N1=N1, N2=N2, nfft=nfft, F=n_frames, mode=mode,
                tri_ref=tri_ref, nd_pad=nd_pad, cinv_mode=cinv_mode,
                pcenter=pcenter, ablate=ablate, dg2=dg2, lanes=lanes,
            )
            out_ref[:, t * lanes : (t + 1) * lanes] = res

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles // tiles,),
        in_specs=[v_spec] + const_specs,
        out_specs=pl.BlockSpec((nd_pad, tiles * lanes), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nd_pad, b_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
    )(v, *consts)
    out = out[:n_deltas, :B]
    if not transpose_out:
        return out.astype(vecs.dtype)  # (n_deltas, B)
    return jnp.transpose(out).reshape(lead + (n_deltas,)).astype(vecs.dtype)
