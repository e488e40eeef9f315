"""P2 orientational autocorrelation C(t) and order parameters S^2.

This is the #1 compute sink of the reference workflow
(``calculate-Ct-from-traj.py:200-238``): an O(nDeltas * nFrames) explicit
lag loop of einsums.  Here the lag profile comes from correlation
theorems over the frame axis — production dispatch (``_acf_sums``) is a
matmul-form Cooley-Tukey DFT (``_acf_sums_xla``, MXU-shaped) or the
fused Pallas kernel (``ops.pallas_acf``); ``_acf_sums_fft`` is the
straight O(N log N) ``jnp.fft`` form, kept as an independently-derived
parity oracle (test_autocorr).  All rest on the tensor-component
identity

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


def _fft_len(n_min: int) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) length >= n_min — linear correlation
    needs nfft >= nFrames + nDeltas; smooth composites keep the TPU FFT
    fast without rounding all the way up to a power of two."""
    best = 1
    while best < n_min:
        best *= 2
    m5 = 1
    while m5 < 8 * n_min:
        m3 = m5
        while m3 < 8 * n_min:
            m = m3
            while m < n_min:
                m *= 2
            if m < best:
                best = m
            m3 *= 3
        m5 *= 5
    return best


def _outer6(vecs):
    """(..., nF, 3) -> (..., nF, 6) weighted unique outer products."""
    comps = [
        w * vecs[..., i] * vecs[..., j]
        for i, j, w in zip(_PAIR_I, _PAIR_J, _PAIR_W)
    ]
    return jnp.stack(comps, axis=-1)


def _acf_sums_fft(vecs, n_deltas: int):
    """Sum_t (v(t).v(t+delta))^2 for delta = 1..n_deltas via FFT.

    The six outer-product components share one inverse transform: by
    linearity their power spectra are summed BEFORE the irfft, so the
    kernel runs six forward rffts but a single irfft (a 2.3x win measured
    on TPU v5e vs the naive per-component correlation).

    vecs : (..., nFrames, 3) -> (..., n_deltas)
    """
    n_frames = vecs.shape[-2]
    nfft = _fft_len(n_frames + n_deltas)
    comps = [
        w * vecs[..., i] * vecs[..., j]
        for i, j, w in zip(_PAIR_I, _PAIR_J, _PAIR_W)
    ]
    w6 = jnp.stack(comps, axis=-2)  # (..., 6, nF)
    W = jnp.fft.rfft(w6, n=nfft, axis=-1)
    power = jnp.sum(W.real**2 + W.imag**2, axis=-2)  # (..., nfft//2+1)
    acf = jnp.fft.irfft(power, n=nfft, axis=-1)
    return acf[..., 1 : n_deltas + 1]


@functools.lru_cache(maxsize=16)
def _dft_constants(n_frames: int, n_deltas: int, dtype_name: str):
    """Cooley-Tukey factor matrices for the matmul-DFT correlation path.

    NFFT = N1*N2 >= nFrames + nDeltas (power of two, near-square split so
    both matmul contractions feed the MXU well).  Returns real/imag parts
    of the radix matrices, the twiddle factors, and the cosine inverse
    matrix that maps the power spectrum straight to lags 1..n_deltas.
    """
    import numpy as np

    # The matmul DFT needs no smoothness — any nfft >= nFrames + nDeltas
    # avoids circular aliasing in lags 1..nDeltas.  Round up to a multiple
    # of 128 (lane width) and take the most-square factorisation: smaller
    # nfft directly cuts the HBM traffic of every intermediate (the chain
    # is bandwidth-bound, see docs/PERF.md).
    n_min = n_frames + n_deltas
    nfft = ((n_min + 127) // 128) * 128
    N1 = int(np.sqrt(nfft))
    while nfft % N1 != 0:
        N1 += 1
    N2 = nfft // N1
    if N1 < N2:
        N1, N2 = N2, N1
    dt = np.dtype(dtype_name)
    # Stage-1 truncation: with the row-major (n1, n2) split the zero
    # padding fills whole trailing n1 rows, so the first contraction
    # only needs K1 = ceil(F/N2) of its N1 terms (1/3 less MXU work at
    # the canonical 1000-frame chunk).
    K1 = int(np.ceil(n_frames / N2))
    k1 = np.arange(N1)
    W1 = np.exp(-2j * np.pi * np.outer(k1, np.arange(K1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    TW = np.exp(-2j * np.pi * np.outer(k1, np.arange(N2)) / nfft)
    d = np.arange(1, n_deltas + 1)
    kk = (k1[:, None] + N1 * np.arange(N2)[None, :]).reshape(-1)
    CINV = (np.cos(2 * np.pi * np.outer(d, kk) / nfft) / nfft).astype(dt)
    # Return host numpy arrays: they embed as fresh constants in each
    # trace (caching device arrays created inside a trace leaks tracers).
    return (
        nfft, N1, N2, K1,
        W1.real.astype(dt), W1.imag.astype(dt),
        TW.real.astype(dt), TW.imag.astype(dt),
        W2.real.astype(dt), W2.imag.astype(dt),
        CINV,
    )


# ACF backend selection: "auto" uses the fused Pallas kernel for f32 on
# TPU (2.1x the XLA matmul-DFT at the canonical workload, docs/PERF.md)
# and the XLA path everywhere else; set to "xla" or "pallas" to force one.
ACF_IMPL = "auto"


def use_pallas_for(dtype, n_frames: int, n_deltas: int) -> bool:
    """THE dispatch predicate for the fused Pallas kernel — every caller
    (standard (..., F, 3) layout AND the pretiled (nTiles, 3, F, 128)
    tile layout: shape[-2] is F in BOTH, which is what lets them share
    this predicate) must route through this single rule so backend
    selection can never diverge between entry points."""
    from .pallas_acf import supports

    return ACF_IMPL == "pallas" or (
        ACF_IMPL == "auto"
        and dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and supports(n_frames, n_deltas)
    )


def _use_pallas(vecs, n_deltas: int) -> bool:
    return use_pallas_for(vecs.dtype, vecs.shape[-2], n_deltas)


def _acf_sums(vecs, n_deltas: int):
    """Sum_t (v(t).v(t+delta))^2 for delta = 1..n_deltas.

    Dispatches between the fused Pallas TPU kernel (pallas_acf.py) and
    the XLA matmul-DFT chain below according to ``ACF_IMPL``; shapes
    whose VMEM working set exceeds the scoped budget fall back to XLA."""
    if _use_pallas(vecs, n_deltas):
        from .pallas_acf import acf_sums_pallas

        return acf_sums_pallas(vecs, n_deltas)
    return _acf_sums_xla(vecs, n_deltas)


def _acf_sums_xla(vecs, n_deltas: int):
    """Sum_t (v(t).v(t+delta))^2 for delta = 1..n_deltas — matmul-DFT path.

    Implements the correlation as a two-stage Cooley-Tukey DFT expressed
    as dense matmuls (radix ~sqrt(NFFT) each) plus a cosine-matrix inverse
    that lands directly on the lag grid.  On TPU this runs entirely on the
    MXU and beats the XLA FFT lowering by ~2.3x at full f32 accuracy
    (einsums pinned to HIGHEST precision — the bf16 default loses 1e-3 on
    the DC-heavy outer-product signals).  See docs/PERF.md.

    vecs : (..., nFrames, 3) -> (..., n_deltas)
    """
    n_frames = vecs.shape[-2]
    (nfft, N1, N2, K1, W1r, W1i, TWr, TWi, W2r, W2i, CINV) = _dft_constants(
        n_frames, n_deltas, jnp.dtype(vecs.dtype).name
    )
    ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    comps = [
        w * vecs[..., i] * vecs[..., j]
        for i, j, w in zip(_PAIR_I, _PAIR_J, _PAIR_W)
    ]
    # Pack the 6 real signals into 3 complex ones (classic 2-for-1 real
    # FFT packing): for z = a + ib, |A[k]|^2 + |B[k]|^2 =
    # (|Z[k]|^2 + |Z[-k]|^2)/2, and the cosine inverse matrix is
    # symmetric under k -> nfft-k, so summing CINV against |Z|^2 directly
    # yields the same lag sums while HALVING every DFT intermediate
    # (the chain is HBM-bound; measured 14.2 -> 10.6 ms at the canonical
    # workload before the nfft shrink).
    xr = jnp.stack(comps[0::2], axis=-2)  # (..., 3, nF)
    xi = jnp.stack(comps[1::2], axis=-2)

    def pad_split(t):
        t = jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (K1 * N2 - n_frames,), t.dtype)],
            axis=-1,
        )
        return t.reshape(t.shape[:-1] + (K1, N2))  # n = N2*n1 + n2

    xr, xi = pad_split(xr), pad_split(xi)
    Ar = ein("kn,...ns->...ks", W1r, xr) - ein("kn,...ns->...ks", W1i, xi)
    Ai = ein("kn,...ns->...ks", W1i, xr) + ein("kn,...ns->...ks", W1r, xi)
    Br = Ar * TWr - Ai * TWi
    Bi = Ar * TWi + Ai * TWr
    Xr = ein("...ks,sm->...km", Br, W2r) - ein("...ks,sm->...km", Bi, W2i)
    Xi = ein("...ks,sm->...km", Br, W2i) + ein("...ks,sm->...km", Bi, W2r)
    power = jnp.sum(Xr**2 + Xi**2, axis=-3)  # sum over the 3 packed signals
    Pf = power.reshape(power.shape[:-2] + (nfft,))
    flat = Pf.reshape((-1, nfft))
    out = jnp.matmul(flat, CINV.T, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(Pf.shape[:-1] + (n_deltas,))


def _acf_sums_mxu(vecs, n_deltas: int, block: int = 128):
    """MXU formulation of the lag sums: time is tiled into `block`-sized
    chunks and the band of the Gram matrix G = W W^T (W = (F, 6) outer
    components) is computed as batched matmuls with contraction over
    (time-block x component) — K = 6*nBlocks feeds the systolic array far
    better than 6 alone, and the FFT disappears entirely.

    acf(delta = k*B + d) = sum_a [G_k[a, a+d]]  with the overflow column
    falling into G_{k+1}; diagonal sums are taken via a row-shifted gather.

    vecs : (..., nFrames, 3) -> (..., n_deltas); exact (no approximation).
    """
    B = block
    n_frames = vecs.shape[-2]
    w6 = _outer6(vecs)  # (..., F, 6)
    n_blk = -(-n_frames // B)
    pad = n_blk * B - n_frames
    if pad:
        w6 = jnp.concatenate(
            [w6, jnp.zeros(w6.shape[:-2] + (pad, 6), w6.dtype)], axis=-2
        )
    Wb = w6.reshape(w6.shape[:-2] + (n_blk, B, 6))
    k_max = n_deltas // B + 1  # need diagonals up to n_deltas

    zero_G = jnp.zeros(w6.shape[:-2] + (B, B), w6.dtype)
    acf_parts = []
    for k in range(k_max + 1):
        if k >= n_blk:
            acf_parts.append(zero_G)
            continue
        a = Wb[..., : n_blk - k, :, :]
        b = Wb[..., k:, :, :]
        # Contract over (block index, component): K = 6 * (n_blk - k).
        G = jnp.einsum("...iac,...ibc->...ab", a, b,
                       precision=jax.lax.Precision.HIGHEST)
        acf_parts.append(G)
    # acf(kB + d) = sum_a G_k[a, a+d] (+ G_{k+1}[a, a+d-B] for a+d >= B).
    # Shifted-row view without a gather: flatten the (B, 2B) band row-major,
    # pad by B, reshape to (B, 2B+1); then row a starts at offset a, i.e.
    # R[a, j] = Gpad[a, a + j] — a pure layout transformation.
    out = []
    lead = w6.shape[:-2]
    for k in range(k_max):
        Gpad = jnp.concatenate([acf_parts[k], acf_parts[k + 1]], axis=-1)
        flat = Gpad.reshape(lead + (2 * B * B,))
        flat = jnp.concatenate(
            [flat, jnp.zeros(lead + (B,), w6.dtype)], axis=-1
        )
        R = flat.reshape(lead + (B, 2 * B + 1))
        out.append(jnp.sum(R[..., :B], axis=-2))  # (..., B): d = 0..B-1
    acf = jnp.concatenate(out, axis=-1)  # (..., k_max*B)
    return acf[..., 1 : n_deltas + 1]


def ct_palmer_mxu(vecs, block: int = 128, res_tile: int = 128):
    """MXU-matmul variant of :func:`ct_palmer` (identical statistics).

    Residues are processed in tiles of ``res_tile`` via lax.map to bound
    the Gram-band intermediates in HBM (~R * res_tile * B^2 floats/tile).
    """
    vecs = jnp.asarray(vecs)
    n_rep, n_frames, n_res = vecs.shape[0], vecs.shape[1], vecs.shape[2]
    n_deltas = n_frames // 2
    v = jnp.swapaxes(vecs, 1, 2)  # (R, N, F, 3)

    if n_res <= res_tile:
        s = _acf_sums_mxu(v, n_deltas, block=block)
    else:
        n_tiles = -(-n_res // res_tile)
        pad = n_tiles * res_tile - n_res
        if pad:
            v = jnp.concatenate(
                [v, jnp.zeros((n_rep, pad, n_frames, 3), v.dtype)], axis=1
            )
        vt = v.reshape(n_rep, n_tiles, res_tile, n_frames, 3)
        vt = jnp.moveaxis(vt, 1, 0)  # (nTiles, R, T, F, 3)
        s = jax.lax.map(lambda x: _acf_sums_mxu(x, n_deltas, block=block), vt)
        s = jnp.moveaxis(s, 0, 1).reshape(n_rep, n_tiles * res_tile, n_deltas)
        s = s[:, :n_res]
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=vecs.dtype)
    per_rep = -0.5 + 1.5 * s / n_vals
    Ct = jnp.mean(per_rep, axis=0)
    dCt = jnp.std(per_rep, axis=0) / (jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0)
    return Ct.T, dCt.T


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
    n_rep, n_frames, n_res = vecs.shape[0], vecs.shape[1], vecs.shape[2]
    n_deltas = n_frames // 2
    # (nRep, nRes, nF, 3) for the DFT along a trailing-adjacent axis
    v = jnp.swapaxes(vecs, 1, 2)
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=vecs.dtype)
    if _use_pallas(v, n_deltas):
        # Lag-leading fast path: the kernel's native output is
        # (nDeltas, B); (nDeltas, nRep, nRes) is a free view of it, the
        # replicate statistics reduce its middle axis, and the result is
        # already (nDeltas, nRes) — no XLA transposes at all.
        from .pallas_acf import acf_sums_pallas

        s = acf_sums_pallas(v, n_deltas, transpose_out=False)
        per_rep = -0.5 + 1.5 * s.reshape(n_deltas, n_rep, n_res) / n_vals[
            :, None, None
        ]
        Ct = jnp.mean(per_rep, axis=1)
        dCt = jnp.std(per_rep, axis=1) / (
            jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0
        )
        return Ct, dCt
    s = _acf_sums(v, n_deltas)  # (nRep, nRes, nDeltas)
    per_rep = -0.5 + 1.5 * s / n_vals  # (nRep, nRes, nDeltas)
    Ct = jnp.mean(per_rep, axis=0)
    dCt = jnp.std(per_rep, axis=0) / (jnp.sqrt(jnp.asarray(n_rep, vecs.dtype)) - 1.0)
    return Ct.T, dCt.T


def palmer_pooled_stats(acc_s, acc_s2, count):
    """(running shifted sum, shifted sum-of-squares, chunk count) ->
    (mean, dCt), in the accumulator's own (..., nDeltas) orientation.

    SHIFTED-BY-ONE convention: producers accumulate e = x - 1 and e**2,
    NOT x and x**2.  The variance is shift-invariant, and per-chunk
    C(t)/S2 values sit near 1 exactly where their spread is tiny (early
    lags, rigid bonds) — with raw sums the f32 E[x^2]-E[x]^2 subtraction
    cancels to the rounding floor of x^2 (~6e-8), the same order as the
    variance itself (measured ~4% dCt error on the TPU streamed path,
    docs/PERF.md round 3); with the shift the squares are variance-sized
    and the cancellation disappears.

    Trade-off (documented, accepted): for per-chunk values clustered
    near a constant c the f32 noise floor on the variance is
    ~eps*(c-shift)^2, so shift=1 is better than raw sums whenever
    c > 0.5 — which covers the regime that matters (early lags / rigid
    bonds, where C(t) ~ 1 and genuine variance is smallest).  For
    c < 0.5 (decorrelated lags) the shifted floor is higher than raw,
    but there the chunk means carry sampling noise ~1/sqrt(n_vals), so
    genuinely tiny variances do not occur in practice; a per-lag
    provisional-mean shift would cover both regimes at the cost of the
    plain-sum associativity the multi-host pooling relies on.

    THE single home of the pooled Palmer statistics — in particular the
    reference's sqrt(n)-1 SEM denominator (calculate-Ct-from-traj.py:228,
    a quirk we replicate deliberately; see CLAUDE.md).  Every streamed /
    sharded / multi-host producer must accumulate the SAME shifted
    quantities (grep "palmer_pooled_stats convention") and pool through
    this helper so a parity adjustment happens in exactly one place.
    """
    count = jnp.asarray(count, jnp.result_type(acc_s))
    e_mean = acc_s / count
    mean = 1.0 + e_mean
    var = jnp.maximum(acc_s2 / count - e_mean**2, 0.0)
    denom = jnp.sqrt(count) - 1.0
    safe = jnp.where(denom > 0, denom, 1.0)
    # count == 1: the reference's 0/0 gives NaN dCt
    # (calculate-Ct-from-traj.py:228) and ct_palmer reproduces that —
    # the pooled path must agree, not silently report zero error bars.
    dct = jnp.where(
        denom > 0, jnp.sqrt(var) / safe, jnp.full_like(var, jnp.nan)
    )
    return mean, dct


def tile_palmer_group(group):
    """Chunk group ``(g, nFrames, nRes, 3)`` -> the fused kernel's native
    tile layout ``(nTiles, 3, nFrames, 128)``.

    The flat batch order over the lane axis is (chunk, residue) row-major,
    zero-padded up to a multiple of 128 lanes; device-side producers
    (loaders, generators) that emit this layout directly let
    :func:`palmer_group_update_pretiled` skip the XLA transpose pre-pass,
    which dominates the step at large batch (docs/PERF.md, B ~ 4e4).
    """
    g, n_frames, n_res, _ = group.shape
    b = g * n_res
    v = jnp.swapaxes(group, 1, 2).reshape(b, n_frames, 3)
    b_pad = ((b + 127) // 128) * 128
    if b_pad != b:
        v = jnp.concatenate(
            [v, jnp.zeros((b_pad - b, n_frames, 3), v.dtype)], axis=0
        )
    return jnp.transpose(v.reshape(b_pad // 128, 128, n_frames, 3), (0, 3, 2, 1))


def palmer_group_update_pretiled(vt, acc_s, acc_s2, n_group: int, n_res: int):
    """One streamed Palmer group step on pretiled input — the production
    large-batch ingest path (tools/bench_northstar.py, bench.py).

    vt : (nTiles, 3, nFrames, 128) tile-layout group of ``n_group`` Palmer
        chunks x ``n_res`` residues, flat (chunk, residue) row-major over
        the lane axis (:func:`tile_palmer_group` produces it; device
        generators / tiled loaders can emit it directly).
    acc_s, acc_s2 : (nDeltas, nRes) lag-leading running sum /
        sum-of-squares of per-chunk lag means.

    Returns the updated accumulators; finalize with
    :func:`palmer_pooled_stats` on the total chunk count.  Equals
    :func:`ct_palmer` over the concatenated groups (population-std form).
    """
    n_tiles, _, n_frames, _ = vt.shape
    n_deltas = n_frames // 2
    b = n_group * n_res
    if b > n_tiles * 128:
        raise ValueError(
            f"n_group*n_res ({b}) exceeds tile capacity ({n_tiles * 128})"
        )
    n_vals = n_frames - jnp.arange(1, n_deltas + 1, dtype=vt.dtype)
    if use_pallas_for(vt.dtype, n_frames, n_deltas):
        from .pallas_acf import acf_sums_pallas

        s = acf_sums_pallas(vt, n_deltas, pretiled=True, transpose_out=False)
        s = s[:, :b]  # (nDeltas, B)
    else:
        # Untile (inverse of tile_palmer_group) and run the XLA chain.
        v = jnp.transpose(vt, (0, 3, 2, 1)).reshape(n_tiles * 128, n_frames, 3)
        s = _acf_sums(v[:b], n_deltas)  # (B, nDeltas)
        s = jnp.swapaxes(s, 0, 1)
    # palmer_pooled_stats convention: accumulate e = per - 1 and e**2.
    e = -1.5 + 1.5 * s / n_vals[:, None]
    e = e.reshape(n_deltas, n_group, n_res)
    return acc_s + jnp.sum(e, axis=1), acc_s2 + jnp.sum(e**2, axis=1)


def ct_palmer_scan(vecs, batch: int = 1, mesh=None):
    """Replicate-streamed variant for trajectories too large for one fused
    FFT buffer.  Scans over the replicate axis, accumulating per-lag sum and
    sum-of-squares; numerically equivalent to :func:`ct_palmer` (population
    std via E[x^2]-E[x]^2).

    vecs : (nReplicates, nFrames, nResidues, 3); nReplicates % batch == 0.
    mesh : optional ("rep", "res") jax Mesh — shards each replicate group
        over the mesh via the production sharded stream
        (parallel/streamed.py) instead of the single-device scan.
    """
    vecs = jnp.asarray(vecs)
    if mesh is not None:
        from ..parallel.streamed import ShardedCtStream

        n_rep_m, n_frames_m, n_res_m, _ = vecs.shape
        stream = ShardedCtStream(mesh, n_frames_m, n_res_m, dtype=vecs.dtype)
        for off in range(0, n_rep_m, batch):
            stream.update(vecs[off : off + batch])
        return stream.finalize()
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
        # palmer_pooled_stats convention: accumulate e = per - 1, e**2.
        e = -1.5 + 1.5 * s / n_vals  # (batch, nRes, nDeltas)
        acc_s = acc_s + jnp.sum(e, axis=0)
        acc_s2 = acc_s2 + jnp.sum(e**2, axis=0)
        return (acc_s, acc_s2), None

    init = (
        jnp.zeros((n_res, n_deltas), vecs.dtype),
        jnp.zeros((n_res, n_deltas), vecs.dtype),
    )
    (acc_s, acc_s2), _ = jax.lax.scan(body, init, groups)
    mean, dCt = palmer_pooled_stats(acc_s, acc_s2, n_rep)
    return mean.T, dCt.T


def ct_palmer_streamed(chunk_iter, n_frames_per_chunk: int, mesh=None):
    """Streaming C(t): consume an iterator of Palmer-chunk groups without
    ever holding the full trajectory (the >HBM path used by the
    north-star driver, tools/bench_northstar.py).

    chunk_iter yields (g, n_frames_per_chunk, nRes, 3) arrays (g may vary);
    per-chunk lag means accumulate into running sum / sum-of-squares so
    the result equals :func:`ct_palmer` over the concatenated chunks.

    mesh : optional ("rep", "res") jax Mesh — shard each group's chunk
        axis over "rep" and the residue axis over "res"
        (parallel/streamed.ShardedCtStream; one psum over ICI per group).
    """
    if mesh is not None:
        from ..parallel.streamed import ShardedCtStream

        stream = None
        for group in chunk_iter:
            if stream is None:
                stream = ShardedCtStream(
                    mesh, n_frames_per_chunk, group.shape[2],
                    dtype=jnp.asarray(group).dtype,
                )
            stream.update(group)
        if stream is None:
            raise ValueError("empty chunk iterator")
        return stream.finalize()

    acc_s, acc_s2, n_rep = stream_accumulate(chunk_iter, n_frames_per_chunk)
    mean, dCt = palmer_pooled_stats(acc_s, acc_s2, float(n_rep))
    return mean.T, dCt.T


def stream_accumulate(chunk_iter, n_frames_per_chunk: int):
    """Shared per-host streaming accumulation: chunk groups ->
    (acc_s, acc_s2, count) running sums of the SHIFTED per-chunk Palmer
    C(t) means (e = per - 1 and e**2; see palmer_pooled_stats).

    THE single implementation behind both ct_palmer_streamed and the
    multi-host ingest loop (parallel.ingest.host_stream) — the
    associative (sum, sumsq, count) triple both reductions pool must be
    produced by byte-identical code or the multi-host parity guarantee
    silently breaks."""
    n_deltas = n_frames_per_chunk // 2
    update = _stream_update_jit(n_frames_per_chunk, n_deltas)

    acc_s = acc_s2 = None
    n_rep = 0
    for group in chunk_iter:
        group = jnp.asarray(group)
        if group.shape[1] != n_frames_per_chunk:
            raise ValueError(
                f"chunk group has {group.shape[1]} frames, expected {n_frames_per_chunk}"
            )
        if acc_s is None:
            acc_s = jnp.zeros((group.shape[2], n_deltas), group.dtype)
            acc_s2 = jnp.zeros((group.shape[2], n_deltas), group.dtype)
        acc_s, acc_s2 = update(group, acc_s, acc_s2)
        n_rep += group.shape[0]
    if acc_s is None:
        raise ValueError("empty chunk iterator")
    return acc_s, acc_s2, n_rep


@functools.lru_cache(maxsize=None)
def _stream_update_jit(n_frames_per_chunk: int, n_deltas: int):
    """ONE dispatch per group: ACF + per-chunk statistics + accumulator
    update fused into a single jitted program (each separate eager op
    costs a ~8 ms relay round-trip through the axon tunnel, docs/PERF.md
    "dispatch overhead").  Cached at module level: jax.jit keys its trace
    cache on the wrapper OBJECT, so a fresh closure per stream_accumulate
    call would recompile the identical program for every stream (minutes
    of remote AOT) — e.g. the per-host ingest loop calls this once per
    host."""

    @jax.jit
    def update(v, acc_s, acc_s2):
        n_vals = n_frames_per_chunk - jnp.arange(
            1, n_deltas + 1, dtype=v.dtype
        )
        s = _acf_sums(jnp.swapaxes(v, 1, 2), n_deltas)  # (g, nRes, nDeltas)
        # palmer_pooled_stats convention: accumulate e = per - 1, e**2.
        e = -1.5 + 1.5 * s / n_vals
        return acc_s + jnp.sum(e, axis=0), acc_s2 + jnp.sum(e**2, axis=0)

    return update


def ct_palmer_direct(vecs):
    """O(N^2) lag-loop reference implementation (for parity tests against
    the FFT path; mirrors calculate-Ct-from-traj.py:222-228 literally)."""
    vecs = jnp.asarray(vecs)
    n_rep, n_frames, n_res, _ = vecs.shape
    n_deltas = n_frames // 2

    def one_delta(delta):
        n_vals = n_frames - delta
        # Use masking over a fixed-size slice so the shape is static.
        dots = jnp.einsum(
            "ijkl,ijkl->ijk", vecs[:, : n_frames - 1],
            jnp.roll(vecs, -delta, axis=1)[:, : n_frames - 1],
            precision=jax.lax.Precision.HIGHEST,
        )
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
    (calculate-Ct-from-traj.py:240-243).

    Host float64, like the reference's Python floats: a device array
    would canonicalise to f32 in production (x64 off), and f32 lag
    times both mis-print the grid AND silently knock the C(t) artefact
    writers off the native fast path (print_sxylist requires f64 x) —
    measured 907 s of a 1146 s streamed northstar stage spent in
    numpy's per-scalar formatter before this was pinned (round 4,
    docs/PERF.md file-fed attribution)."""
    import numpy as np

    n_pts = int(0.5 * tau_memory / delta_t)
    return (np.arange(n_pts, dtype=np.float64) + 1.0) * delta_t


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
        outer = jnp.einsum("ij,ik->jk", vecs, vecs,
                           precision=jax.lax.Precision.HIGHEST) / vecs.shape[0]
        return 1.5 * jnp.sum(outer**2) - 0.5
    outer = jnp.einsum("ijk,ijl->jkl", vecs, vecs,
                       precision=jax.lax.Precision.HIGHEST) / vecs.shape[0]
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
    outer = jnp.einsum("ijkl,ijkm->iklm", v, v,
                       precision=jax.lax.Precision.HIGHEST) / n_per_block
    s2 = 1.5 * jnp.sum(outer**2, axis=(-2, -1)) - 0.5  # (nBlocks, nRes)
    S2 = jnp.mean(s2, axis=0)
    dS2 = jnp.std(s2, axis=0) / (jnp.sqrt(jnp.asarray(n_blocks, vecs.dtype)) - 1.0)
    return jnp.stack([S2, dS2], axis=-1)
