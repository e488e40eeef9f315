"""Fused Pallas ACF kernel (ops/pallas_acf.py): interpret-mode correctness
vs the XLA matmul-DFT path (same factor matrices, same statistics).

This is the production TPU fast path selected by ``autocorr.ACF_IMPL``
("auto" routes f32-on-TPU here); on the CPU test backend it runs via the
pallas interpreter.
"""

import contextlib
from unittest import mock

import numpy as np
import pytest

import jax.numpy as jnp

from spinrelax_tpu.ops import autocorr as ac
from spinrelax_tpu.ops import pallas_acf


def make_vecs(rng, n_rep=2, n_frames=100, n_res=16):
    v = rng.normal(size=(n_rep, n_frames, n_res, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@contextlib.contextmanager
def interpreted_pallas():
    """Force pallas_call into interpret mode (no TPU on the test backend)."""
    from jax.experimental import pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    with mock.patch.object(pallas_acf.pl, "pallas_call", interp_call):
        yield


def test_constants_layout():
    (nfft, N1, N2, nd_pad, W1r, W1i, twr, twi, W2rt, W2it, CINV) = (
        pallas_acf._kernel_constants(1000, 500, "float32")
    )
    assert nfft == N1 * N2 and nfft >= 1500 and nfft % 128 == 0
    # Stage-1 contraction truncated to K1 = ceil(F/N2) rows.
    K1 = -(-1000 // N2)
    assert W1r.shape == (N1, K1) and W2rt.shape == (N2, N2)
    assert twr.shape == (N1, N2 * 128)
    assert nd_pad % 8 == 0 and CINV.shape == (nd_pad, nfft)
    # Rows past n_deltas are zero padding.
    assert not CINV[500:].any() and CINV[:500].any()


def test_vmem_guard():
    # Canonical production shape fits ...
    assert pallas_acf.supports(1000, 500)
    # ... the 64 MiB vmem_limit_bytes unlock admits t_mem=20ns chunks
    # (hardware-validated at canonical accuracy, docs/PERF.md round 3) ...
    assert pallas_acf.supports(2000, 1000)
    # ... but F=3000 (est. 74 MB) and huge memory-time chunks must keep
    # falling back to the XLA chain ...
    assert not pallas_acf.supports(3000, 1500)
    assert not pallas_acf.supports(20000, 10000)
    # ... as do chunks shorter than the padded correction rows.
    assert not pallas_acf.supports(4, 2)


@pytest.mark.parametrize(
    "mode,kw",
    [
        ("cat64c", dict(cinv="split4", pcenter=True)),  # production default
        ("cat4c", dict(cinv="split4", pcenter=True)),
        ("cat46c", dict(cinv="split4", pcenter=True)),
        ("highest", dict(cinv="highest")),
        ("split3c", dict()),
        ("cat64c", dict(cinv="split4", pcenter=True, tiles=2)),
        ("cat64c", dict(cinv="split4", pcenter=True, fuse_transpose=True)),
        # dg2: measured-NEGATIVE on hardware (VMEM OOM, docs/PERF.md
        # round-3 ablation entry) but the math stays pinned so the
        # experiment record remains verifiable.
        ("cat64c", dict(cinv="split4", pcenter=True, dg2=True)),
        ("highest", dict(cinv="highest", dg2=True)),
        # 256-lane tile (round-4 A/B lever): same math, half the grid
        # programs; B=120 pads to one 256-lane tile.
        ("cat64c", dict(cinv="split4", pcenter=True, lanes=256)),
        ("highest", dict(cinv="highest", lanes=256)),
    ],
)
def test_pallas_acf_interpret_matches_xla(mode, kw):
    """Every kernel mode must match the XLA matmul-DFT in interpret
    mode, including batch/lag padding (B=120 pads to 128)."""
    rng = np.random.default_rng(3)
    v = rng.normal(size=(3, 150, 40, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    n_deltas = 20

    with interpreted_pallas():
        got = np.asarray(
            pallas_acf.acf_sums_pallas(jnp.asarray(v), n_deltas, mode=mode,
                                       **kw)
        )
    want = np.asarray(ac._acf_sums_xla(jnp.asarray(v), n_deltas))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ct_palmer_dispatch_pallas_matches_xla(rng):
    """ct_palmer with ACF_IMPL='pallas' (interpreted) equals the XLA path
    end-to-end through the Palmer statistics."""
    vecs = jnp.asarray(make_vecs(rng))
    old = ac.ACF_IMPL
    try:
        ac.ACF_IMPL = "xla"
        c1, d1 = ac.ct_palmer(vecs)
        ac.ACF_IMPL = "pallas"
        with interpreted_pallas():
            c2, d2 = ac.ct_palmer(vecs)
    finally:
        ac.ACF_IMPL = old
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=5e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=5e-6)


def test_pretiled_group_update_pallas_matches_xla(rng):
    """palmer_group_update_pretiled through the PALLAS pretiled kernel
    path (interpreted) equals the XLA path end-to-end, including lane
    padding (B = 2*40 = 80 pads to 128) — pins the bench.py / north-star
    tile-layout ingest against the portable implementation."""
    vecs = jnp.asarray(make_vecs(rng, n_rep=2, n_frames=100, n_res=40))
    n_deltas = 50
    vt = ac.tile_palmer_group(vecs)
    assert vt.shape == (1, 3, 100, 128)
    zeros = jnp.zeros((n_deltas, 40), jnp.float32)
    old = ac.ACF_IMPL
    try:
        ac.ACF_IMPL = "pallas"
        with interpreted_pallas():
            s_p, s2_p = ac.palmer_group_update_pretiled(
                vt, zeros, zeros, 2, 40
            )
        ac.ACF_IMPL = "xla"
        s_x, s2_x = ac.palmer_group_update_pretiled(vt, zeros, zeros, 2, 40)
    finally:
        ac.ACF_IMPL = old
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(s2_p), np.asarray(s2_x), atol=5e-5)


def test_tiny_chunks_fall_back_to_uncentered(rng):
    """Chunks shorter than the padded correction rows must still work
    under a forced pallas backend (the centered default silently drops to
    the exact 'highest' mode instead of raising)."""
    v = rng.normal(size=(8, 6, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    with interpreted_pallas():
        got = np.asarray(pallas_acf.acf_sums_pallas(jnp.asarray(v), 3))
    want = np.asarray(ac._acf_sums_xla(jnp.asarray(v), 3))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_no_zpad_shape_compiles_and_matches():
    """F an exact multiple of N2 needs NO stage-1 zero pad; the former
    unconditional 0-row pad constant compiled on the CPU interpreter but
    was rejected by the TPU Mosaic lowering ("positive constant sizes
    but got 0, N") — the flagship entry() forward hit exactly this shape
    (latent since round 1, found round 4).  F=128, nd=16 -> nfft=256,
    N2=16, K1=8, K1*N2 == F."""
    rng = np.random.default_rng(9)
    v = rng.normal(size=(2, 128, 24, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    with interpreted_pallas():
        got = np.asarray(pallas_acf.acf_sums_pallas(jnp.asarray(v), 16))
    want = np.asarray(ac._acf_sums_xla(jnp.asarray(v), 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
