"""Fused Pallas autocorrelation kernel: interpret-mode correctness vs the
XLA matmul-DFT path (same factor matrices, same statistics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spinrelax_tpu.ops.autocorr import ct_palmer
from spinrelax_tpu.ops.pallas_autocorr import (
    _pallas_dft_constants,
    acf_sums_pallas,
    ct_palmer_pallas,
)


def make_vecs(rng, n_rep=2, n_frames=100, n_res=16):
    v = rng.normal(size=(n_rep, n_frames, n_res, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_constants_layout():
    nfft, N1, W1r, W1i, TWr, TWi, W2r, W2i, CINV_T = _pallas_dft_constants(1000, 500)
    assert nfft == N1 * 128 and nfft >= 1500
    assert W1r.shape == (N1, N1)
    assert CINV_T.shape == (nfft, 500)


def test_matches_xla_dft(rng):
    vecs = make_vecs(rng)
    c1, d1 = ct_palmer(jnp.asarray(vecs))
    c2, d2 = ct_palmer_pallas(jnp.asarray(vecs), res_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=5e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=5e-6)


def test_res_tile_variants(rng):
    vecs = make_vecs(rng, n_res=16)
    c8, _ = ct_palmer_pallas(jnp.asarray(vecs), res_tile=8, interpret=True)
    c4, _ = ct_palmer_pallas(jnp.asarray(vecs), res_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c4), atol=1e-6)


def test_rejects_bad_tile(rng):
    vecs = make_vecs(rng, n_res=10)
    with pytest.raises(ValueError):
        acf_sums_pallas(jnp.swapaxes(jnp.asarray(vecs), 1, 2), 50, res_tile=8,
                        interpret=True)


def test_pallas_acf_interpret_matches_xla():
    """The fused ACF kernel (TPU-only in production) must match the XLA
    matmul-DFT in pallas interpret mode, including batch/lag padding."""
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    from spinrelax_tpu.ops import autocorr as ac
    from spinrelax_tpu.ops import pallas_acf

    rng = np.random.default_rng(3)
    v = rng.normal(size=(3, 150, 40, 3)).astype(np.float32)  # B=450 (pad to 512)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    n_deltas = 20

    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    with mock.patch.object(pallas_acf.pl, "pallas_call", interp_call):
        got = np.asarray(pallas_acf.acf_sums_pallas(jnp.asarray(v), n_deltas))
    want = np.asarray(ac._acf_sums_xla(jnp.asarray(v), n_deltas))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
