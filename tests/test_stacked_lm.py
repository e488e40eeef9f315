"""fit_multiexp_stacked == per-rung fit_multiexp on each rung's slice.

The stacked heterogeneous batch freezes inactive components by masking
(zero Jacobian columns decouple them from the LM step), so each rung's
active sub-problem follows the same trust-region trajectory as the dense
per-rung solve up to float-level linear-algebra reordering.
"""

import numpy as np
import pytest

from spinrelax_tpu.fit.lm import fit_multiexp, fit_multiexp_stacked


@pytest.mark.parametrize("s2_free", [True, False])
@pytest.mark.parametrize("K", [1, 2, 3])
def test_stacked_matches_dense_single_rung(rng, K, s2_free):
    B, T = 6, 160
    dt = np.arange(1.0, T + 1.0)
    S2 = rng.uniform(0.6, 0.9, B)
    C = rng.uniform(0.02, 0.12, (B, K))
    tau = rng.uniform(5.0, 400.0, (B, K))
    decays = S2[:, None] + np.einsum(
        "bk,bkt->bt", C, np.exp(-dt[None, None, :] / tau[:, :, None])
    ) + 1e-5 * rng.normal(size=(B, T))
    sigma = np.ones_like(decays)

    dense = fit_multiexp(dt, decays, sigma, K=K, s2_free=s2_free)

    Kmax = 4
    step = float(np.mean(dt[1:] - dt[:-1]))
    tau0 = np.full((B, Kmax), dt[-1])
    tau0[:, :K] = np.logspace(
        np.log10(step), np.log10(dt[-1] * 2.0), K + 2
    )[1:-1]
    stacked = fit_multiexp_stacked(
        dt, decays, sigma,
        np.full(B, K), np.full(B, s2_free), tau0, Kmax=Kmax,
    )

    np.testing.assert_allclose(
        np.asarray(stacked.S2), np.asarray(dense.S2), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(stacked.C)[:, :K], np.asarray(dense.C), rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stacked.tau)[:, :K], np.asarray(dense.tau), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(stacked.chisq), np.asarray(dense.chisq), rtol=1e-6,
        atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(stacked.ok_fit), np.asarray(dense.ok_fit)
    )
    np.testing.assert_array_equal(
        np.asarray(stacked.ok_sum), np.asarray(dense.ok_sum)
    )
    # padding slots carry zero amplitude
    assert np.all(np.asarray(stacked.C)[:, K:] == 0.0)


def test_ladder_stacked_flag_matches_default(rng):
    """fit_ct_ladder(stacked=True) (one padded LM for all rungs) selects
    the same models as the default per-rung path."""
    from spinrelax_tpu.fit.expfit import fit_ct_ladder

    B, T = 5, 200
    dt = np.arange(1.0, T + 1.0)
    S2 = rng.uniform(0.6, 0.9, B)
    C = rng.uniform(0.05, 0.15, (B, 2))
    tau = np.stack([rng.uniform(5, 20, B), rng.uniform(80, 300, B)], -1)
    decays = S2[:, None] + np.einsum(
        "bk,bkt->bt", C, np.exp(-dt[None, None, :] / tau[:, :, None])
    ) + 2e-4 * rng.normal(size=(B, T))
    names = [str(i) for i in range(B)]
    a = fit_ct_ladder(names, dt, decays)
    b = fit_ct_ladder(names, dt, decays, stacked=True)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(
        np.asarray(a.s2fast), np.asarray(b.s2fast)
    )
    np.testing.assert_allclose(
        np.asarray(a.S2), np.asarray(b.S2), rtol=1e-4, atol=1e-6
    )


def test_stacked_heterogeneous_batch(rng):
    """One call solving different (K, s2free) per element matches the
    per-element dense solves."""
    T = 120
    dt = np.arange(1.0, T + 1.0)
    specs = [(1, False), (1, True), (2, True), (3, True)]
    decays, sigmas = [], []
    for K, _s2f in specs:
        S2 = rng.uniform(0.6, 0.9)
        C = rng.uniform(0.02, 0.12, K)
        tau = rng.uniform(5.0, 300.0, K)
        y = S2 + np.sum(
            C[:, None] * np.exp(-dt[None, :] / tau[:, None]), axis=0
        ) + 1e-5 * rng.normal(size=T)
        decays.append(y)
        sigmas.append(np.ones(T))
    decays = np.stack(decays)
    sigmas = np.stack(sigmas)

    Kmax = 3
    step = float(np.mean(dt[1:] - dt[:-1]))
    tau0 = np.full((len(specs), Kmax), dt[-1])
    for i, (K, _s) in enumerate(specs):
        tau0[i, :K] = np.logspace(
            np.log10(step), np.log10(dt[-1] * 2.0), K + 2
        )[1:-1]
    stacked = fit_multiexp_stacked(
        dt, decays, sigmas,
        np.array([K for K, _ in specs]),
        np.array([s for _, s in specs]),
        tau0, Kmax=Kmax,
    )
    for i, (K, s2f) in enumerate(specs):
        dense = fit_multiexp(
            dt, decays[i : i + 1], sigmas[i : i + 1], K=K, s2_free=s2f
        )
        np.testing.assert_allclose(
            float(np.asarray(stacked.S2)[i]), float(np.asarray(dense.S2)[0]),
            rtol=1e-5, atol=1e-7, err_msg=str(specs[i]),
        )
        np.testing.assert_allclose(
            np.asarray(stacked.chisq)[i], np.asarray(dense.chisq)[0],
            rtol=1e-6, atol=1e-12, err_msg=str(specs[i]),
        )
