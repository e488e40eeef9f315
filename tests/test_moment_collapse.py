"""Moment-collapsed ensemble rates == per-sample ensemble rates.

The multi-field optimiser's hot loop (fit/globalfit._eval_all) collapses
the vector-ensemble statistics of R1/R2/NOE onto the first/second central
moments of the symmtop A-coefficients (rates are linear in A; reference
spectral_densities.py:2057-2077, 824-907).  These tests pin the algebraic
identity against the explicit per-sample path at machine precision.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spinrelax_tpu.constants import NucleusPair, field_from_mhz
from spinrelax_tpu.models import CtModelSet, Diffusion
from spinrelax_tpu.models.experiments import ExperimentSet, AlignedExperiment
from spinrelax_tpu.ops import jomega as jw
from spinrelax_tpu.ops import observables as obs


def _setup(rng, n=17, s=40, aniso=1.5, weighted=True):
    names = [str(i + 2) for i in range(n)]
    cts = CtModelSet.from_lists(
        names,
        rng.uniform(0.6, 0.9, n),
        list(rng.uniform(0.02, 0.1, (n, 2))),
        list(np.stack([rng.uniform(5, 30, n), rng.uniform(100, 800, n)], -1)),
        s2fast=[True] * n,
        zeta=0.89,
        sort=False,
    )
    v = rng.normal(size=(n, s, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = rng.uniform(0.0, 3.0, (n, s)) if weighted else None
    diff = Diffusion.axisymmetric(diso=4e-5, aniso=aniso)
    return cts, diff, v, w


@pytest.mark.parametrize("aniso", [1.5, 0.7])
@pytest.mark.parametrize("weighted", [True, False])
def test_rates_from_a_moments_match_sample_path(rng, aniso, weighted):
    cts, diff, v, w = _setup(rng, aniso=aniso, weighted=weighted)
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    csa = rng.uniform(-180e-6, -160e-6, cts.n_models)

    # Explicit per-sample path.
    ref = obs.predict_rates_newapi(
        pair, diff, cts, vecs=jnp.asarray(v), weights=None if w is None else jnp.asarray(w),
        csa=jnp.asarray(csa),
    )

    # Collapsed path.
    mu_p, cov_p, mu_o, cov_o = jw.a_moments_symmtop(v, w)
    mu, cov = (mu_p, cov_p) if aniso > 1.0 else (mu_o, cov_o)
    dpar, dperp = diff.dpar_dperp()
    G = jw.symmtop_g_factors(
        jnp.asarray(pair.omega5()), dpar, dperp, cts.S2, cts.C, cts.tau,
        comp_mask=cts.mask, zeta=cts.zeta,
    )
    fast = obs.rates_from_a_moments_newapi(pair, G, mu, cov, csa=jnp.asarray(csa))

    for field in ("R1", "R2", "NOE", "dR1", "dR2", "dNOE"):
        a = np.asarray(getattr(ref, field))
        b = np.asarray(getattr(fast, field))
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-12, err_msg=field)


def test_zero_variance_ensemble_keeps_gradients_finite(rng):
    """A duplicated-vector (zero ensemble variance) residue must not
    NaN-poison the chi-square jacobian: sqrt'(0) is inf, so the error
    bars route their gradient through a safe branch (review finding,
    round 3)."""
    import jax

    from spinrelax_tpu.fit.globalfit import chisq_total

    cts, diff, v, w = _setup(rng, n=5, s=7, aniso=1.3)
    v[2] = v[2, :1]  # one residue's ensemble collapses to a point
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    rates = obs.predict_rates_newapi(
        pair, diff, cts, vecs=jnp.asarray(v), weights=jnp.asarray(w)
    )
    experiments = [
        AlignedExperiment(
            expt_type="R1", pair=pair,
            target=np.asarray(rates.R1) * 1.01,
            error=np.abs(np.asarray(rates.dR1)) + 1e-3,
            mask=np.ones(cts.n_models),
        )
    ]
    es = ExperimentSet(
        experiments=experiments, cts=cts, diffusion=diff, vecs=v, weights=w
    )
    g = jax.grad(
        lambda d: chisq_total(es, d, float(diff.aniso), 0.89,
                              jnp.full(cts.n_models, pair.csa_value))
    )(float(diff.diso))
    assert np.isfinite(float(g)), g

    # Same guarantee for the per-sample (non-collapsed) path.
    from spinrelax_tpu.fit import globalfit as gf

    old = gf.USE_MOMENT_COLLAPSE
    try:
        gf.USE_MOMENT_COLLAPSE = False
        g2 = jax.grad(
            lambda d: chisq_total(es, d, float(diff.aniso), 0.89,
                                  jnp.full(cts.n_models, pair.csa_value))
        )(float(diff.diso))
    finally:
        gf.USE_MOMENT_COLLAPSE = old
    assert np.isfinite(float(g2)), g2


def test_eval_all_uses_collapse_and_matches(rng):
    """chisq_total through _eval_all (which now routes the axisymmetric
    ensemble through the moment collapse) equals a hand-built chi-square
    over the per-sample path."""
    from spinrelax_tpu.fit.globalfit import chisq_total

    cts, diff, v, w = _setup(rng, n=11, s=25, aniso=1.4)
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    rates = obs.predict_rates_newapi(
        pair, diff, cts, vecs=jnp.asarray(v), weights=jnp.asarray(w)
    )
    experiments = []
    for t, val, err in (
        ("R1", rates.R1, rates.dR1),
        ("R2", rates.R2, rates.dR2),
        ("NOE", rates.NOE, rates.dNOE),
    ):
        tgt = np.asarray(val) * (1 + 0.02 * rng.normal(size=cts.n_models))
        experiments.append(
            AlignedExperiment(
                expt_type=t, pair=pair, target=tgt,
                error=np.abs(np.asarray(err)) + 1e-3,
                mask=np.ones(cts.n_models),
            )
        )
    es = ExperimentSet(
        experiments=experiments, cts=cts, diffusion=diff, vecs=v, weights=w
    )
    got = float(chisq_total(es, float(diff.diso), float(diff.aniso), 0.89,
                            jnp.full(cts.n_models, pair.csa_value)))

    # Hand-built chi-square from the per-sample path.
    total = 0.0
    for e in experiments:
        pred = obs.predict_rates_newapi(
            e.pair, diff, cts, vecs=jnp.asarray(v), weights=jnp.asarray(w)
        )
        vv, dv = {
            "R1": (pred.R1, pred.dR1),
            "R2": (pred.R2, pred.dR2),
            "NOE": (pred.NOE, pred.dNOE),
        }[e.expt_type]
        wgt = np.asarray(e.error) ** 2 + np.asarray(dv) ** 2
        total += np.mean((np.asarray(vv) - e.target) ** 2 / wgt)
    total /= len(experiments)
    np.testing.assert_allclose(got, total, rtol=1e-9)
