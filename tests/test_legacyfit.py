"""Legacy single-field optimisation modes: synthetic recovery tests."""

import numpy as np
import pytest

from spinrelax_tpu.constants import NucleusPair, field_from_mhz
from spinrelax_tpu.fit.legacyfit import fit_legacy
from spinrelax_tpu.models import CtModelSet, Diffusion
from spinrelax_tpu.ops import observables as obs


@pytest.fixture
def setup(rng):
    n_res, n_samp = 6, 12
    names = [str(i + 2) for i in range(n_res)]
    cts = CtModelSet.from_lists(
        names,
        rng.uniform(0.6, 0.9, n_res),
        list(rng.uniform(0.02, 0.1, (n_res, 2))),
        list(np.stack([rng.uniform(5, 30, n_res), rng.uniform(100, 600, n_res)], -1)),
        s2fast=[True] * n_res,
        zeta=0.89,
        sort=False,
    )
    v = rng.normal(size=(n_res, n_samp, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = rng.uniform(0.5, 2.0, (n_res, n_samp))
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    diff = Diffusion.axisymmetric(diso=4e-5, aniso=1.4)
    return pair, diff, cts, v, w


def make_exp(pair, diff, cts, v, w, csa=None):
    rates = obs.predict_rates(pair, diff, cts, vecs=v, weights=w, csa=csa)
    exp = np.stack(
        [np.asarray(rates.R1), np.asarray(rates.R2), np.asarray(rates.NOE)], axis=-1
    )
    err = np.stack(
        [np.asarray(rates.dR1), np.asarray(rates.dR2), np.asarray(rates.dNOE)], axis=-1
    )
    return exp, np.maximum(err, 1e-3 * np.abs(exp))


def test_mode_diso(setup):
    pair, diff, cts, v, w = setup
    exp, err = make_exp(pair, diff, cts, v, w)
    start = diff.with_diso(5e-5)
    res = fit_legacy("Diso", pair, start, cts, exp, err, vecs=v, weights=w)
    np.testing.assert_allclose(res.diso, 4e-5, rtol=1e-4)
    assert res.chisq < 1e-10


def test_mode_diso_s2(setup):
    pair, diff, cts, v, w = setup
    # Truth has an extra overall S2 scaling of 0.93.
    import dataclasses
    import jax.numpy as jnp

    cts_true = dataclasses.replace(cts, zeta=cts.zeta * 0.93)
    exp, err = make_exp(pair, diff, cts_true, v, w)
    start = diff.with_diso(4.5e-5)
    res = fit_legacy("DisoS2", pair, start, cts, exp, err, vecs=v, weights=w)
    np.testing.assert_allclose(res.diso, 4e-5, rtol=1e-3)
    np.testing.assert_allclose(res.s2_scale, 0.93, rtol=1e-3)


def test_mode_diso_csa(setup):
    pair, diff, cts, v, w = setup
    csa_true = -185e-6
    exp, err = make_exp(pair, diff, cts, v, w, csa=np.full(6, csa_true))
    start = diff.with_diso(4.4e-5)
    res = fit_legacy("DisoCSA", pair, start, cts, exp, err, vecs=v, weights=w)
    np.testing.assert_allclose(res.diso, 4e-5, rtol=1e-3)
    np.testing.assert_allclose(res.csa[0], csa_true, rtol=1e-3)


@pytest.mark.parametrize("method", ["powell", "device"])
def test_mode_new_alternating(setup, rng, method):
    """'powell' is the host-driven reference alternation; 'device' runs the
    whole alternating fit inside one jitted while_loop (one dispatch)."""
    pair, diff, cts, v, w = setup
    csa_true = rng.uniform(-190e-6, -150e-6, 6)
    exp, err = make_exp(pair, diff, cts, v, w, csa=csa_true)
    start = diff.with_diso(4.4e-5)
    res = fit_legacy("new", pair, start, cts, exp, err, vecs=v, weights=w,
                     max_cycles=20, tol=1e-8, method=method)
    np.testing.assert_allclose(res.diso, 4e-5, rtol=2e-3)
    np.testing.assert_allclose(res.csa, csa_true, rtol=5e-3)


def test_device_method_rejected_for_global_modes(setup):
    pair, diff, cts, v, w = setup
    exp, err = make_exp(pair, diff, cts, v, w, csa=np.full(6, -170e-6))
    with pytest.raises(ValueError, match="device"):
        fit_legacy("DisoCSA", pair, diff, cts, exp, err, vecs=v, weights=w,
                   method="device")


def test_gradient_method_matches_powell(setup):
    pair, diff, cts, v, w = setup
    csa_true = -182e-6
    exp, err = make_exp(pair, diff, cts, v, w, csa=np.full(6, csa_true))
    start = diff.with_diso(4.5e-5)
    res_g = fit_legacy("DisoCSA", pair, start, cts, exp, err, vecs=v, weights=w,
                       method="gradient")
    np.testing.assert_allclose(res_g.diso, 4e-5, rtol=1e-3)
    np.testing.assert_allclose(res_g.csa[0], csa_true, rtol=1e-3)
    assert res_g.chisq < 1e-6


def test_gradient_disos2csa(setup):
    import dataclasses

    pair, diff, cts, v, w = setup
    cts_true = dataclasses.replace(cts, zeta=cts.zeta * 0.95)
    exp, err = make_exp(pair, diff, cts_true, v, w, csa=np.full(6, -175e-6))
    start = diff.with_diso(4.4e-5)
    res = fit_legacy("DisoS2CSA", pair, start, cts, exp, err, vecs=v, weights=w,
                     method="gradient")
    np.testing.assert_allclose(res.diso, 4e-5, rtol=2e-3)
    np.testing.assert_allclose(res.s2_scale, 0.95, rtol=2e-3)
    np.testing.assert_allclose(res.csa[0], -175e-6, rtol=2e-3)
