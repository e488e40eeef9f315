"""Legacy explicit fit surface (fit/legacy_expfit.py) vs the reference's
fitting_Ct_functions.py:483-660, run live through the refshims."""

import os
import sys

import numpy as np
import pytest

from spinrelax_tpu.fit import legacy_expfit as lx

REF = "/root/reference"
SHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "refshim"
)


def _ref_module():
    for p in (SHIM, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import fitting_Ct_functions as fitCt

    return fitCt


def test_func_exp_decay_numeric_parity():
    """Every func_exp_decayN must evaluate identically to the reference's
    definition (fitting_Ct_functions.py:511-534)."""
    fitCt = _ref_module()
    t = np.linspace(0.0, 50.0, 101)
    cases = {
        1: (7.0,),
        2: (0.4, 7.0),
        3: (0.5, 0.3, 7.0),
        4: (0.3, 2.0, 0.2, 20.0),
        5: (0.5, 0.3, 2.0, 0.1, 20.0),
        6: (0.2, 1.0, 0.2, 5.0, 0.2, 25.0),
        7: (0.4, 0.2, 1.0, 0.2, 5.0, 0.1, 25.0),
        8: (0.1, 0.5, 0.2, 2.0, 0.2, 8.0, 0.2, 32.0),
        9: (0.3, 0.1, 0.5, 0.2, 2.0, 0.2, 8.0, 0.1, 32.0),
        10: (0.1, 0.5, 0.1, 2.0, 0.2, 8.0, 0.2, 32.0, 0.1, 128.0),
        11: (0.3, 0.1, 0.5, 0.1, 2.0, 0.2, 8.0, 0.1, 32.0, 0.1, 128.0),
    }
    for n, params in cases.items():
        ours = getattr(lx, f"func_exp_decay{n}")(t, *params)
        ref = getattr(fitCt, f"func_exp_decay{n}")(t, *params)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, err_msg=f"num_pars={n}")


def test_bound_check_and_calc_chi_parity():
    fitCt = _ref_module()
    t = np.linspace(0.0, 10.0, 21)
    y = np.exp(-t / 3.0)
    ym = np.exp(-t / 3.5)
    dy = np.full_like(t, 0.01)
    # NB: the reference's `if dy != []` crashes on an ndarray dy (broadcast
    # ValueError) — it only ever worked with list input; pass a list.
    np.testing.assert_allclose(
        lx.calc_chi(y, ym, dy), fitCt.calc_chi(y, ym, list(dy)), rtol=1e-12
    )
    np.testing.assert_allclose(lx.calc_chi(y, ym), fitCt.calc_chi(y, ym), rtol=1e-12)
    # bound_check: even DoF sums amplitudes, odd adds the leading S2.
    assert bool(lx.bound_check([0.6, 1.0, 0.6, 2.0], 4)[0]) == bool(
        fitCt._bound_check(None, [0.6, 1.0, 0.6, 2.0])
    )
    assert bool(lx.bound_check([0.5, 0.3, 1.0, 0.1, 2.0], 5)[0]) == bool(
        fitCt._bound_check(None, [0.5, 0.3, 1.0, 0.1, 2.0])
    )
    assert not lx.bound_check([7.0], 1)[0]


@pytest.mark.parametrize("num_pars", [2, 3, 5])
def test_expstyle_fit_matches_reference(num_pars):
    """do_expstyle_fit lands in the same optimum as the reference's scipy
    curve_fit on clean synthetic decays (same guesses, same bounds)."""
    fitCt = _ref_module()
    t = np.arange(1.0, 301.0)
    truth = {
        2: (0.35, 40.0),
        3: (0.55, 0.35, 40.0),
        5: (0.6, 0.25, 8.0, 0.12, 120.0),
    }[num_pars]
    y = np.asarray(lx.exp_decay(t, np.asarray(truth), num_pars))
    chi_ref, p_ref, perr_ref, ym_ref = fitCt.do_Expstyle_fit(num_pars, t, y)
    chi, p, perr, ym = lx.do_expstyle_fit(num_pars, t, y)
    np.testing.assert_allclose(ym, ym_ref, atol=5e-6)
    assert chi < max(chi_ref * 1.5, 1e-10)
    # Parameter agreement: sort the (A, tau) terms by tau before comparing
    # (the optimum is permutation-degenerate for num_pars=5).
    def canon(params):
        if num_pars % 2 == 1:
            s, rest = params[0:1], params[1:]
        else:
            s, rest = params[0:0], params
        pairs = sorted(zip(rest[1::2], rest[0::2]))
        return np.concatenate([s, np.asarray(pairs).ravel()])

    np.testing.assert_allclose(canon(p), canon(p_ref), rtol=2e-3)


def test_expstyle_fit_batched():
    t = np.arange(1.0, 201.0)
    A = np.array([0.3, 0.5])
    tau = np.array([20.0, 60.0])
    y = (1 - A)[:, None] + A[:, None] * np.exp(-t[None] / tau[:, None])
    chi, p, perr, ym = lx.do_expstyle_fit(2, t, y)
    assert chi.shape == (2,) and p.shape == (2, 2)
    np.testing.assert_allclose(p[:, 0], A, rtol=1e-4)
    np.testing.assert_allclose(p[:, 1], tau, rtol=1e-4)


def test_bound_violation_sentinel():
    """Fits whose amplitude sum exceeds 1 return the reference's 9999.99
    sentinel chi (fitting_Ct_functions.py:621-627)."""
    t = np.arange(1.0, 101.0)
    # S2 + A chosen so the best unconstrained fit exceeds sum 1: target a
    # curve above 1 everywhere.
    y = 0.9 + 0.4 * np.exp(-t / 10.0)
    chi, p, perr, ym = lx.do_expstyle_fit(3, t, y)
    assert chi == 9999.99


def test_lsstyle_reference_is_broken_ours_works():
    """The reference's do_LSstyle_fit raises NameError for num_pars >= 2
    (func_LS_decay2.. are commented out, fitting_Ct_functions.py:483-500);
    our implementation of the intended product model recovers truth."""
    fitCt = _ref_module()
    t = np.arange(1.0, 301.0)
    S2a, tau_a = 0.7, 50.0
    y = S2a + (1 - S2a) * np.exp(-t / tau_a)
    with pytest.raises(NameError):
        fitCt.do_LSstyle_fit(2, t, y)
    chi, p, perr, ym = lx.do_lsstyle_fit(2, t, y)
    np.testing.assert_allclose(p, [S2a, tau_a], rtol=1e-4)
    assert chi < 1e-10


def test_lsstyle_product_recovery():
    # NB: the reference applies the same amplitude-sum _bound_check to LS
    # fits, so S2 factors summing > 1 get the 9999.99 sentinel even at a
    # perfect fit; pick a truth below that threshold (sum 0.95).
    t = np.arange(1.0, 501.0)
    truth = np.array([0.3, 0.35, 120.0, 0.3, 10.0])  # S2_0 * two factors
    y = np.asarray(lx.ls_decay(t, truth, 5))
    chi, p, perr, ym = lx.do_lsstyle_fit(5, t, y)
    np.testing.assert_allclose(ym, y, atol=1e-6)
    assert chi < 1e-10


def test_lsstyle_sum_gt_one_sentinel():
    """LS fits whose S2 factors sum > 1 hit the reference's _bound_check
    sentinel — parity-replicated even though it flags physically normal
    LS parameters (amplitudes are order parameters, not fractions)."""
    t = np.arange(1.0, 501.0)
    truth = np.array([0.8, 0.75, 120.0, 0.85, 10.0])
    y = np.asarray(lx.ls_decay(t, truth, 5))
    chi, p, perr, ym = lx.do_lsstyle_fit(5, t, y)
    np.testing.assert_allclose(ym, y, atol=1e-6)
    assert chi == 9999.99


def test_calc_chi_accepts_empty_sigma_sentinel():
    """The reference's default sentinel is dy=[] (fitting_Ct_functions.py
    :547) meaning unweighted — an empty array must not broadcast-crash."""
    import numpy as np

    from spinrelax_tpu.fit.legacy_expfit import calc_chi

    y = np.array([1.0, 2.0, 3.0])
    m = np.array([1.1, 1.9, 3.2])
    want = calc_chi(y, m, None)
    np.testing.assert_allclose(calc_chi(y, m, []), want)
    np.testing.assert_allclose(calc_chi(y, m, np.array([])), want)
