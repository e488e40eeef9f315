"""Global optimisation: synthetic parameter recovery, chi-square parity
with the reference's spinRelaxationExperiments, and the rsCSA local stage.
"""

import os
import sys

import numpy as np
import pytest

from spinrelax_tpu.constants import NucleusPair, field_from_mhz
from spinrelax_tpu.fit.globalfit import GlobalFitter, chisq_total
from spinrelax_tpu.io.experiments import ExperimentData
from spinrelax_tpu.models import CtModelSet, Diffusion
from spinrelax_tpu.models.experiments import ExperimentSet
from spinrelax_tpu.ops import observables as obs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIM = os.path.join(REPO, "tools", "refshim")


def make_setup(rng, n_res=8, n_samp=16, aniso=1.5, diso=4e-5, zeta=0.89):
    names = [str(i + 2) for i in range(n_res)]
    S2 = rng.uniform(0.6, 0.9, n_res)
    C = rng.uniform(0.02, 0.1, (n_res, 2))
    tau = np.stack(
        [rng.uniform(5, 30, n_res), rng.uniform(100, 800, n_res)], axis=-1
    )
    cts = CtModelSet.from_lists(
        names, S2, list(C), list(tau), s2fast=[True] * n_res, zeta=zeta, sort=False
    )
    v = rng.normal(size=(n_res, n_samp, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = rng.uniform(0.5, 2.0, (n_res, n_samp))
    diff = Diffusion.axisymmetric(diso=diso, aniso=aniso)
    return names, cts, diff, v, w


def synth_experiments(names, cts, diff, v, w, fields=(600.133, 850.13), noise=0.0, rng=None):
    expts = []
    for f in fields:
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w)
        for t, vals, errs in (
            ("R1", rates.R1, rates.dR1),
            ("R2", rates.R2, rates.dR2),
            ("NOE", rates.NOE, rates.dNOE),
        ):
            y = np.asarray(vals).copy()
            e = np.maximum(np.asarray(errs), 0.02 * np.abs(y))
            if noise > 0:
                y += rng.normal(scale=noise * np.abs(y))
            expts.append(
                ExperimentData(
                    expt_type=t,
                    nuclei_a="15N",
                    nuclei_b="1H",
                    frequency=f,
                    freq_unit="MHz",
                    names=np.array(names),
                    values=y,
                    errors=e,
                )
            )
    return expts


def test_chisq_zero_at_truth(rng):
    names, cts, diff, v, w = make_setup(rng)
    expts = synth_experiments(names, cts, diff, v, w)
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    chi = float(
        chisq_total(es, diff.diso, diff.aniso, cts.zeta, np.full(len(names), -170e-6))
    )
    assert chi < 1e-12


def test_diso_recovery_powell(rng):
    names, cts, diff, v, w = make_setup(rng, diso=4e-5)
    expts = synth_experiments(names, cts, diff, v, w)
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    # Start 20% off.
    es = ExperimentSet.build(expts, cts, diff.with_diso(4.8e-5), vecs=v, weights=w)
    fitter = GlobalFitter(es, ["Diso"])
    state = fitter.run(method="powell")
    np.testing.assert_allclose(state.diso, 4e-5, rtol=1e-4)
    assert state.chisq < 1e-8


@pytest.mark.parametrize("method", ["gradient", "device"])
def test_diso_daniso_recovery_gradient(rng, method):
    """The exact-gradient scipy path and the one-dispatch on-device BFGS
    (pure-JAX, no host round-trips per iterate) both recover the truth."""
    names, cts, diff, v, w = make_setup(rng, diso=4e-5, aniso=1.5)
    expts = synth_experiments(names, cts, diff, v, w)
    start = Diffusion.axisymmetric(diso=5e-5, aniso=1.2)
    es = ExperimentSet.build(expts, cts, start, vecs=v, weights=w)
    fitter = GlobalFitter(es, ["Diso", "Daniso"])
    state = fitter.run(method=method)
    np.testing.assert_allclose(state.diso, 4e-5, rtol=1e-3)
    np.testing.assert_allclose(state.aniso, 1.5, rtol=1e-2)


def test_rscsa_local_recovery(rng):
    names, cts, diff, v, w = make_setup(rng, n_res=6)
    csa_true = rng.uniform(-190e-6, -150e-6, 6)
    # Build experiments from residue-specific CSA truth.
    expts = []
    for f in (600.133, 850.13):
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w, csa=csa_true)
        for t, vals, errs in (("R1", rates.R1, rates.dR1), ("R2", rates.R2, rates.dR2)):
            expts.append(
                ExperimentData(
                    expt_type=t, nuclei_a="15N", nuclei_b="1H", frequency=f,
                    freq_unit="MHz", names=np.array(names),
                    values=np.asarray(vals).copy(),
                    errors=np.maximum(np.asarray(errs), 1e-3),
                )
            )
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    fitter = GlobalFitter(es, ["rsCSA"])
    state = fitter.run()
    np.testing.assert_allclose(state.csa, csa_true, rtol=1e-3)


def test_rscsa_far_outside_initial_bracket(rng):
    """The reference's per-residue Powell is unbounded
    (spectral_densities.py:1371-1382): a true rsCSA 300+ ppm from the
    start value must still be recovered, not silently clamped to the
    edge of the golden-section bracket (bracket-expansion path)."""
    names, cts, diff, v, w = make_setup(rng, n_res=4)
    # Start value is the 15N default -170 ppm; put truths far outside the
    # +-150 ppm initial bracket on both sides.
    # (chi-square is even in csa, so magnitudes must exceed the 320 ppm
    # initial bracket edge to force at least one expansion per residue)
    csa_true = np.array([-520e-6, 440e-6, -470e-6, 610e-6])
    expts = []
    for f in (600.133, 850.13):
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w, csa=csa_true)
        for t, vals, errs in (("R1", rates.R1, rates.dR1), ("R2", rates.R2, rates.dR2)):
            expts.append(
                ExperimentData(
                    expt_type=t, nuclei_a="15N", nuclei_b="1H", frequency=f,
                    freq_unit="MHz", names=np.array(names),
                    values=np.asarray(vals).copy(),
                    errors=np.maximum(np.asarray(errs), 1e-3),
                )
            )
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    fitter = GlobalFitter(es, ["rsCSA"])
    state = fitter.run()
    # chi-square is even in the sign of the CSA-squared term only through
    # csa^2 in R1/R2; both signs contribute linearly via f_csa^2*csa^2 --
    # the objective may admit the mirrored solution, so compare |csa|.
    np.testing.assert_allclose(
        np.abs(state.csa), np.abs(csa_true), rtol=1e-3
    )


@pytest.mark.parametrize("method", ["powell", "device"])
def test_alternating_diso_rscsa(rng, method):
    """Host-driven (powell) and fused one-dispatch-per-cycle (device)
    alternating loops both recover the truth; 'device' runs the global LM
    and the bracket-expanding rsCSA golden-section inside ONE jitted cycle
    (GlobalFitter._cycle_device)."""
    names, cts, diff, v, w = make_setup(rng, n_res=5, diso=4e-5)
    csa_true = rng.uniform(-185e-6, -155e-6, 5)
    expts = []
    for f in (600.133, 750.13, 850.13):
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w, csa=csa_true)
        for t, vals, errs in (
            ("R1", rates.R1, rates.dR1),
            ("R2", rates.R2, rates.dR2),
            ("NOE", rates.NOE, rates.dNOE),
        ):
            expts.append(
                ExperimentData(
                    expt_type=t, nuclei_a="15N", nuclei_b="1H", frequency=f,
                    freq_unit="MHz", names=np.array(names),
                    values=np.asarray(vals).copy(),
                    errors=np.maximum(np.asarray(errs), 1e-3),
                )
            )
    start = diff.with_diso(4.6e-5)
    es = ExperimentSet.build(expts, cts, start, vecs=v, weights=w)
    fitter = GlobalFitter(es, ["Diso", "rsCSA"])
    state = fitter.run(max_cycles=10, tol=1e-8, method=method)
    np.testing.assert_allclose(state.diso, 4e-5, rtol=1e-3)
    np.testing.assert_allclose(state.csa, csa_true, rtol=5e-3)


@pytest.mark.slow
def test_chisq_parity_vs_reference(rng, tmp_path):
    """Evaluate the reference's calc_chisq on identical inputs and compare
    against chisq_total."""
    sys.path.insert(0, SHIM)
    sys.path.insert(0, REF)
    try:
        import fitting_Ct_functions as fitCt
        import spectral_densities as sd

        names, cts, diff, v, w = make_setup(rng, n_res=5, n_samp=8)
        expts = synth_experiments(names, cts, diff, v, w, fields=(600.133,))
        # Perturb Diso so chi-square is non-zero.
        diff2 = diff.with_diso(float(np.asarray(diff.diso)) * 1.1)
        es = ExperimentSet.build(expts, cts, diff2, vecs=v, weights=w)
        got = float(
            chisq_total(
                es, diff2.diso, diff2.aniso, cts.zeta, np.full(5, -170e-6)
            )
        )

        # Reference setup.
        grd = sd.globalRotationalDiffusion_Axisymmetric(
            D=[float(np.asarray(diff2.diso)), float(np.asarray(diff2.aniso))]
        )
        grd.bVecs = True
        grd.vecNames = np.array(names)
        grd.vecXH = np.swapaxes(v, 0, 1)
        grd.vecWeights = np.swapaxes(w, 0, 1)
        grd.axisAvg = 0
        grd.update_A_coefficients()
        ac = fitCt.autoCorrelations()
        S2 = np.asarray(cts.S2)
        C = np.asarray(cts.C)
        tau = np.asarray(cts.tau)
        for i, n in enumerate(names):
            ac.add_model(n, listC=list(C[i]), listTau=list(tau[i]), S2=S2[i], bS2Fast=True)
        ac.set_zeta(float(np.asarray(cts.zeta)))
        objE = sd.spinRelaxationExperiments(grd, ac)
        for i, e in enumerate(expts):
            fn = str(tmp_path / f"e{i}.dat")
            from spinrelax_tpu.io.experiments import write_experiment

            write_experiment(fn, e)
            objE.add_experiment(fn)
        objE.map_experiment_peaknames_to_models()
        objE.eval_all()
        want = objE.calc_chisq()
        np.testing.assert_allclose(got, want, rtol=1e-8)
    finally:
        sys.path.remove(SHIM)
        sys.path.remove(REF)


def test_partial_coverage_and_uncovered_rscsa(rng):
    """Experiments covering only a subset of residues: chi-square must use
    masks, and rsCSA must leave uncovered residues' CSA untouched
    (reference skips them via mapExptCoverage, :1375-1377)."""
    names, cts, diff, v, w = make_setup(rng, n_res=6)
    csa_true = rng.uniform(-190e-6, -150e-6, 6)
    covered = [0, 1, 3, 5]  # residues 2,3,5,7 covered; 4,8 not
    expts = []
    for f in (600.133, 850.13):
        pair = NucleusPair(B0=field_from_mhz(f), time_unit="ps")
        rates = obs.predict_rates_newapi(pair, diff, cts, vecs=v, weights=w, csa=csa_true)
        for t, vals, errs in (("R1", rates.R1, rates.dR1), ("R2", rates.R2, rates.dR2)):
            expts.append(
                ExperimentData(
                    expt_type=t, nuclei_a="15N", nuclei_b="1H", frequency=f,
                    freq_unit="MHz",
                    names=np.array([names[i] for i in covered]),
                    values=np.asarray(vals)[covered].copy(),
                    errors=np.maximum(np.asarray(errs)[covered], 1e-3),
                )
            )
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    counts = es.coverage_counts()
    np.testing.assert_array_equal(counts > 0, [True, True, False, True, False, True])

    start_csa = np.full(6, -170e-6)
    es.csa = start_csa.copy()
    fitter = GlobalFitter(es, ["rsCSA"])
    state = fitter.run()
    # Covered residues recover truth; uncovered keep the starting value.
    np.testing.assert_allclose(state.csa[covered], csa_true[covered], rtol=1e-3)
    uncovered = [2, 4]
    np.testing.assert_array_equal(state.csa[uncovered], start_csa[uncovered])


def test_experiment_peaks_not_in_models(rng):
    """Experimental peaks with no simulated counterpart are dropped
    (list_get_map semantics) rather than crashing."""
    names, cts, diff, v, w = make_setup(rng, n_res=4)
    expt = ExperimentData(
        expt_type="R1", nuclei_a="15N", nuclei_b="1H", frequency=600.133,
        freq_unit="MHz",
        names=np.array(["2", "3", "99", "100"]),  # 99/100 unknown
        values=np.array([1.5, 1.6, 9.9, 9.8]),
        errors=np.array([0.1, 0.1, 0.1, 0.1]),
    )
    es = ExperimentSet.build([expt], cts, diff, vecs=v, weights=w)
    m = es.experiments[0].mask
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    chi = float(chisq_total(es, diff.diso, diff.aniso, cts.zeta, np.full(4, -170e-6)))
    assert np.isfinite(chi)


def test_empty_opt_vars_is_eval_only(rng):
    """GlobalFitter(es, []).run() must evaluate WITHOUT optimising —
    the alternating loop used to fall through and run an unrequested
    rsCSA local pass, mutating state.csa (round-3 review finding)."""
    names, cts, diff, v, w = make_setup(rng, n_res=4)
    expts = synth_experiments(names, cts, diff, v, w, noise=0.01, rng=rng)
    es = ExperimentSet.build(expts, cts, diff, vecs=v, weights=w)
    fitter = GlobalFitter(es, [])
    csa_before = fitter.state.csa.copy()
    st = fitter.run(method="powell")
    np.testing.assert_array_equal(st.csa, csa_before)
    assert np.isfinite(st.chisq)
