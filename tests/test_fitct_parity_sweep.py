"""Randomized LIVE-reference parity sweep for the C(t)-fitting stage,
complementing test_fitct_script_parity.py's single config: varied
component counts, --nofast and --nc modes, each trial with its own seed
(calculate-fitted-Ct.py:64-160).

The ladder stops a rung walk when chi fails to HALVE
(fitting_Ct_functions.py:296-298), so on residues where a component is
barely sampled the selected K can legitimately differ between scipy's
curve_fit and our batched LM (both land within noise of the data);
strict parameter parity is therefore asserted on residues where both
ladders selected the same K, and fit quality against the planted truth
is asserted everywhere.

The reference's multi-file replica averaging is BROKEN as shipped:
`dt_prev` is read before any assignment (calculate-fitted-Ct.py:118),
so ANY >=2-file invocation dies with NameError (and behind that line
the consistency check is inverted, `np.std(Ct_list)` runs after
`del Ct_list`, and the error branch prints to an undefined `fp`).  We
implement the INTENDED equal-weight averaging + pooled uncertainties;
the crash is pinned live below so a reference upgrade would flag it.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from spinrelax_tpu.io import fittedct as fctio
from spinrelax_tpu.io import xvg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIM = os.path.join(REPO, "tools", "refshim")


def _make_ct(rng, n_res, T, dt_step, comps, normalise=False):
    """Planted S2 + sum of exponentials with per-residue random params.

    comps: list of (c_lo, c_hi, t_lo, t_hi) amplitude/timescale windows.
    normalise: rescale the amplitudes so S2 + sum C = 1 exactly — REQUIRED
    for --nofast trials: that model derives S2 = 1 - sum C
    (fitting_Ct_functions.py:426), so un-normalised curves are
    unrepresentable and both tools converge to arbitrary compromises.
    """
    dt = np.arange(1, T + 1) * dt_step
    names = [str(i + 2) for i in range(n_res)]
    S2 = rng.uniform(0.55, 0.85, n_res)
    Cs = np.stack([rng.uniform(c_lo, c_hi, n_res) for c_lo, c_hi, _, _ in comps], 1)
    taus = np.stack([rng.uniform(t_lo, t_hi, n_res) for _, _, t_lo, t_hi in comps], 1)
    if normalise:
        Cs = Cs * ((1.0 - S2) / Cs.sum(1))[:, None]
    y = S2[:, None] + (
        Cs[:, :, None] * np.exp(-dt[None, None, :] / taus[:, :, None])
    ).sum(1)
    return dt, y, names, S2


def _write_ct(tmp_path, tag, names, dt, y, dy):
    fn = str(tmp_path / f"{tag}_Ctint.dat")
    xvg.print_sxylist(fn, names, dt, np.stack([y, dy], axis=-1))
    return fn


def _run_ref(tmp_path, ct_fns, extra_flags, expect_ok=True):
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + ":" + REF
    env["PYTHONSAFEPATH"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REF, "calculate-fitted-Ct.py"),
         "-f", *ct_fns, "-o", str(tmp_path / "ref"), *extra_flags],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if expect_ok:
        assert out.returncode == 0, out.stderr[-3000:]
    return out


def _run_ours(tmp_path, ct_fns, extra_flags):
    ours = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from spinrelax_tpu.pipeline.cli import main; main()",
         "fit-ct", "-f", *ct_fns, "-o", str(tmp_path / "our"), *extra_flags],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=900,
    )
    assert ours.returncode == 0, ours.stderr[-3000:]
    return fctio.read_fittedct(str(tmp_path / "our_fittedCt.dat"))


@pytest.mark.slow
@pytest.mark.parametrize(
    "trial,seed,comps,flags",
    [
        # three-component decay incl. a barely-sampled fast tau, --nofast
        # (amplitudes normalised: that model derives S2 = 1 - sum C)
        ("threecomp", 101,
         [(0.04, 0.08, 3, 8), (0.05, 0.1, 30, 70), (0.06, 0.12, 300, 600)],
         ["--nofast"]),
        # fixed component count (--nc 2), single-exp planted: both
        # ladders must agree on the SAME forced model
        ("fixednc", 303,
         [(0.08, 0.16, 80, 200)],
         ["--nc", "2"]),
    ],
)
def test_fitct_randomized_parity(tmp_path, trial, seed, comps, flags):
    rng = np.random.default_rng(seed)
    n_res, T = 4, 400
    dt, y_clean, names, S2 = _make_ct(rng, n_res, T, 2.0, comps,
                                      normalise="--nofast" in flags)
    sigma = 3e-4
    y = y_clean + rng.normal(scale=sigma, size=y_clean.shape)
    fn = _write_ct(tmp_path, "rep0", names, dt, y, np.full_like(y, sigma))

    _run_ref(tmp_path, [fn], flags)
    ref_cts = fctio.read_fittedct(str(tmp_path / "ref_fittedCt.dat"))
    our_cts = _run_ours(tmp_path, [fn], flags)
    assert ref_cts.names == names and our_cts.names == names

    k_ref = np.asarray(ref_cts.mask).sum(axis=1)
    k_our = np.asarray(our_cts.mask).sum(axis=1)
    same_k = k_ref == k_our
    # Selection usually agrees; a lone near-threshold flip is legal.
    assert same_k.sum() >= n_res - 1, (trial, k_ref, k_our)

    np.testing.assert_allclose(
        np.asarray(our_cts.S2)[same_k], np.asarray(ref_cts.S2)[same_k],
        atol=6e-3, err_msg=trial,
    )
    ours_curve = np.asarray(our_cts.eval(dt))
    ref_curve = np.asarray(ref_cts.eval(dt))
    np.testing.assert_allclose(ours_curve[same_k], ref_curve[same_k],
                               atol=3e-3, err_msg=trial)
    # Every residue, both tools: the fitted model matches the planted
    # truth within noise even where the selected K differs.
    assert float(np.sqrt(np.mean((ours_curve - y_clean) ** 2))) < 1.5e-3
    assert float(np.sqrt(np.mean((ref_curve - y_clean) ** 2))) < 1.5e-3
    np.testing.assert_allclose(np.asarray(our_cts.S2), S2, atol=8e-3,
                               err_msg=trial)


@pytest.mark.slow
def test_fitct_replica_averaging_where_reference_crashes(tmp_path):
    """Two-replica averaging: the reference dies with NameError
    (dt_prev, calculate-fitted-Ct.py:118) on ANY multi-file input — pin
    that live, then validate OUR result against the intended
    equal-weight average (the planted truth)."""
    rng = np.random.default_rng(202)
    n_res, T = 4, 400
    comps = [(0.05, 0.1, 10, 25), (0.06, 0.14, 150, 400)]
    dt, y_clean, names, S2 = _make_ct(rng, n_res, T, 2.0, comps)
    sigma = 3e-4
    fns = [
        _write_ct(tmp_path, f"rep{r}", names, dt,
                  y_clean + rng.normal(scale=sigma, size=y_clean.shape),
                  np.full_like(y_clean, sigma))
        for r in range(2)
    ]

    out = _run_ref(tmp_path, fns, [], expect_ok=False)
    assert out.returncode != 0
    assert "dt_prev" in out.stderr and "NameError" in out.stderr

    our_cts = _run_ours(tmp_path, fns, [])
    assert our_cts.names == names
    ours_curve = np.asarray(our_cts.eval(dt))
    # sqrt(2) noise reduction from averaging: tighter fit than 1 file.
    assert float(np.sqrt(np.mean((ours_curve - y_clean) ** 2))) < 1.2e-3
    np.testing.assert_allclose(np.asarray(our_cts.S2), S2, atol=6e-3)
    # The averaged-Ct report artefact exists (reference would write
    # ref_averageCt.dat at :141 if it survived that far).
    assert os.path.exists(str(tmp_path / "our_averageCt.dat"))
