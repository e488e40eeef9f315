"""Script-level parity for the C(t)-fitting stage: the reference
calculate-fitted-Ct.py (scipy ladder) and our `spinrelax fit-ct` (batched
LM ladder) must recover the same multi-exponential parameters from the
same _Ctint.dat file (BASELINE config #2)."""

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


@pytest.mark.slow
def test_fitct_stage_parity(tmp_path, rng):
    # Synthetic two-exponential decays with small noise + error bars.
    n_res, T = 5, 500
    dt = np.arange(1, T + 1) * 2.0
    names = [str(i + 2) for i in range(n_res)]
    S2 = rng.uniform(0.6, 0.85, n_res)
    C1 = rng.uniform(0.04, 0.1, n_res)
    C2 = rng.uniform(0.05, 0.15, n_res)
    t1 = rng.uniform(8, 25, n_res)
    t2 = rng.uniform(150, 400, n_res)
    y = (
        S2[:, None]
        + C1[:, None] * np.exp(-dt[None] / t1[:, None])
        + C2[:, None] * np.exp(-dt[None] / t2[:, None])
        + rng.normal(scale=3e-4, size=(n_res, T))
    )
    dy = np.full_like(y, 3e-4)
    ct_fn = str(tmp_path / "in_Ctint.dat")
    xvg.print_sxylist(ct_fn, names, dt, np.stack([y, dy], axis=-1))

    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + ":" + REF
    env["PYTHONSAFEPATH"] = "1"
    ref = subprocess.run(
        [
            sys.executable, os.path.join(REF, "calculate-fitted-Ct.py"),
            "-f", ct_fn, "-o", str(tmp_path / "ref"),
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert ref.returncode == 0, ref.stderr[-3000:]

    ours = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
            "fit-ct", "-f", ct_fn, "-o", str(tmp_path / "our"),
        ],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=900,
    )
    assert ours.returncode == 0, ours.stderr[-3000:]

    ref_cts = fctio.read_fittedct(str(tmp_path / "ref_fittedCt.dat"))
    our_cts = fctio.read_fittedct(str(tmp_path / "our_fittedCt.dat"))
    assert ref_cts.names == names and our_cts.names == names

    # Parameter agreement: S2 tight; slow tau within a few percent.  Both
    # optimisers may legitimately pick different K on noisy residues, so
    # compare the things the downstream physics consumes.
    np.testing.assert_allclose(
        np.asarray(our_cts.S2), np.asarray(ref_cts.S2), atol=5e-3
    )
    # Model curves must agree everywhere (what J(w) actually integrates).
    ours_curve = np.asarray(our_cts.eval(dt))
    ref_curve = np.asarray(ref_cts.eval(dt))
    np.testing.assert_allclose(ours_curve, ref_curve, atol=2e-3)
    # And both must fit the data well.
    assert np.sqrt(np.mean((ours_curve - y) ** 2)) < 1e-3
    assert np.sqrt(np.mean((ref_curve - y) ** 2)) < 1e-3

    # Recovered physical parameters vs the planted truth.
    np.testing.assert_allclose(np.asarray(our_cts.S2), S2, atol=6e-3)
    slow_tau = np.array(
        [np.max(np.asarray(our_cts.tau[i]) * np.asarray(our_cts.mask[i])) for i in range(n_res)]
    )
    np.testing.assert_allclose(slow_tau, t2, rtol=0.1)
