"""Script-level parity for the C(t)/S2 trajectory stage (BASELINE config
#1): run the reference calculate-Ct-from-traj.py (via the mdtraj shim
with an independent SVD-Kabsch superpose) and `spinrelax ct` on the same
synthetic trajectory; C(t), S2 and vector histograms must agree."""

import os
import subprocess
import sys

import numpy as np
import pytest

from spinrelax_tpu.io import xvg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIM = os.path.join(REPO, "tools", "refshim")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_runall import build_synthetic_system  # noqa: E402


@pytest.mark.slow
def test_ct_stage_parity(tmp_path, rng):
    ref_fn, trj_fn, truth = build_synthetic_system(
        tmp_path, rng, n_res=6, n_frames=2000
    )

    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + ":" + REF
    env["PYTHONSAFEPATH"] = "1"
    ref = subprocess.run(
        [
            sys.executable, os.path.join(REF, "calculate-Ct-from-traj.py"),
            "-s", ref_fn,
            "-f", trj_fn,
            "-o", str(tmp_path / "ref"),
            "--tau", "500",
            "--Ct", "--S2", "--vecHist", "--binary",
        ],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert ref.returncode == 0, ref.stderr[-4000:]

    ours = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
            "ct",
            "-s", ref_fn,
            "-f", trj_fn,
            "-o", str(tmp_path / "our"),
            "-t", "500",
            "--Ct", "--S2", "--vecHist", "--binary",
        ],
        env={**os.environ, "PYTHONPATH": REPO},
        capture_output=True, text=True, timeout=1200,
    )
    assert ours.returncode == 0, ours.stderr[-4000:]

    # C(t) internal + external: float32 trajectory pipeline -> ~1e-5.
    for suffix in ("_Ctint.dat", "_Ctext.dat"):
        rl, rx_, ry, rdy = xvg.load_sxydylist(str(tmp_path / ("ref" + suffix)), "legend")
        ol, ox, oy, ody = xvg.load_sxydylist(str(tmp_path / ("our" + suffix)), "legend")
        assert rl == ol
        np.testing.assert_allclose(np.asarray(ox), np.asarray(rx_), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(oy), np.asarray(ry), atol=5e-5, err_msg=suffix)
        np.testing.assert_allclose(np.asarray(ody), np.asarray(rdy), atol=5e-5)

    # S2 with block statistics.
    rm = xvg.load_matrix(str(tmp_path / "ref_S2.dat"))
    om = xvg.load_matrix(str(tmp_path / "our_S2.dat"))
    np.testing.assert_array_equal(rm[:, 0], om[:, 0])
    np.testing.assert_allclose(om[:, 1], rm[:, 1], atol=1e-4)
    np.testing.assert_allclose(om[:, 2], rm[:, 2], atol=1e-4)

    # Vector histograms: same bins; counts may differ only at bin borders
    # (float rounding of phi/cos values) — compare totals and distribution.
    robj = np.load(str(tmp_path / "ref_vecHistogram.npz"), allow_pickle=True)
    oobj = np.load(str(tmp_path / "our_vecHistogram.npz"), allow_pickle=True)
    rh = np.asarray(robj["data"], dtype=float)
    oh = np.asarray(oobj["data"], dtype=float)
    assert rh.shape == oh.shape == (6, 72, 36)
    np.testing.assert_array_equal(rh.sum(axis=(1, 2)), oh.sum(axis=(1, 2)))
    # Earth-mover-lite: fraction of mass in differing bins must be tiny.
    frac_moved = np.abs(rh - oh).sum() / rh.sum() / 2
    assert frac_moved < 0.02, frac_moved
