"""Multi-replica (folders) run-all: two synthetic replica trajectories,
aggregate colvar with repeated FIELDS headers, dq --multi path, pooled
C(t), plus the legacy relax --opt CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from spinrelax_tpu.io import xvg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_runall import build_synthetic_system  # noqa: E402


def run_cli(args, cwd, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
        ]
        + args,
        cwd=str(cwd),
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_run_all_multi_replica(tmp_path, rng):
    # Two replica folders with independent trajectories of the same system.
    folders = []
    for i in range(2):
        d = tmp_path / f"rep{i}"
        d.mkdir()
        ref_fn, trj_fn, truth = build_synthetic_system(d, rng, n_frames=4000)
        os.rename(trj_fn, d / "solute.npz")
        os.rename(ref_fn, d / "reference.pdb")
        folders.append(str(d))
    with open(tmp_path / "folders.txt", "w") as fp:
        fp.write("\n".join(folders) + "\n")

    out = run_cli(
        [
            "run-all",
            "-out", "rotdif",
            "-folders", "folders.txt",
            "-sxtc", "solute.npz",
            "-refpdb", "reference.pdb",
            "-qfile", "colvar-qorient",
            "-t_mem", "1000",
            "-Bfields", "600.133",
            "-num_chunks", "2",
            "-Temp_MD", "297", "-Temp_Exp", "297", "-D2O_Exp", "0",
        ],
        tmp_path,
    )
    assert out.returncode == 0, out.stderr[-4000:] + out.stdout[-2000:]

    # Aggregate colvar must contain two FIELDS headers.
    with open(tmp_path / "colvar-qorient-aggregate") as fp:
        n_headers = sum(1 for l in fp if "FIELDS" in l)
    assert n_headers == 2

    pref = str(tmp_path / "rotdif-1ns")
    for suffix in ("-aniso2.dat", "_Ctint.dat", "_fittedCt.dat", "-600_R1.dat"):
        assert os.path.exists(pref + suffix), suffix
    _, r1 = xvg.load_xy(pref + "-600_R1.dat")[:2]
    assert np.all(np.isfinite(r1)) and np.all(r1 > 0)
    # Diso from headers sane vs planted value.
    with open(pref + "-aniso2.dat") as fp:
        for line in fp:
            if "Converted Diso" in line:
                diso = float(line.split()[4]) * 1e-12
                break
    np.testing.assert_allclose(diso, truth["D_iso"], rtol=0.4)


@pytest.mark.slow
def test_relax_opt_cli(tmp_path, rng):
    """Legacy --opt Diso via the relax CLI against a synthetic experiment
    table."""
    ref_fn, trj_fn, truth = build_synthetic_system(tmp_path, rng, n_frames=4000)
    out = run_cli(
        [
            "run-all", "-out", "rotdif",
            "-sxtc", trj_fn, "-refpdb", ref_fn,
            "-qfile", str(tmp_path / "colvar-qorient"),
            "-t_mem", "1000", "-Bfields", "600.133",
            "-Temp_MD", "297", "-Temp_Exp", "297", "-D2O_Exp", "0",
        ],
        tmp_path,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    pref = str(tmp_path / "rotdif-1ns")
    # Build a pseudo-experiment from the predictions (so the fit recovers
    # the same Diso used to predict them).
    _, r1, dr1 = xvg.load_xydy(pref + "-600_R1.dat")
    resid = xvg.load_xy(pref + "-600_R1.dat")[0]
    _, r2, dr2 = xvg.load_xydy(pref + "-600_R2.dat")
    _, noe, dnoe = xvg.load_xydy(pref + "-600_NOE.dat")
    with open(tmp_path / "expt.dat", "w") as fp:
        for i in range(len(resid)):
            fp.write(
                f"{int(resid[i])} {r1[i]} {max(dr1[i],1e-3)} {r2[i]} "
                f"{max(dr2[i],1e-3)} {noe[i]} {max(dnoe[i],1e-3)}\n"
            )
    # Read back Diso/quat used by run-all.
    with open(pref + "-aniso2.dat") as fp:
        hdr = {}
        for line in fp:
            if not line.startswith("#"):
                break
            if "Diso" in line:
                hdr["Diso"] = float(line.split()[4]) * 1e-12
            for key in ("Dani_L", "Drho_L", "Dani_S", "Drho_S"):
                if key in line:
                    hdr[key] = float(line.split()[4])
    dani = hdr["Dani_L"] if hdr["Drho_L"] < 1 else hdr["Dani_S"]
    out2 = run_cli(
        [
            "relax",
            "-f", pref + "_fittedCt.dat",
            "-o", str(tmp_path / "fit"),
            "--distfn", pref + "_vecHistogram.npz",
            "-F", "600.133e6",
            "-D", f"{hdr['Diso'] * 1.15} {dani}",  # start 15% off
            "-e", str(tmp_path / "expt.dat"),
            "--opt", "Diso",
        ],
        tmp_path,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    # Optimised Diso in the R1 header should be back near the original.
    with open(tmp_path / "fit_R1.dat") as fp:
        for line in fp:
            if "Optimised Diso" in line:
                diso_opt = float(line.split(":")[1].split()[0])
                break
    np.testing.assert_allclose(diso_opt, hdr["Diso"], rtol=0.02)
