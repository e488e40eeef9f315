"""Randomized LIVE-reference parity for the small utility scripts.

Runs the actual reference ``calculate-rho-from-expt.py`` and
``parse-hydroNMR-results.py`` (via tools/refshim) against ``spinrelax
rho`` / ``spinrelax hydronmr`` on freshly randomized inputs each run
(seed rotates with SPINRELAX_TEST_SEED) and compares every artefact:
rho tables, .Dxyz/.Dsymm files, printed rotation matrices/quaternions,
and the PAF-rotated PDB coordinates across all six eigenvalue-ordering
branches of reorder_axes (parse-hydroNMR-results.py:5-44).
"""

import itertools
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SHIM = os.path.join(REPO, "tools", "refshim")


def _run_ref(script, args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + ":" + REF
    # Safe-path so the refshim compat modules shadow the reference's own
    # directory (same pattern as test_relax_script_parity.py).
    env["PYTHONSAFEPATH"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REF, script)] + args,
        env=env, cwd=str(cwd), capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-1000:])
    return out


def _run_ours(args, cwd):
    out = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
        ] + args,
        env={**os.environ, "PYTHONPATH": REPO},
        cwd=str(cwd), capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-1000:])
    return out


@pytest.mark.parametrize(
    "with_errors,nuclei", [(False, "NH"), (True, "NH"), (True, "CH")]
)
def test_rho_script_parity(tmp_path, rng, with_errors, nuclei):
    """Random R1/R2/NOE tables (3- and 7-column formats, both isotope
    pairs) -> identical rho (calculate-rho-from-expt.py:36-54)."""
    n = 12
    resid = np.sort(rng.choice(np.arange(2, 200), size=n, replace=False))
    r1 = rng.uniform(0.8, 3.0, n)
    r2 = rng.uniform(5.0, 30.0, n)
    noe = rng.uniform(-0.5, 0.92, n)
    with open(tmp_path / "exp.dat", "w") as fp:
        fp.write("# randomized experimental rates\n")
        for i in range(n):
            if with_errors:
                fp.write(
                    "%d %.8g %.3g %.8g %.3g %.8g %.3g\n"
                    % (resid[i], r1[i], 0.05 * r1[i], r2[i], 0.1 * r2[i],
                       noe[i], 0.02)
                )
            else:
                fp.write("%d %.8g %.8g %.8g\n" % (resid[i], r1[i], r2[i], noe[i]))

    _run_ref(
        "calculate-rho-from-expt.py",
        ["-f", "exp.dat", "-o", "ref_rho.dat", "-n", nuclei], tmp_path,
    )
    _run_ours(["rho", "-f", "exp.dat", "-o", "our_rho.dat", "-n", nuclei], tmp_path)

    ref = np.loadtxt(tmp_path / "ref_rho.dat")
    ours = np.loadtxt(tmp_path / "our_rho.dat")
    np.testing.assert_array_equal(ref[:, 0], ours[:, 0])
    # Reference prints via print_xy ("%g"-family): 6 significant digits.
    np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=2e-5)


def _random_rotation(rng):
    """Uniform-ish proper rotation via QR of a random normal matrix."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1.0
    return q


@pytest.mark.slow
def test_hydronmr_script_parity(tmp_path, rng):
    """All six reorder_axes branches with random tensors and frames:
    byte-identical .Dxyz/.Dsymm, identical printed rotation matrix and
    (up to sign) quaternion, matching rotated-PDB coordinates."""
    from spinrelax_tpu.io import pdb as pdbio

    n_atoms = 7
    top = pdbio.Topology(
        atom_names=["CA"] * n_atoms,
        res_seqs=np.arange(1, n_atoms + 1),
        res_names=["ALA"] * n_atoms,
        chain_ids=["A"] * n_atoms,
        occupancies=np.ones(n_atoms),
        elements=["C"] * n_atoms,
    )
    xyz = rng.normal(scale=0.4, size=(1, n_atoms, 3))

    for k, perm in enumerate(itertools.permutations(range(3))):
        base = np.sort(rng.uniform(1.0e7, 4.0e7, 3))
        base[1] = base[0] + max(base[1] - base[0], 1e5)  # keep distinct
        base[2] = base[1] + max(base[2] - base[1], 1e5)
        dvals = base[list(perm)]  # (Dx, Dy, Dz) in s^-1
        frame = _random_rotation(rng)

        for side in ("ref", "our"):
            d = tmp_path / f"{side}{k}"
            d.mkdir()
            pdbio.write_pdb(str(d / "mol.pdb"), top, xyz)
            with open(d / "output.res", "w") as fp:
                fp.write("  Structural file: mol.pdb\n\n")
                for ax, dv, row in zip("xyz", dvals, frame):
                    fp.write(
                        " D%s  %.6e   eigenvector:  %.9f %.9f %.9f\n"
                        % (ax, dv, row[0], row[1], row[2])
                    )

        ref = _run_ref(
            "parse-hydroNMR-results.py",
            ["-f", "output.res", "--rotate", "--pdb", "mol.pdb",
             "-o", "rot.pdb"],
            tmp_path / f"ref{k}",
        )
        ours = _run_ours(
            ["hydronmr", "-f", "output.res", "--rotate", "--pdb", "mol.pdb",
             "-o", "rot.pdb"],
            tmp_path / f"our{k}",
        )

        # D artefacts byte-identical ("%g" prints on both sides).
        for ext in (".Dxyz", ".Dsymm"):
            rb = (tmp_path / f"ref{k}" / f"mol{ext}").read_bytes()
            ob = (tmp_path / f"our{k}" / f"mol{ext}").read_bytes()
            assert rb == ob, (perm, ext, rb, ob)

        # Printed PAF rotation matrix: same "%16g" rows on both sides.
        def matrix_lines(stdout):
            lines = stdout.splitlines()
            i = lines.index("= = = Rotation matrix:")
            return lines[i + 1 : i + 4]

        assert matrix_lines(ref.stdout) == matrix_lines(ours.stdout), perm

        # Quaternion agrees up to the double-cover sign.
        def quat(stdout):
            lines = stdout.splitlines()
            i = lines.index("= = = Equivalent quaternion:")
            return np.array([float(x) for x in lines[i + 1].split()])

        qr, qo = quat(ref.stdout), quat(ours.stdout)
        assert min(np.abs(qr - qo).max(), np.abs(qr + qo).max()) < 1e-5, perm

        # Rotated coordinates match at PDB %.3f Angstrom precision.
        _, rxyz = pdbio.read_pdb(str(tmp_path / f"ref{k}" / "rot.pdb"))
        _, oxyz = pdbio.read_pdb(str(tmp_path / f"our{k}" / "rot.pdb"))
        np.testing.assert_allclose(oxyz, rxyz, atol=2.5e-4)
