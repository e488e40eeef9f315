"""End-to-end workflow test: a synthetic tumbling 'protein' with internal
wobble goes through the full run-all pipeline; outputs must exist, parse,
and recover the planted global/local parameters."""

import os
import subprocess
import sys

import numpy as np
import pytest

from spinrelax_tpu.io import pdb as pdbio
from spinrelax_tpu.io import trajectory as trajio
from spinrelax_tpu.io import xvg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def np_qmult(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ]
    )


def quat_rotate(v, q):
    w, qv = q[0], q[1:]
    a = np.cross(qv, v) + w * v
    return v + 2 * np.cross(qv, a)


def build_synthetic_system(tmp_path, rng, n_res=8, n_frames=6000, dt=1.0,
                           D_iso=3.3e-4, wobble=0.35, dtype=np.float32):
    """A rigid scaffold of residues (N, H, CA atoms) undergoing isotropic
    rotational diffusion with tau_c = 1/(6 D_iso) ~ 500 ps, plus azimuthal
    wobble of each H about its N-H axis (planting S2 < 1)."""
    # Base coordinates (nm): residues on a ring, N-H pointing outward.
    n_atoms = n_res * 3
    base = np.zeros((n_atoms, 3))
    names, res_seqs, res_names, occs = [], [], [], []
    nh_dirs = []
    for i in range(n_res):
        th = 2 * np.pi * i / n_res
        cen = np.array([np.cos(th), np.sin(th), 0.2 * np.sin(3 * th)])
        d = np.array([np.cos(th) * 0.6, np.sin(th) * 0.6, 0.8 - 0.15 * i / n_res])
        d /= np.linalg.norm(d)
        nh_dirs.append(d)
        base[3 * i + 0] = cen  # N
        base[3 * i + 1] = cen + 0.102 * d  # H at 1.02 A
        base[3 * i + 2] = cen + np.array([0.05, -0.03, 0.08])  # CA
        names += ["N", "H", "CA"]
        res_seqs += [i + 2] * 3
        res_names += ["ALA"] * 3
        occs += [0.0, 0.0, 1.0]
    top = pdbio.Topology(
        atom_names=names,
        res_seqs=np.array(res_seqs),
        res_names=res_names,
        chain_ids=["A"] * n_atoms,
        occupancies=np.array(occs),
        elements=["N", "H", "C"] * n_res,
    )
    ref_fn = str(tmp_path / "reference.pdb")
    pdbio.write_pdb(ref_fn, top, base)

    # Global diffusion quaternions.
    sig = np.sqrt(2.0 * D_iso * dt)
    q = np.zeros((n_frames, 4))
    q[0] = [1.0, 0, 0, 0]
    for t in range(1, n_frames):
        w = rng.normal(scale=sig, size=3)
        th = np.linalg.norm(w)
        ax = w / th if th > 0 else np.array([1.0, 0, 0])
        dq = np.concatenate([[np.cos(th / 2)], ax * np.sin(th / 2)])
        q[t] = np_qmult(q[t - 1], dq)
        q[t] /= np.linalg.norm(q[t])

    # Internal wobble: rotate each H about a cone around its N-H axis with
    # OU-process azimuth (tau_int ~ 30 ps).
    tau_int = 30.0
    phi = np.zeros((n_frames, n_res))
    for t in range(1, n_frames):
        phi[t] = phi[t - 1] * np.exp(-dt / tau_int) + rng.normal(
            scale=0.8 * np.sqrt(1 - np.exp(-2 * dt / tau_int)), size=n_res
        )

    xyz = np.zeros((n_frames, n_atoms, 3))
    for i in range(n_res):
        d = nh_dirs[i]
        # Orthonormal frame around d.
        e1 = np.cross(d, [0.0, 0.0, 1.0])
        e1 /= np.linalg.norm(e1)
        e2 = np.cross(d, e1)
        cw, sw = np.cos(wobble), np.sin(wobble)
        for t in range(n_frames):
            dir_t = cw * d + sw * (np.cos(phi[t, i]) * e1 + np.sin(phi[t, i]) * e2)
            xyz[t, 3 * i + 0] = base[3 * i + 0]
            xyz[t, 3 * i + 1] = base[3 * i + 0] + 0.102 * dir_t
            xyz[t, 3 * i + 2] = base[3 * i + 2]
    # Apply global rotation frame-by-frame.
    for t in range(n_frames):
        xyz[t] = quat_rotate(xyz[t], q[t])

    trj_fn = str(tmp_path / "solute.npz")
    trajio.save_trajectory_npz(trj_fn, xyz.astype(dtype), timestep=dt)
    s2_cone = (np.cos(wobble) * (1 + np.cos(wobble)) / 2) ** 2
    return ref_fn, trj_fn, dict(D_iso=D_iso, s2_planted=s2_cone)


@pytest.mark.slow
def test_run_all_end_to_end(tmp_path, rng):
    ref_fn, trj_fn, truth = build_synthetic_system(tmp_path, rng)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
            "run-all",
            "-out", "rotdif",
            "-sxtc", trj_fn,
            "-refpdb", ref_fn,
            "-qfile", str(tmp_path / "colvar-qorient"),
            "-t_mem", "1000",
            "-Bfields", "600.133",
            "-Temp_MD", "297", "-Temp_Exp", "297", "-D2O_Exp", "0",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-4000:] + out.stdout[-2000:]

    pref = str(tmp_path / "rotdif-1ns")
    for suffix in ("-iso.dat", "-aniso2.dat", "-aniso_q.dat", "_Ctint.dat",
                   "_Ctext.dat", "_S2.dat", "_fittedCt.dat", "_vecHistogram.npz",
                   "-600_R1.dat", "-600_R2.dat", "-600_NOE.dat", "-600_rho.dat"):
        assert os.path.exists(pref + suffix), f"missing artefact {suffix}"

    # Diso recovery from the aniso2 headers (the workflow's grep target).
    diso = None
    with open(pref + "-aniso2.dat") as fp:
        for line in fp:
            if "Converted Diso" in line:
                diso = float(line.split()[4]) * 1e-12
                break
    assert diso is not None
    np.testing.assert_allclose(diso, truth["D_iso"], rtol=0.35)

    # S2 values: planted cone S2 times zeta.
    m = xvg.load_matrix(pref + "_S2.dat")
    s2 = m[:, 1]
    zeta = (1.02 / 1.04) ** 6
    np.testing.assert_allclose(
        s2, truth["s2_planted"] * zeta, atol=0.1
    )

    # Relaxation rates: finite, positive R1/R2.
    _, r1 = xvg.load_xy(pref + "-600_R1.dat")[:2]
    _, r2 = xvg.load_xy(pref + "-600_R2.dat")[:2]
    assert np.all(np.isfinite(r1)) and np.all(r1 > 0)
    assert np.all(np.isfinite(r2)) and np.all(r2 > 0)
    assert np.all(r2 > r1)  # slow tumbling regime at 600 MHz, tau ~ 500 ps

    # Resume: a second invocation must skip all stages quickly.
    out2 = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
            "run-all",
            "-out", "rotdif",
            "-sxtc", trj_fn,
            "-refpdb", ref_fn,
            "-qfile", str(tmp_path / "colvar-qorient"),
            "-t_mem", "1000",
            "-Bfields", "600.133",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    assert "skipping" in out2.stdout.lower() or "Skipping" in out2.stdout

    # Interrupted-relax resume: a run killed between the R2 and NOE
    # writes must RE-RUN the relax stage, not skip it forever (the
    # output list used to name only R1/R2; round-3 review finding).
    os.remove(pref + "-600_NOE.dat")
    out3 = subprocess.run(
        [
            sys.executable, "-c",
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from spinrelax_tpu.pipeline.cli import main; main()",
            "run-all",
            "-out", "rotdif",
            "-sxtc", trj_fn,
            "-refpdb", ref_fn,
            "-qfile", str(tmp_path / "colvar-qorient"),
            "-t_mem", "1000",
            "-Bfields", "600.133",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out3.returncode == 0, out3.stderr[-3000:]
    assert os.path.exists(pref + "-600_NOE.dat"), "NOE not regenerated"


@pytest.mark.slow
def test_runall_streamed_ct(tmp_path, rng):
    """run-all with -stream: the streamed C(t) stage slots into the full
    pipeline and produces the same fitted-Ct artefacts."""
    import subprocess

    ref_fn, trj_fn, _ = build_synthetic_system(
        tmp_path, rng, n_res=4, n_frames=1600
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from spinrelax_tpu.pipeline.cli import main; main()",
         "run-all", "-out", "sr",
         "-sxtc", trj_fn, "-refpdb", ref_fn,
         "-qfile", str(tmp_path / "colvar-qorient"),
         "-t_mem", "400", "-stream", "2", "-vecstorage", "PhiTheta",
         "-Temp_MD", "297", "-Temp_Exp", "297", "-D2O_Exp", "0"],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    import glob
    assert glob.glob(str(tmp_path / "sr*_vecPhiTheta.npz")), os.listdir(tmp_path)
    assert glob.glob(str(tmp_path / "sr*_fittedCt.dat"))


def test_runall_streamed_ct_mesh_cli(tmp_path, rng):
    """run-all -stream -devices 8: the CLI builds the (rep, res) mesh and
    the sharded streamed C(t) produces byte-identical stage artefacts to
    the single-device run (VERDICT r2 #6)."""
    import subprocess

    # f64 trajectory: with f32 coordinates the tiny-lag C(t) variance sits
    # at the f32 cancellation floor, where bitwise equality across
    # different (sharded vs single-device) reduction orders is impossible.
    ref_fn, trj_fn, _ = build_synthetic_system(
        tmp_path, rng, n_res=4, n_frames=1600, dtype=np.float64
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    outputs = {}
    for tag, extra in (("one", []), ("mesh", ["-devices", "8"])):
        sub = tmp_path / tag
        sub.mkdir()
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             # f64 so reduction-order differences between the sharded
             # psum and the single-device sum sit ~8 digits below the
             # printed precision (f32 would surface them at digit 8).
             "jax.config.update('jax_enable_x64', True);"
             "from spinrelax_tpu.pipeline.cli import main; main()",
             "run-all", "-out", str(sub / "sr"),
             "-sxtc", trj_fn, "-refpdb", ref_fn,
             "-qfile", str(tmp_path / "colvar-qorient"),
             "-t_mem", "400", "-stream", "2",
             "-Temp_MD", "297", "-Temp_Exp", "297", "-D2O_Exp", "0"]
            + extra,
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
        outputs[tag] = sub
    import glob

    def assert_artefacts_match(a, b):
        """Byte-equality per token, except float tokens may differ in the
        LAST printed digit (~1e-8 relative): the sharded psum reduction
        tree legitimately differs from the single-device sequential sum
        at the final ulp, which the 9-significant-digit artefact format
        occasionally surfaces.  Everything else must be bitwise equal."""
        with open(a) as fa, open(b) as fb:
            la, lb = fa.read().splitlines(), fb.read().splitlines()
        assert len(la) == len(lb), (a, len(la), len(lb))
        for x, y in zip(la, lb):
            if x == y:
                continue
            tx, ty = x.split(), y.split()
            assert len(tx) == len(ty), (a, x, y)
            for u, v in zip(tx, ty):
                if u == v:
                    continue
                fu, fv = float(u), float(v)  # raises -> non-float diff
                assert abs(fu - fv) <= 2e-8 * max(abs(fu), abs(fv)), (a, x, y)

    singles = sorted(glob.glob(str(outputs["one"] / "sr*_Ct*.dat")))
    assert singles
    for fn in singles:
        assert_artefacts_match(fn, str(outputs["mesh"] / os.path.basename(fn)))
    a = glob.glob(str(outputs["one"] / "sr*_fittedCt.dat"))[0]
    assert_artefacts_match(a, str(outputs["mesh"] / os.path.basename(a)))
