"""Worked example: generate a synthetic tumbling 'protein' trajectory and
push it through the complete spinrelax_tpu workflow.

    python examples/synthetic_workflow.py /tmp/demo

Produces the same artefact set as the reference's run-all.bash:
colvar-qorient, rotdif-1ns{-iso,-aniso2,-aniso_q}.dat, _Ctint.dat, _S2.dat,
_fittedCt.dat, _vecHistogram.npz, and rotdif-1ns-600_{R1,R2,NOE,rho}.dat.
"""

import os
import sys

import numpy as np


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


def rotate(v, q):
    w, qv = q[0], q[1:]
    a = np.cross(qv, v) + w * v
    return v + 2 * np.cross(qv, a)


def build_system(workdir, n_res=12, n_frames=8000, dt=1.0, D_iso=3.3e-4, wobble=0.3):
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.io import trajectory as trajio

    rng = np.random.default_rng(1)
    n_atoms = n_res * 3
    base = np.zeros((n_atoms, 3))
    names, res_seqs, res_names, occs = [], [], [], []
    nh = []
    for i in range(n_res):
        th = 2 * np.pi * i / n_res
        cen = np.array([np.cos(th), np.sin(th), 0.3 * np.sin(2 * th)])
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        nh.append(d)
        base[3 * i] = cen
        base[3 * i + 1] = cen + 0.102 * d
        base[3 * i + 2] = cen + [0.05, -0.03, 0.08]
        names += ["N", "H", "CA"]
        res_seqs += [i + 2] * 3
        res_names += ["ALA"] * 3
        occs += [0.0, 0.0, 1.0]
    top = pdbio.Topology(names, np.array(res_seqs), res_names, ["A"] * n_atoms,
                         np.array(occs), ["N", "H", "C"] * n_res)
    ref_fn = os.path.join(workdir, "reference.pdb")
    pdbio.write_pdb(ref_fn, top, base)

    sig = np.sqrt(2 * D_iso * dt)
    q = np.array([1.0, 0, 0, 0])
    tau_int = 25.0
    phi = np.zeros(n_res)
    xyz = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
    e1 = np.cross(nh, [0.0, 0.0, 1.0]); e1 /= np.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = np.cross(nh, e1)
    for t in range(n_frames):
        w = rng.normal(scale=sig, size=3)
        thr = np.linalg.norm(w)
        dq = np.concatenate([[np.cos(thr / 2)], w / thr * np.sin(thr / 2)])
        q = np_qmult(q, dq); q /= np.linalg.norm(q)
        phi = phi * np.exp(-dt / tau_int) + rng.normal(
            scale=0.9 * np.sqrt(1 - np.exp(-2 * dt / tau_int)), size=n_res)
        frame = base.copy()
        dirs = (np.cos(wobble) * np.asarray(nh)
                + np.sin(wobble) * (np.cos(phi)[:, None] * e1 + np.sin(phi)[:, None] * e2))
        for i in range(n_res):
            frame[3 * i + 1] = base[3 * i] + 0.102 * dirs[i]
        xyz[t] = rotate(frame, q)
    trj_fn = os.path.join(workdir, "solute.npz")
    trajio.save_trajectory_npz(trj_fn, xyz, timestep=dt)
    return ref_fn, trj_fn


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spinrelax_demo"
    os.makedirs(workdir, exist_ok=True)
    print(f"= = Building synthetic system in {workdir} ...")
    ref_fn, trj_fn = build_system(workdir)

    from spinrelax_tpu.pipeline.runall import main as runall

    os.chdir(workdir)
    runall([
        "-out", "rotdif",
        "-sxtc", trj_fn,
        "-refpdb", ref_fn,
        "-t_mem", "1000",
        "-Bfields", "600.133", "850.13",
        "-Jw",
    ])
    print("\n= = Artefacts:")
    for f in sorted(os.listdir(workdir)):
        print("   ", f)


if __name__ == "__main__":
    main()
