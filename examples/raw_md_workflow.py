"""Worked example: the COMPLETE pipeline from raw MD output.

Starts where a real simulation ends — a solvated, periodic-boundary-
wrapped trajectory (protein split across box images, drifting through
the cell, waters everywhere) — and runs the whole native chain:

    raw.xtc --center--> solute trajectory --run-all--> R1/R2/NOE

i.e. the reference's `center-solute-gromacs.bash` + `run-all.bash`
workflow with zero external tools (no GROMACS, no PLUMED).

    python examples/raw_md_workflow.py /tmp/raw_demo
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.synthetic_workflow import build_system  # noqa: E402


def solvate_and_break(workdir, trj_fn, ref_fn, box_l=4.0, n_waters=40):
    """Embed the solute in a water box, give it a random COM drift, and
    wrap everything into the primary cell — producing the broken raw
    trajectory a simulation engine would hand you."""
    from spinrelax_tpu.io import native
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.io.trajectory import load_trajectory

    rng = np.random.default_rng(7)
    box = np.array([box_l] * 3, dtype=np.float32)
    xyz, dt = load_trajectory(trj_fn)
    n_frames, n_solute = xyz.shape[:2]
    top, _ = pdbio.read_pdb(ref_fn)

    # Waters jiggling around fixed sites.
    sites = rng.uniform(0, box_l, (n_waters, 3)).astype(np.float32)
    wat = np.empty((n_frames, n_waters * 3, 3), dtype=np.float32)
    for k, o in enumerate(sites):
        jig = 0.02 * rng.normal(size=(n_frames, 1, 3)).astype(np.float32)
        geom = np.array([[0, 0, 0], [0.08, 0.02, 0], [0, 0.08, 0.02]],
                        dtype=np.float32)
        wat[:, 3 * k : 3 * k + 3] = o + geom + jig

    # Random-walk COM drift sends the solute across several images.
    drift = np.cumsum(
        rng.normal(scale=0.05, size=(n_frames, 1, 3)), axis=0
    ).astype(np.float32)
    raw = np.concatenate([xyz + drift + box_l / 2, wat], axis=1)
    raw = np.mod(raw, box)  # wrap: molecules split across boundaries

    sys_top = pdbio.Topology(
        atom_names=list(top.atom_names) + [n for _ in range(n_waters)
                                           for n in ("OW", "HW1", "HW2")],
        res_seqs=np.concatenate(
            [top.res_seqs,
             np.repeat(np.arange(1000, 1000 + n_waters), 3)]
        ),
        res_names=list(top.res_names) + ["SOL"] * (3 * n_waters),
        chain_ids=list(top.chain_ids) + ["W"] * (3 * n_waters),
        occupancies=np.concatenate(
            [top.occupancies, np.zeros(3 * n_waters)]
        ),
        elements=list(top.elements) + ["O", "H", "H"] * n_waters,
    )
    sys_pdb = os.path.join(workdir, "system.pdb")
    pdbio.write_pdb(sys_pdb, sys_top, raw[:1])
    raw_xtc = os.path.join(workdir, "raw.xtc")
    boxes33 = np.zeros((n_frames, 3, 3), dtype=np.float32)
    boxes33[:, [0, 1, 2], [0, 1, 2]] = box
    native.write_xtc(raw_xtc, raw,
                     times=np.arange(n_frames, dtype=np.float32) * dt,
                     boxes=boxes33)
    return raw_xtc, sys_pdb


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spinrelax_raw_demo"
    os.makedirs(workdir, exist_ok=True)
    print(f"= = Building raw solvated system in {workdir} ...")
    ref_fn, trj_fn = build_system(workdir)
    raw_xtc, sys_pdb = solvate_and_break(workdir, trj_fn, ref_fn)

    from spinrelax_tpu.pipeline.cli import main as cli
    from spinrelax_tpu.pipeline.runall import main as runall

    os.chdir(workdir)
    print("= = Stage 0: native PBC repair (center-solute equivalent) ...")
    cli(["center", "-f", raw_xtc, "-s", sys_pdb,
         "-o", "solute_centered.npz", "--output-group", "solute"])

    print("= = Stages 1-4: run-all on the repaired solute ...")
    runall([
        "-out", "rawdif",
        "-sxtc", os.path.join(workdir, "solute_centered.npz"),
        "-refpdb", ref_fn,
        "-t_mem", "1000",
        "-Bfields", "600.133",
    ])
    print("\n= = Artefacts:")
    for f in sorted(os.listdir(workdir)):
        print("   ", f)


if __name__ == "__main__":
    main()
