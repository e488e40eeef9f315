"""Worked example: the non-GROMACS ingest paths, end-to-end.

The reference workflow assumes a GROMACS toolchain; this demo runs the
SAME physics pipeline from CHARMM/NAMD-style and Amber-style raw data,
all with native readers — no mdtraj, no external tools:

    CHARMM:  raw.dcd + system.psf    --center--> solute --run-all--> R1/R2/NOE
    Amber :  raw.nc  + system.prmtop --convert/center--> same chain

Exercises along the way: exact bond-graph molecule decomposition from
the PSF/prmtop bond tables (no --mol-breaks), `spinrelax info`, and
`spinrelax convert` between the trajectory families.

    python examples/charmm_amber_workflow.py /tmp/charmm_demo
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.raw_md_workflow import solvate_and_break  # noqa: E402
from examples.synthetic_workflow import build_system  # noqa: E402


def write_psf(fn, top, bonds):
    """Minimal standard-format PSF for the demo system."""
    with open(fn, "w") as fp:
        print("PSF\n", file=fp)
        print("%8d !NTITLE" % 1, file=fp)
        print(" REMARKS spinrelax_tpu demo\n", file=fp)
        print("%8d !NATOM" % top.n_atoms, file=fp)
        for i in range(top.n_atoms):
            seg = top.chain_ids[i] or "A"
            mass = {"H": 1.008, "O": 15.9994, "N": 14.007}.get(
                top.elements[i], 12.011
            )
            print(
                "%8d %-4s %-4d %-4s %-4s %-4s % 10.6f %13.4f %11d"
                % (i + 1, seg, top.res_seqs[i], top.res_names[i][:4],
                   top.atom_names[i][:4], top.atom_names[i][:4],
                   0.0, mass, 0),
                file=fp,
            )
        print("", file=fp)
        print("%8d !NBOND: bonds" % len(bonds), file=fp)
        flat = [x + 1 for b in bonds for x in b]
        for off in range(0, len(flat), 8):
            print("".join("%8d" % v for v in flat[off : off + 8]), file=fp)


def demo_bonds(top):
    """Chain the solute residues' atoms; each water is its own triangle."""
    bonds = []
    res = np.asarray(top.res_seqs)
    names = top.res_names
    i = 0
    while i < top.n_atoms:
        j = i
        while j + 1 < top.n_atoms and res[j + 1] == res[i] \
                and names[j + 1] == names[i]:
            j += 1
        if names[i] == "SOL":
            bonds += [(i, i + 1), (i, i + 2)]
        else:
            bonds += [(k, k + 1) for k in range(i, j)]
            if j + 1 < top.n_atoms and names[j + 1] not in ("SOL",):
                bonds.append((j, j + 1))  # peptide-style link
        i = j + 1
    return bonds


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spinrelax_charmm_demo"
    os.makedirs(workdir, exist_ok=True)
    print(f"= = Building raw solvated system in {workdir} ...")
    ref_fn, trj_fn = build_system(workdir)
    raw_xtc, sys_pdb = solvate_and_break(workdir, trj_fn, ref_fn)

    from spinrelax_tpu.io import native
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.io import dcd as dcdio
    from spinrelax_tpu.pipeline.cli import main as cli
    from spinrelax_tpu.pipeline.runall import main as runall

    os.chdir(workdir)
    top, _ = pdbio.read_pdb(sys_pdb)

    # --- make the CHARMM-style inputs: raw.dcd + system.psf
    xyz, boxes, times = native.read_xtc(raw_xtc)
    dcdio.write_dcd("raw.dcd", xyz, boxes=boxes,
                    timestep_ps=float(times[1] - times[0]))
    write_psf("system.psf", top, demo_bonds(top))
    cli(["info", "raw.dcd"])

    print("= = CHARMM chain: dcd + psf -> center (exact bond molecules) ...")
    cli(["center", "-f", "raw.dcd", "-s", "system.psf",
         "-o", "solute_dcd.npz", "--output-group", "solute"])

    print("= = Amber chain: convert dcd -> nc, then center ...")
    cli(["convert", "-f", "raw.dcd", "-o", "raw.nc"])
    cli(["center", "-f", "raw.nc", "-s", "system.psf",
         "-o", "solute_nc.npz", "--output-group", "solute"])
    a = np.load("solute_dcd.npz")["xyz"]
    b = np.load("solute_nc.npz")["xyz"]
    np.testing.assert_allclose(b, a, atol=1e-5)
    print("= = center(dcd) == center(nc) to 1e-5 — format chain consistent.")

    print("= = Stages 1-4: run-all on the repaired solute ...")
    runall([
        "-out", "charmmdif",
        "-sxtc", os.path.join(workdir, "solute_dcd.npz"),
        "-refpdb", ref_fn,
        "-t_mem", "1000",
        "-Bfields", "600.133",
    ])
    print("\n= = Artefacts:")
    for f in sorted(os.listdir(workdir)):
        print("   ", f)


if __name__ == "__main__":
    main()
