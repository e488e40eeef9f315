"""End-to-end workflow orchestrator (run-all.bash equivalent).

Drives: orientation quaternions -> global rotational diffusion (+ PAF)
-> local C(t)/S2/vector distributions -> multi-exponential fits ->
relaxation predictions per field -> optional multi-field optimisation.

Stage resume follows the reference's output-file-existence convention;
``--force`` reruns everything (run-all.bash:139,185).  The temperature /
viscosity / D2O correction of D_iso reproduces run-all.bash:15-28.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..constants import DEFAULT_ZETA
from ..models import Diffusion
from .corrections import convert_diso
from .manifest import record_stage, stage_is_current
from . import stages


def _exists(*paths):
    return all(os.path.exists(p) for p in paths)


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="spinrelax run-all",
        description="Full MD-to-spin-relaxation workflow.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-out", "--outpref", dest="opref", default="rotdif")
    p.add_argument("-folders", default=None, help="file listing replica folders")
    p.add_argument("-sxtc", default="solute.npz", help="solute trajectory per folder (npz/pdb/xtc)")
    p.add_argument("-refpdb", default="reference.pdb")
    p.add_argument("-qfile", default="colvar-qorient")
    p.add_argument("-t_mem", dest="tau_mem", type=float, default=10000.0, help="memory time [ps]")
    p.add_argument("-Temp_MD", type=float, default=300.0)
    p.add_argument("-Temp_Exp", type=float, default=297.0)
    p.add_argument("-D2O_Exp", type=float, default=0.09)
    p.add_argument("-Bfields", nargs="+", type=float, default=[600.133], help="[MHz]")
    p.add_argument("-num_chunks", type=int, default=4)
    p.add_argument("-stream", type=int, default=0, metavar="GROUPS",
                   help="constant-memory C(t) stage: stream trajectories "
                        "in GROUPS Palmer chunks per device step "
                        "(supports all -vecstorage modes)")
    p.add_argument("-vecstorage", default="Histogram",
                   choices=("Histogram", "PhiTheta", "TextPhiTheta"))
    p.add_argument("-fitatoms", default="occupancy > 0")
    p.add_argument("-zeta", type=float, default=DEFAULT_ZETA)
    p.add_argument("-csafile", default=None)
    p.add_argument("-fit", nargs="+", default=None,
                   help="optimisation modes, e.g. Diso Diso,rsCSA")
    p.add_argument("-expfiles", nargs="+", default=None)
    p.add_argument("-D_ext", nargs="+", type=float, default=None,
                   help="external Diso [aniso [rhomb]] in ps^-1")
    p.add_argument("-tau_ext", type=float, default=None, help="external tau_iso [ps]")
    p.add_argument("-q_ext", nargs=4, type=float, default=None)
    p.add_argument("-Jw", action="store_true")
    p.add_argument("-bForce", "--force", dest="force", action="store_true")
    a = p.parse_args(argv)

    if a.fit and not a.expfiles:
        sys.exit("= = ERROR: -fit selected, but no experimental file has been given!")

    tau_ns = a.tau_mem / 1000.0
    outpref = f"{a.opref}-{tau_ns:g}ns"
    t100 = a.tau_mem / 100.0

    folders = ["."]
    if a.folders:
        with open(a.folders) as fp:
            folders = [l.strip() for l in fp if l.strip()]
    multi = len(folders) > 1

    d_fact = convert_diso(1.0, a.Temp_MD, a.Temp_Exp, a.D2O_Exp)
    print(
        "= = Diso conversion factor (T/viscosity/D2O): %g" % d_fact
    )

    # ------------------------------------------------------------------
    print("= Step 1: Orientation quaternions (colvar-qorient)...")
    qfiles = []
    for path in folders:
        qfile_loc = os.path.join(path, a.qfile)
        sxtc_loc = os.path.join(path, a.sxtc)
        ref_loc = a.refpdb if os.path.isabs(a.refpdb) else os.path.join(path, a.refpdb)
        if not os.path.exists(ref_loc) and os.path.exists(a.refpdb):
            ref_loc = a.refpdb
        if a.force or not stage_is_current(
            outpref, f"orient:{path}", [sxtc_loc, ref_loc], [qfile_loc],
            params=dict(fitsel=a.fitatoms),
        ):
            stages.stage_orientation(
                [sxtc_loc], ref_loc, qfile_loc, fit_sel=a.fitatoms, force=True
            )
            record_stage(outpref, f"orient:{path}", [sxtc_loc, ref_loc],
                         params=dict(fitsel=a.fitatoms))
        else:
            print(" = = = Note: Pre-existing quaternion file found, skipping.")
        qfiles.append(qfile_loc)
    if multi:
        qfile_agg = a.qfile + "-aggregate"
        with open(qfile_agg, "w") as out:
            for qf in qfiles:
                with open(qf) as src:
                    out.write(src.read())
    else:
        qfile_agg = qfiles[0]

    # ------------------------------------------------------------------
    print("= Step 2: Global rotational diffusion...")
    use_ext = (
        a.q_ext is not None and a.D_ext is not None and len(a.D_ext) >= 2
    )
    if use_ext:
        quat = np.array(a.q_ext)
        diso, dani = a.D_ext[0], a.D_ext[1]
    else:
        dq_params = dict(t100=t100, tau=a.tau_mem, chunks=a.num_chunks, multi=multi)
        if a.force or not stage_is_current(
            outpref, "dq", [qfile_agg],
            [outpref + "-aniso_q.dat", outpref + "-aniso2.dat"], params=dq_params,
        ):
            res = stages.stage_dq(
                qfile_agg, outpref, min_dt=t100, max_dt=a.tau_mem, skip_dt=t100,
                n_chunks=a.num_chunks, multi=multi, force=a.force,
            )
            record_stage(outpref, "dq", [qfile_agg], params=dq_params)
        else:
            print(" = = = Note: Pre-existing rotdif data found, skipping.")
            res = None
        # Extract from artefacts (so resume works identically).
        with open(outpref + "-aniso_q.dat") as fp:
            quat = np.array([float(x) for x in fp.readline().split()[1:5]])
        hdr = {}
        with open(outpref + "-aniso2.dat") as fp:
            for line in fp:
                if not line.startswith("#"):
                    break
                parts = line.split()
                if "Diso" in line:
                    hdr["Diso"] = float(parts[4]) * 1e-12 * d_fact
                for key in ("Dani_L", "Drho_L", "Dani_S", "Drho_S"):
                    if key in line:
                        hdr[key] = float(parts[4])
        if a.tau_ext is not None:
            diso = 1.0 / (6.0 * a.tau_ext)
        elif a.D_ext:
            diso = a.D_ext[0]
        else:
            diso = hdr["Diso"]
        # Prolate/oblate unique-axis rule (run-all.bash:404-435).
        if hdr["Drho_L"] < 1.0:
            print("= = = Long axis ellipsoid detected, pointing along Dz.")
            dani = hdr["Dani_L"]
        elif hdr["Drho_S"] < 1.0:
            print("= = = Short axis ellipsoid detected, pointing along Dx.")
            dani = hdr["Dani_S"]
        else:
            sys.exit("= = = ERROR: neither Drho value is below one.")
        if a.D_ext and len(a.D_ext) >= 2:
            dani = a.D_ext[1]
        if a.q_ext is not None:
            quat = np.array(a.q_ext)
    print(f"= = Global Diffusion used: Diso={diso:g} ps^-1, Daniso={dani:g}")
    print(f"= = PAF quaternion used: {quat}")

    # ------------------------------------------------------------------
    print("= Step 3: Local motion (C(t), S2, vector distributions)...")
    vec_files = {
        "Histogram": outpref + "_vecHistogram.npz",
        "PhiTheta": outpref + "_vecPhiTheta.npz",
        "TextPhiTheta": outpref + "_vecPhiTheta.dat",
    }
    vec_file = vec_files[a.vecstorage]
    trajs = [os.path.join(path, a.sxtc) for path in folders]
    refs = []
    for path in folders:
        rl = a.refpdb if os.path.isabs(a.refpdb) else os.path.join(path, a.refpdb)
        if not os.path.exists(rl) and os.path.exists(a.refpdb):
            rl = a.refpdb
        refs.append(rl)
    ct_params = dict(tau=a.tau_mem, quat=[float(x) for x in quat],
                     storage=a.vecstorage, zeta=a.zeta)
    if a.force or not stage_is_current(
        outpref, "ct", trajs + refs, [vec_file, outpref + "_Ctint.dat"],
        params=ct_params,
    ):
        if a.stream > 0:
            stages.stage_ct_streamed(
                trajs, refs, outpref, a.tau_mem,
                chunk_groups=a.stream, q_rot=quat, fit_sel=a.fitatoms,
                zeta=a.zeta, vec_storage=a.vecstorage,
            )
        else:
            stages.stage_ct(
                trajs, refs, outpref, a.tau_mem,
                q_rot=quat, fit_sel=a.fitatoms, zeta=a.zeta,
                vec_storage=a.vecstorage, force=a.force,
            )
        record_stage(outpref, "ct", trajs + refs, params=ct_params)
    else:
        print(" = = = Note: Pre-existing C(t)/vector files found, skipping.")

    if a.force or not stage_is_current(
        outpref, "fit-ct", [outpref + "_Ctint.dat"], [outpref + "_fittedCt.dat"]
    ):
        stages.stage_fit_ct([outpref + "_Ctint.dat"], outpref)
        record_stage(outpref, "fit-ct", [outpref + "_Ctint.dat"])
    else:
        print(" = = = Note: Pre-existing fitted-Ct file found, skipping.")

    if not _exists(outpref + "_fittedCt.pdf") or a.force:
        try:
            from .plotting import main as plot_main

            plot_main(["-f", outpref + "_fittedCt.dat", "-o", outpref + "_fittedCt.pdf"])
        except Exception as exc:  # plotting is cosmetic; never fatal
            print(f"= = = NOTE: plotting skipped ({exc})")

    # ------------------------------------------------------------------
    print(f"= Step 4: Relaxations for B fields {a.Bfields} ...")
    diffusion = Diffusion.axisymmetric(diso=diso, aniso=dani)
    from .cli import _parse_csa
    from ..io import fittedct as fctio

    names = fctio.read_fittedct(outpref + "_fittedCt.dat").names
    csa = _parse_csa(a.csafile, names)
    for bf in a.Bfields:
        of = f"{outpref}-{int(bf)}"
        relax_params = dict(bf=bf, diso=float(diso), dani=float(dani), zeta=a.zeta)
        if a.force or not stage_is_current(
            outpref, f"relax:{bf}",
            [outpref + "_fittedCt.dat", vec_file],
            [of + "_R1.dat", of + "_R2.dat"],
            params=relax_params,
        ):
            stages.stage_relax(
                outpref + "_fittedCt.dat", of, diffusion,
                vec_file=vec_file, freq_mhz=bf, zeta=a.zeta, csa=csa,
            )
            record_stage(outpref, f"relax:{bf}",
                         [outpref + "_fittedCt.dat", vec_file], params=relax_params)
        else:
            print(f" = = = Note: relaxations at {bf} already done. Skipping.")
        if a.Jw and (not _exists(of + "_Jw.dat") or a.force):
            stages.stage_relax(
                outpref + "_fittedCt.dat", of, diffusion,
                vec_file=vec_file, freq_mhz=bf, zeta=a.zeta, jomega=True,
            )

    if a.fit:
        for mode in a.fit:
            opt = mode.split(",")
            stages.stage_multifield(
                outpref + "_fittedCt.dat", a.expfiles,
                f"{outpref}-opt{mode.replace(',', '_')}",
                diffusion, vec_file=vec_file, zeta=a.zeta, csa=csa,
                opt_params=opt, include_expt=True,
            )
    print("= = run-all complete.")


if __name__ == "__main__":
    main()
