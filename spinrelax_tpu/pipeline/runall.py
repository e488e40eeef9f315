"""End-to-end workflow orchestrator (run-all.bash equivalent).

Drives: orientation quaternions -> global rotational diffusion (+ PAF)
-> local C(t)/S2/vector distributions -> multi-exponential fits ->
relaxation predictions per field -> optional multi-field optimisation.

Stage resume follows the reference's output-file-existence convention;
``--force`` reruns everything (run-all.bash:139,185).  The temperature /
viscosity / D2O correction of D_iso reproduces run-all.bash:15-28.

Configuration is the typed :class:`~spinrelax_tpu.pipeline.config.WorkflowConfig`
(single source of truth for flags AND defaults, SURVEY §5);
:func:`run_workflow` is the importable library entry point and
:func:`main` is its thin argparse shim.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

from ..models import Diffusion
from .config import WorkflowConfig, add_workflow_args, config_from_namespace
from .corrections import convert_diso
from .manifest import record_stage, stage_is_current
from . import stages


def _exists(*paths):
    return all(os.path.exists(p) for p in paths)


def _resolve_ref(path: str, refpdb: str) -> str:
    """Per-folder reference PDB resolution: absolute paths win, then the
    folder-local copy, then a top-level fallback (run-all.bash keeps one
    refpdb per replica folder)."""
    rl = refpdb if os.path.isabs(refpdb) else os.path.join(path, refpdb)
    if not os.path.exists(rl) and os.path.exists(refpdb):
        rl = refpdb
    return rl


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="spinrelax run-all",
        description="Full MD-to-spin-relaxation workflow.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_workflow_args(p)
    ns = p.parse_args(argv)
    try:
        cfg = config_from_namespace(ns)
    except ValueError as exc:
        sys.exit(f"= = ERROR: {exc}!")
    run_workflow(cfg)


def run_workflow(cfg: WorkflowConfig):
    """Run the full workflow from a typed config (no CLI involved)."""
    cfg.validate()
    io, tum, phy, exp = cfg.io, cfg.tumbling, cfg.physics, cfg.experiments

    tau_ns = tum.tau_mem / 1000.0
    outpref = f"{io.outpref}-{tau_ns:g}ns"
    t100 = tum.tau_mem / 100.0

    folders = ["."]
    if io.folders_file:
        with open(io.folders_file) as fp:
            folders = [l.strip() for l in fp if l.strip()]
    multi = len(folders) > 1

    d_fact = convert_diso(1.0, phy.temp_md, phy.temp_exp, phy.d2o_exp)
    print(
        "= = Diso conversion factor (T/viscosity/D2O): %g" % d_fact
    )

    # ------------------------------------------------------------------
    print("= Step 1: Orientation quaternions (colvar-qorient)...")
    qfiles = []
    for path in folders:
        qfile_loc = os.path.join(path, io.qfile)
        sxtc_loc = os.path.join(path, io.traj)
        ref_loc = _resolve_ref(path, io.refpdb)
        if cfg.force or not stage_is_current(
            outpref, f"orient:{path}", [sxtc_loc, ref_loc], [qfile_loc],
            params=dict(fitsel=phy.fit_atoms),
        ):
            stages.stage_orientation(
                [sxtc_loc], ref_loc, qfile_loc, fit_sel=phy.fit_atoms, force=True
            )
            record_stage(outpref, f"orient:{path}", [sxtc_loc, ref_loc],
                         params=dict(fitsel=phy.fit_atoms))
        else:
            print(" = = = Note: Pre-existing quaternion file found, skipping.")
        qfiles.append(qfile_loc)
    if multi:
        qfile_agg = io.qfile + "-aggregate"
        with open(qfile_agg, "w") as out:
            for qf in qfiles:
                with open(qf) as src:
                    # constant-memory concatenation: per-replica colvars
                    # can be multi-GB and this aggregate is rebuilt on
                    # every invocation
                    shutil.copyfileobj(src, out)
    else:
        qfile_agg = qfiles[0]

    # ------------------------------------------------------------------
    print("= Step 2: Global rotational diffusion...")
    use_ext = (
        tum.q_ext is not None and tum.d_ext is not None and len(tum.d_ext) >= 2
    )
    if use_ext:
        quat = np.array(tum.q_ext)
        # Same precedence as the non-q_ext branch (and the reference,
        # where -tau_ext and -D_ext write the SAME Diso_ext variable,
        # run-all.bash:206-216): an explicit -tau_ext wins over D_ext[0].
        diso = (
            1.0 / (6.0 * tum.tau_ext) if tum.tau_ext is not None
            else tum.d_ext[0]
        )
        dani = tum.d_ext[1]
    else:
        dq_params = dict(t100=t100, tau=tum.tau_mem, chunks=tum.num_chunks, multi=multi)
        if cfg.force or not stage_is_current(
            outpref, "dq", [qfile_agg],
            [outpref + "-aniso_q.dat", outpref + "-aniso2.dat"], params=dq_params,
        ):
            stages.stage_dq(
                qfile_agg, outpref, min_dt=t100, max_dt=tum.tau_mem, skip_dt=t100,
                n_chunks=tum.num_chunks, multi=multi, force=cfg.force,
            )
            record_stage(outpref, "dq", [qfile_agg], params=dq_params)
        else:
            print(" = = = Note: Pre-existing rotdif data found, skipping.")
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
        if tum.tau_ext is not None:
            diso = 1.0 / (6.0 * tum.tau_ext)
        elif tum.d_ext:
            diso = tum.d_ext[0]
        else:
            diso = hdr["Diso"]
        # Prolate/oblate unique-axis rule (run-all.bash:404-435) — the
        # reference skips it entirely when both external D values are
        # given (run-all.bash:409 runs the check only in the else branch
        # of the -D_ext override), so a degenerate simulated tensor must
        # not abort a run that supplies its own Diso/Daniso.
        have_ext_d = bool(tum.d_ext) and len(tum.d_ext) >= 2
        if have_ext_d:
            # Skip the detection entirely (not just its result): the
            # reference never reads Drho_* here, so a legacy/foreign
            # aniso2.dat lacking those header keys must not KeyError,
            # and no misleading axis-detection line is printed for a
            # tensor that is immediately overridden.
            dani = tum.d_ext[1]
        elif hdr["Drho_L"] < 1.0:
            print("= = = Long axis ellipsoid detected, pointing along Dz.")
            dani = hdr["Dani_L"]
        elif hdr["Drho_S"] < 1.0:
            print("= = = Short axis ellipsoid detected, pointing along Dx.")
            dani = hdr["Dani_S"]
        else:
            sys.exit("= = = ERROR: neither Drho value is below one.")
        if tum.q_ext is not None:
            quat = np.array(tum.q_ext)
    print(f"= = Global Diffusion used: Diso={diso:g} ps^-1, Daniso={dani:g}")
    print(f"= = PAF quaternion used: {quat}")

    # ------------------------------------------------------------------
    print("= Step 3: Local motion (C(t), S2, vector distributions)...")
    vec_files = {
        "Histogram": outpref + "_vecHistogram.npz",
        "PhiTheta": outpref + "_vecPhiTheta.npz",
        "TextPhiTheta": outpref + "_vecPhiTheta.dat",
    }
    vec_file = vec_files[io.vec_storage]
    trajs = [os.path.join(path, io.traj) for path in folders]
    refs = [_resolve_ref(path, io.refpdb) for path in folders]
    ct_params = dict(tau=tum.tau_mem, quat=[float(x) for x in quat],
                     storage=io.vec_storage, zeta=phy.zeta,
                     fit_atoms=phy.fit_atoms)
    if cfg.force or not stage_is_current(
        outpref, "ct", trajs + refs, [vec_file, outpref + "_Ctint.dat"],
        params=ct_params,
    ):
        if io.stream_groups > 0:
            mesh = None
            if io.devices > 0:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh(io.devices)
            stages.stage_ct_streamed(
                trajs, refs, outpref, tum.tau_mem,
                chunk_groups=io.stream_groups, q_rot=quat, fit_sel=phy.fit_atoms,
                zeta=phy.zeta, vec_storage=io.vec_storage, mesh=mesh,
            )
        else:
            stages.stage_ct(
                trajs, refs, outpref, tum.tau_mem,
                q_rot=quat, fit_sel=phy.fit_atoms, zeta=phy.zeta,
                vec_storage=io.vec_storage, force=cfg.force,
            )
        record_stage(outpref, "ct", trajs + refs, params=ct_params)
    else:
        print(" = = = Note: Pre-existing C(t)/vector files found, skipping.")

    if cfg.force or not stage_is_current(
        outpref, "fit-ct", [outpref + "_Ctint.dat"], [outpref + "_fittedCt.dat"]
    ):
        fit_mesh = None
        if io.devices > 0:
            from ..parallel.mesh import make_mesh

            fit_mesh = make_mesh(io.devices)
        stages.stage_fit_ct([outpref + "_Ctint.dat"], outpref,
                            mesh=fit_mesh)
        record_stage(outpref, "fit-ct", [outpref + "_Ctint.dat"])
    else:
        print(" = = = Note: Pre-existing fitted-Ct file found, skipping.")

    if not _exists(outpref + "_fittedCt.pdf") or cfg.force:
        try:
            from .plotting import main as plot_main

            plot_main(["-f", outpref + "_fittedCt.dat", "-o", outpref + "_fittedCt.pdf"])
        except Exception as exc:  # plotting is cosmetic; never fatal
            print(f"= = = NOTE: plotting skipped ({exc})")

    # ------------------------------------------------------------------
    print(f"= Step 4: Relaxations for B fields {list(exp.bfields_mhz)} ...")
    diffusion = Diffusion.axisymmetric(diso=diso, aniso=dani)
    from .cli import _parse_csa
    from ..io import fittedct as fctio

    names = fctio.read_fittedct(outpref + "_fittedCt.dat").names
    csa = _parse_csa(phy.csa_file, names)
    for bf in exp.bfields_mhz:
        of = f"{outpref}-{int(bf)}"
        # csa_file is listed as an INPUT so edited CSA contents invalidate
        # the stage through the content-hash manifest (its path also sits
        # in params for the removed-flag case).
        relax_params = dict(bf=bf, diso=float(diso), dani=float(dani),
                            zeta=phy.zeta, csa_file=phy.csa_file)
        relax_inputs = [outpref + "_fittedCt.dat", vec_file]
        if phy.csa_file:
            relax_inputs.append(phy.csa_file)
        if cfg.force or not stage_is_current(
            outpref, f"relax:{bf}", relax_inputs,
            # ALL four artefacts: resume must not skip a run interrupted
            # between the R2 and NOE writes (NOE/rho would then never be
            # produced — existence semantics check every listed output).
            [of + "_R1.dat", of + "_R2.dat", of + "_NOE.dat",
             of + "_rho.dat"],
            params=relax_params,
        ):
            stages.stage_relax(
                outpref + "_fittedCt.dat", of, diffusion,
                vec_file=vec_file, freq_mhz=bf, zeta=phy.zeta, csa=csa,
            )
            record_stage(outpref, f"relax:{bf}", relax_inputs,
                         params=relax_params)
        else:
            print(f" = = = Note: relaxations at {bf} already done. Skipping.")
        if exp.do_jomega and (not _exists(of + "_Jw.dat") or cfg.force):
            stages.stage_relax(
                outpref + "_fittedCt.dat", of, diffusion,
                vec_file=vec_file, freq_mhz=bf, zeta=phy.zeta, jomega=True,
            )

    if exp.fit_modes:
        for mode in exp.fit_modes:
            opt = mode.split(",")
            stages.stage_multifield(
                outpref + "_fittedCt.dat", list(exp.exp_files),
                f"{outpref}-opt{mode.replace(',', '_')}",
                diffusion, vec_file=vec_file, zeta=phy.zeta, csa=csa,
                opt_params=opt, include_expt=True, devices=io.devices,
            )
    print("= = run-all complete.")


if __name__ == "__main__":
    main()
