"""File-fed end-to-end benchmark: .xtc on disk -> R1/R2/NOE artefacts.

``bench_northstar.py`` measures the COMPUTE path with device-generated
input (BASELINE.md's metric definition).  This tool measures the SHIPPED
file-fed production path instead — what `spinrelax ct --split` /
`run-all -stream` actually run (pipeline.stages.stage_ct_streamed):

  native XTC decode on the host (io/native.iter_xtc)
    -> bond-vector extraction + Kabsch superposition on device
    -> ONE fused streamed dispatch per chunk group
       (C(t) ext+int, S2 blocks, average vector, Lambert histograms)
    -> DoF-ladder fit (stage_fit_ct) -> R1/R2/NOE (stage_relax)

Decode of group N+1 overlaps device compute of group N for free (the
fused update is dispatched async), so file-fed wall time ~= max(decode,
compute) + fit/relax tails (docs/PERF.md "Host ingest").

Setup writes a synthetic tumbling trajectory once (rigid body random
walk with per-residue NH wobble, fully vectorised) and is NOT part of
the timed section; its cost is reported separately.  A decode-only pass
over the same file is timed for attribution.

Presets:
  --preset ubiquitin   71 NH bonds in a 1231-atom solute x 100k frames
                       (the reference's own scale, README.md:155)
  --preset northstar   10^4 NH bonds (30k-atom solute) x 20k frames
                       (file-fed slice of the BASELINE north star)

Usage: python tools/bench_file_e2e.py [--preset ubiquitin] [--workdir D]
"""

import argparse
import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _qmult_np(a, b):
    """Batched Hamilton product, numpy, (...,4)x(...,4)."""
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def _qcumprod(dq):
    """Inclusive left-to-right cumulative quaternion product, O(F log F).

    Hillis-Steele scan: associativity of the Hamilton product makes the
    doubling combine exact for the non-commutative case as long as the
    earlier block stays the LEFT factor.  Renormalised per pass."""
    q = dq.copy()
    step = 1
    n = len(q)
    while step < n:
        prod = _qmult_np(q[:-step], q[step:])
        q[step:] = prod
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        step *= 2
    return q


def _quat_to_mat(q):
    """(F, 4) unit quats -> (F, 3, 3) rotation matrices."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    m = np.empty((len(q), 3, 3), dtype=q.dtype)
    m[:, 0, 0] = 1 - 2 * (y * y + z * z)
    m[:, 0, 1] = 2 * (x * y - z * w)
    m[:, 0, 2] = 2 * (x * z + y * w)
    m[:, 1, 0] = 2 * (x * y + z * w)
    m[:, 1, 1] = 1 - 2 * (x * x + z * z)
    m[:, 1, 2] = 2 * (y * z - x * w)
    m[:, 2, 0] = 2 * (x * z - y * w)
    m[:, 2, 1] = 2 * (y * z + x * w)
    m[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def build_trajectory(workdir, n_res, n_pad_atoms, n_frames, dt=1.0,
                     d_iso=3.3e-5, wobble=0.25, tau_int=30.0, seed=11,
                     gen_chunk=1000):
    """Write reference.pdb + traj.xtc; returns (ref_pdb, xtc, setup_info).

    Rigid solute (N/H/CA per residue + n_pad_atoms rigid filler carbons)
    under an isotropic rotational random walk with an AR(1) NH wobble —
    all vectorised (quaternion scan + chunked einsum), so building 10^9+
    coordinates stays minutes-scale on one core."""
    from scipy.signal import lfilter

    from spinrelax_tpu.io import native
    from spinrelax_tpu.io import pdb as pdbio

    rng = np.random.default_rng(seed)
    t_setup = time.time()

    # --- topology: N, H, CA per residue, then rigid filler atoms.
    n_atoms = 3 * n_res + n_pad_atoms
    base = np.empty((n_atoms, 3), dtype=np.float64)
    # residue centres + filler on a self-avoiding-ish random ball
    cen = rng.normal(size=(n_res, 3))
    cen *= (1.5 * rng.uniform(0.3, 1.0, (n_res, 1)) ** (1 / 3)
            / np.linalg.norm(cen, axis=1, keepdims=True))
    nh0 = rng.normal(size=(n_res, 3))
    nh0 /= np.linalg.norm(nh0, axis=1, keepdims=True)
    base[0::3][:n_res] = cen
    base[1::3][:n_res] = cen + 0.102 * nh0
    base[2::3][:n_res] = cen + np.array([0.05, -0.03, 0.08])
    if n_pad_atoms:
        fill = rng.normal(size=(n_pad_atoms, 3))
        fill *= (1.5 * rng.uniform(0.1, 1.0, (n_pad_atoms, 1)) ** (1 / 3)
                 / np.linalg.norm(fill, axis=1, keepdims=True))
        base[3 * n_res:] = fill

    names = ["N", "H", "CA"] * n_res + ["C"] * n_pad_atoms
    # PDB's %4d resSeq field caps at 9999 (write_pdb rejects overflow
    # loudly): number residues 2..9999 within a chain and advance the
    # chain id per 9998-residue block — bond pairing downstream is
    # (chain, resSeq)-keyed (io/pdb.bond_indices), so duplicate resSeq
    # values across chains stay unambiguous.
    pool = (string.ascii_uppercase + string.ascii_lowercase
            + string.digits)
    total_res = n_res + n_pad_atoms
    if total_res > 9998 * len(pool):
        raise ValueError(f"{total_res} residues exceed single-char chains")
    gres = np.arange(total_res)
    atoms_per_res = np.concatenate(
        [np.full(n_res, 3, dtype=int), np.ones(n_pad_atoms, dtype=int)]
    )
    res_seqs = np.repeat(2 + (gres % 9998), atoms_per_res)
    chain_ids = list(np.repeat(np.array(list(pool))[gres // 9998],
                               atoms_per_res))
    res_names = ["ALA"] * (3 * n_res) + ["ALA"] * n_pad_atoms
    occs = np.tile([0.0, 0.0, 1.0], n_res)
    occs = np.concatenate([occs, np.ones(n_pad_atoms)])
    elements = ["N", "H", "C"] * n_res + ["C"] * n_pad_atoms
    top = pdbio.Topology(names, res_seqs, res_names, chain_ids,
                         occs, elements)
    ref_pdb = os.path.join(workdir, "reference.pdb")
    pdbio.write_pdb(ref_pdb, top, base)

    # --- global tumbling: random-walk quaternions, one O(F log F) scan.
    sig = np.sqrt(2.0 * d_iso * dt)
    w = rng.normal(scale=sig, size=(n_frames, 3))
    th = np.linalg.norm(w, axis=1, keepdims=True)
    th = np.where(th == 0, 1e-12, th)
    dq = np.concatenate(
        [np.cos(th / 2), np.sin(th / 2) * w / th], axis=1
    )
    q = _qcumprod(dq)
    rot = _quat_to_mat(q).astype(np.float32)  # (F, 3, 3)

    # --- AR(1) wobble angle per residue (exact OU discretisation).
    a = np.exp(-dt / tau_int)
    noise = rng.normal(
        scale=wobble * np.sqrt(1 - a * a), size=(n_frames, n_res)
    ).astype(np.float32)
    noise[0] = wobble * rng.normal(size=n_res)
    phi = lfilter([1.0], [1.0, -a], noise, axis=0).astype(np.float32)

    e1 = np.cross(nh0, [0.0, 0.0, 1.0])
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(nh0, e1)
    cw, sw = np.cos(wobble), np.sin(wobble)

    xtc = os.path.join(workdir, "traj.xtc")
    if os.path.exists(xtc):
        os.remove(xtc)
    base32 = base.astype(np.float32)
    nh032, e132, e232 = (x.astype(np.float32) for x in (nh0, e1, e2))
    n_idx = np.arange(0, 3 * n_res, 3)
    h_idx = n_idx + 1
    for lo in range(0, n_frames, gen_chunk):
        hi = min(lo + gen_chunk, n_frames)
        f = hi - lo
        frames = np.broadcast_to(base32, (f, n_atoms, 3)).copy()
        dirs = (cw * nh032
                + sw * (np.cos(phi[lo:hi])[:, :, None] * e132
                        + np.sin(phi[lo:hi])[:, :, None] * e232))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        frames[:, h_idx] = frames[:, n_idx] + 0.102 * dirs
        coords = np.einsum("fij,faj->fai", rot[lo:hi], frames)
        native.write_xtc(
            xtc, coords,
            times=(np.arange(lo, hi, dtype=np.float32) * dt),
            append=lo > 0, step0=lo,
        )
    info = {
        "setup_s": round(time.time() - t_setup, 2),
        "file_bytes": os.path.getsize(xtc),
        "n_atoms": n_atoms,
        "n_frames": n_frames,
        "n_res": n_res,
    }
    return ref_pdb, xtc, info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="ubiquitin",
                   choices=["ubiquitin", "northstar"])
    p.add_argument("--nres", type=int, default=0, help="override bond count")
    p.add_argument("--frames", type=int, default=0, help="override frames")
    p.add_argument("--workdir", default="/tmp/spinrelax_file_e2e")
    p.add_argument("--keep", action="store_true",
                   help="keep the workdir (reuse the trajectory next run; "
                        "NOTE: the remote pool server caches (program, "
                        "input)->result, so a reused trajectory can report "
                        "cached compute — see CLAUDE.md TPU timing rules)")
    p.add_argument("--seed", type=int, default=0,
                   help="trajectory RNG seed (default: fresh from the "
                        "clock — honest TPU timings need fresh inputs)")
    p.add_argument("--tau-mem", type=float, default=1000.0,
                   help="Palmer memory time [ps] (1000-frame chunks at dt=1)")
    p.add_argument("--groups", type=int, default=4, help="chunks per dispatch")
    p.add_argument("--threads", type=int, default=1,
                   help="decoder threads (1-core container: sequential)")
    a = p.parse_args()

    if a.preset == "ubiquitin":
        n_res, n_pad, n_frames = 71, 1231 - 3 * 71, 100_000
    else:
        n_res, n_pad, n_frames = 10_000, 0, 20_000
    if a.nres:
        n_res, n_pad = a.nres, 0
    if a.frames:
        n_frames = a.frames

    # The CLI enables the persistent XLA compilation cache; this bench
    # measures the same production path, so engage it identically.
    from spinrelax_tpu.utils import compile_cache

    compile_cache.enable_default()

    seed = a.seed if a.seed else (int(time.time()) & 0x7FFFFFFF)

    pre_existing = os.path.isdir(a.workdir)
    os.makedirs(a.workdir, exist_ok=True)
    ref_pdb = os.path.join(a.workdir, "reference.pdb")
    xtc = os.path.join(a.workdir, "traj.xtc")
    meta_fn = os.path.join(a.workdir, "meta.json")
    meta = dict(n_res=n_res, n_pad=n_pad, n_frames=n_frames)
    reuse = False
    if a.keep and os.path.exists(meta_fn):
        with open(meta_fn) as fh:
            stored = json.load(fh)
        stored.pop("seed", None)  # shape match only; seed is informational
        reuse = stored == meta and os.path.exists(xtc)
    meta["seed"] = seed
    if reuse:
        info = {"setup_s": 0.0, "file_bytes": os.path.getsize(xtc),
                "n_atoms": 3 * n_res + n_pad, "n_frames": n_frames,
                "n_res": n_res, "reused": True}
        print(f"= = reusing {xtc}")
    else:
        print(f"= = building {n_frames} frames x {3 * n_res + n_pad} atoms "
              f"({n_res} NH bonds) in {a.workdir} ...")
        ref_pdb, xtc, info = build_trajectory(
            a.workdir, n_res, n_pad, n_frames, seed=seed
        )
        with open(meta_fn, "w") as fh:
            json.dump(meta, fh)
    print(f"= = setup: {info['setup_s']} s, "
          f"{info['file_bytes'] / 1e6:.0f} MB xtc")

    # --- decode-only pass (attribution): pure host-side iter_xtc.
    from spinrelax_tpu.io import native

    t0 = time.time()
    got = 0
    for chunk, _, _ in native.iter_xtc(xtc, 2000, threads=a.threads):
        got += len(chunk)
    decode_s = time.time() - t0
    assert got == n_frames, (got, n_frames)
    print(f"= = decode-only: {decode_s:.2f} s "
          f"({n_frames / decode_s:.0f} frames/s, "
          f"{info['file_bytes'] / decode_s / 1e6:.0f} MB/s)")

    # --- host-prep pass (attribution): decode + bond_obs_host, no device
    # work at all — everything stage_ct_streamed does on the host before
    # its async dispatches.  wall(ct_stream) - prep_s is then the cost
    # the device path adds ON TOP of host prep (transfer serialisation +
    # dispatch + any non-overlapped compute), which is the honest test of
    # the decode-overlaps-compute claim.
    from spinrelax_tpu.io import pdb as pdbio
    from spinrelax_tpu.ops import orient

    top, ref_xyz = pdbio.read_structure(ref_pdb)
    idx_h, idx_x, _res = pdbio.bond_indices(
        top, "name H", "name N and not resname PRO"
    )
    w_fit = np.asarray(top.occupancies) > 0
    t0 = time.time()
    sink = 0.0
    for chunk, _, _ in native.iter_xtc(xtc, 2000, threads=a.threads):
        raw_diff, S = orient.bond_obs_host(
            chunk, ref_xyz[0], idx_h, idx_x, w_fit.astype(float)
        )
        sink += float(raw_diff[0, 0, 0]) + float(S[0, 0, 0])
    prep_s = time.time() - t0
    print(f"= = decode+bond_obs (host prep, no device): {prep_s:.2f} s "
          f"({n_frames / prep_s:.0f} frames/s)")

    # --- the timed end-to-end: streamed ct -> ladder fit -> rates.
    from spinrelax_tpu.models import Diffusion
    from spinrelax_tpu.pipeline import stages

    out_dir = os.path.join(a.workdir, "out")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    prefix = os.path.join(out_dir, "rotdif")

    t0 = time.time()
    stages.stage_ct_streamed(
        [xtc], [ref_pdb], prefix,
        tau_memory=a.tau_mem, chunk_groups=a.groups,
    )
    t_ct = time.time() - t0

    t1 = time.time()
    stages.stage_fit_ct([prefix + "_Ctint.dat"], prefix)
    t_fit = time.time() - t1

    t2 = time.time()
    stages.stage_relax(
        prefix + "_fittedCt.dat", prefix + "-600",
        Diffusion.isotropic(diso=3.3e-5),
        vec_file=prefix + "_vecHistogram.npz",
    )
    t_relax = time.time() - t2
    total = time.time() - t0

    fv = n_frames * n_res
    result = {
        "metric": "file_fed_e2e_seconds",
        "value": round(total, 2),
        "unit": "s",
        "preset": a.preset,
        "n_frames": n_frames,
        "n_res": n_res,
        "n_atoms": info["n_atoms"],
        "file_MB": round(info["file_bytes"] / 1e6, 1),
        "decode_only_s": round(decode_s, 2),
        "host_prep_s": round(prep_s, 2),
        "ct_stream_s": round(t_ct, 2),
        "fit_ladder_s": round(t_fit, 2),
        "relax_s": round(t_relax, 2),
        "frames_per_s": round(n_frames / t_ct, 1),
        "frame_vectors_per_s": round(fv / t_ct, 1),
    }
    print(json.dumps(result))
    if not a.keep:
        if pre_existing:
            # Never rmtree a directory the tool did not create — the
            # user's --workdir may hold unrelated files.
            print(f"= = workdir {a.workdir} pre-existed; left in place "
                  "(pass --keep to silence)", file=sys.stderr)
        else:
            shutil.rmtree(a.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
