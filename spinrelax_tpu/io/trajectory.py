"""Trajectory ingest: host-side readers producing device-ready arrays.

The reference reads .xtc via mdtraj (calculate-Ct-from-traj.py:426-458).
This rebuild's native formats are:

- .npz  : {'xyz': (nFrames, nAtoms, 3) [nm], 'time': (nFrames,) [ps]}
          — the preferred fast path (bench/pipeline native format).
- .pdb  : multi-MODEL coordinate files (io.pdb).
- .xtc / .dcd / anything-mdtraj : available when mdtraj is installed
          (optional dependency, gated).

All readers return (xyz, timestep_ps).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import pdb as pdbio

try:  # optional
    import mdtraj as _md
except Exception:  # pragma: no cover - absent in this image
    _md = None


def load_trajectory(
    fn: str, top_fn: Optional[str] = None
) -> Tuple[np.ndarray, float]:
    """Load any supported trajectory -> (xyz (nFrames, nAtoms, 3) nm,
    timestep ps)."""
    if fn.endswith(".npz"):
        obj = np.load(fn)
        xyz = np.asarray(obj["xyz"])
        if "time" in obj and len(obj["time"]) > 1:
            dt = float(obj["time"][1] - obj["time"][0])
        else:
            dt = float(obj.get("timestep", 1.0))
        return xyz, dt
    if fn.endswith(".pdb"):
        _, xyz = pdbio.read_pdb(fn)
        return xyz, 1.0
    if _md is not None:
        trj = _md.load(fn, top=top_fn)
        return np.asarray(trj.xyz), float(trj.timestep)
    raise ValueError(
        f"cannot read {fn!r}: npz/pdb supported natively; install mdtraj "
        "for xtc/dcd formats"
    )


def save_trajectory_npz(fn: str, xyz: np.ndarray, timestep: float = 1.0):
    xyz = np.asarray(xyz)
    time = np.arange(xyz.shape[0]) * timestep
    np.savez_compressed(fn, xyz=xyz, time=time, timestep=timestep)
