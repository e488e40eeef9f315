"""Vector-distribution persistence (.npz PhiTheta / LambertCylindrical).

The reference stores per-residue bond-vector distributions either as raw
(phi, theta) samples or as Lambert-cylindrical histograms in compressed
.npz (calculate-Ct-from-traj.py:602-630) and reloads them for relaxation
calculations (spectral_densities.py:279-306,
calculate-relaxations-from-Ct.py:424-454).  Both formats are reproduced
bit-compatibly so either tool can read the other's files.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core import geometry


def save_phitheta(fn: str, names, phithetas: np.ndarray):
    """Save raw (phi, theta) samples: data (nRes, nSamples, 2)."""
    np.savez_compressed(
        fn,
        names=np.asarray(names),
        dataType="PhiTheta",
        axisLabels=["phi", "theta"],
        bHistogram=False,
        data=np.asarray(phithetas),
    )


def save_histogram(fn: str, names, hist: np.ndarray, edges_phi, edges_cos):
    """Save Lambert-cylindrical histograms: hist (nRes, nPhi, nCos)."""
    edges = np.empty(2, dtype=object)
    edges[0] = np.asarray(edges_phi)
    edges[1] = np.asarray(edges_cos)
    np.savez_compressed(
        fn,
        names=np.asarray(names),
        dataType="LambertCylindrical",
        bHistogram=True,
        edges=edges,
        axisLabels=["phi", "cos(theta)"],
        data=np.asarray(hist),
    )


def load_vector_distribution(fn: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Load either npz format -> (names, vecs (nRes, nSamp, 3),
    weights (nRes, nSamp) or None), mirroring
    read_vector_distribution_from_file
    (calculate-relaxations-from-Ct.py:424-454)."""
    obj = np.load(fn, allow_pickle=True)
    names = obj["names"]
    if obj["bHistogram"]:
        if str(obj["dataType"]) != "LambertCylindrical":
            raise ValueError(f"unsupported histogram projection: {obj['dataType']}")
        edges = obj["edges"]
        vecs, weights = geometry.lambert_hist_to_vecs(obj["data"], edges[0], edges[1])
        return names, np.asarray(vecs), np.asarray(weights)
    if str(obj["dataType"]) != "PhiTheta":
        raise ValueError(f"unsupported npz datatype: {obj['dataType']}")
    vecs = np.asarray(geometry.pt_to_xyz(np.asarray(obj["data"])))
    return names, vecs, None
