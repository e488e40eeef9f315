"""Device-mesh construction and sharding helpers.

The reference has no distributed computing (SURVEY §2.5) — its "data
parallelism" is replicate MD trajectories analysed jointly and its
"sequence parallelism" is the Palmer memory-time chunking of the frame
axis.  Both map naturally onto a 2D JAX mesh:

    axis 'rep' : Palmer chunks / replica trajectories  (data parallel)
    axis 'res' : bond vectors / residues               (model parallel)

Collectives (means + SEM over chunks, residue gathers) are inserted by
GSPMD from sharding annotations — no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into the most balanced (a, b) with a*b == n."""
    best = (n, 1)
    a = int(np.sqrt(n))
    while a > 1:
        if n % a == 0:
            best = (n // a, a)
            break
        a -= 1
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("rep", "res"),
    devices=None,
) -> Mesh:
    """Build a 2D mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    shape = _factor2(n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def vecs_sharding(mesh: Mesh) -> NamedSharding:
    """(nRep, nFrames, nRes, 3): chunk axis over 'rep', residue over 'res'."""
    return NamedSharding(mesh, P("rep", None, "res", None))


def residue_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Arrays with a leading residue axis sharded over BOTH mesh axes
    (residues are embarrassingly parallel in the fit/J stages)."""
    return NamedSharding(mesh, P(("rep", "res"), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
