"""Minimal periodic-boundary repair for solute trajectories.

The reference delegates PBC handling to a 3-stage GROMACS trjconv pipeline
(center-solute-gromacs.bash:70-80).  Per SURVEY §2.1 the rebuild accepts
already-centred trajectories and provides only a thin unwrap helper for
the common case: a single solute that may be split across the box
boundary in an orthorhombic cell.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def unwrap_and_center(xyz, box):
    """Make a molecule whole across orthorhombic PBC and centre it.

    xyz : (nFrames, nAtoms, 3) coordinates [nm].
    box : (3,) or (nFrames, 3) orthorhombic box lengths [nm].

    Each atom is shifted by whole box vectors to the periodic image
    closest to the first atom (sufficient for solutes smaller than half
    the box, the standard `-pbc mol` situation), then the geometric
    centre is moved to the origin.
    """
    xyz = jnp.asarray(xyz)
    box = jnp.asarray(box)
    if box.ndim == 1:
        box = box[None, :]
    anchor = xyz[:, :1, :]
    disp = xyz - anchor
    disp = disp - jnp.round(disp / box[:, None, :]) * box[:, None, :]
    whole = anchor + disp
    return whole - jnp.mean(whole, axis=1, keepdims=True)


@jax.jit
def minimum_image_distance(a, b, box):
    """Minimum-image distance vectors a-b under orthorhombic PBC."""
    d = jnp.asarray(a) - jnp.asarray(b)
    box = jnp.asarray(box)
    return d - jnp.round(d / box) * box
