"""Batched scalar minimisation utilities.

``golden_vec`` minimises a vector-valued objective elementwise — every
batch element carries its own bracket — with a fixed iteration count so
the whole search jits to one fused loop.  Used for the residue-specific
CSA local optimisation, where the reference runs nResidues sequential
scalar Powell fits (spectral_densities.py:1371-1382); here all residues
descend together, one batched forward evaluation per iteration.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

_INVPHI = (jnp.sqrt(5.0) - 1.0) / 2.0
_INVPHI2 = (3.0 - jnp.sqrt(5.0)) / 2.0


def golden_vec(f: Callable, lo, hi, n_iter: int = 80):
    """Elementwise golden-section minimisation.

    f        : maps (B,) candidate vector -> (B,) objective values.
    lo, hi   : (B,) bracket bounds per element.
    Returns the (B,) minimising points.
    """
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def body(_, state):
        a, b, c, d, fc, fd = state
        shrink_right = fc < fd  # minimum in [a, d]
        a_new = jnp.where(shrink_right, a, c)
        b_new = jnp.where(shrink_right, d, b)
        h = b_new - a_new
        c_new = a_new + _INVPHI2 * h
        d_new = a_new + _INVPHI * h
        fc_new = f(c_new)
        fd_new = f(d_new)
        return a_new, b_new, c_new, d_new, fc_new, fd_new

    h0 = hi - lo
    c0 = lo + _INVPHI2 * h0
    d0 = lo + _INVPHI * h0
    state = (lo, hi, c0, d0, f(c0), f(d0))
    a, b, c, d, fc, fd = jax.lax.fori_loop(0, n_iter, body, state)
    x = 0.5 * (a + b)
    return x
