"""Dense batched multi-exponential autocorrelation models.

Replaces the reference's per-residue ``autoCorrelationModel`` objects in an
OrderedDict (``fitting_Ct_functions.py:12-427``) with one struct-of-arrays
container: every residue's C(t) = zeta * (S2 + sum_i C_i exp(-t/tau_i)) is
stored in fixed-shape (nRes, K) arrays with a validity mask, so evaluation,
J(omega) combination and fitting are single vmapped/jitted calls instead of
Python loops.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CtModelSet:
    """Struct-of-arrays set of per-residue multi-exponential C(t) models.

    S2    : (nRes,) the slow-limit order parameter S2_0.
    C     : (nRes, K) transient amplitudes (padded).
    tau   : (nRes, K) transient time constants (padded; padding tau=1).
    mask  : (nRes, K) 1.0 for real components, 0.0 for padding.
    zeta  : () global QM zero-point-vibration scaling
            (fitting_Ct_functions.py:211-222).
    s2fast: (nRes,) bool-like (0/1): whether the model carries an implicit
            fast component S2_fast = 1 - S2 - sum(C)
            (fitting_Ct_functions.py:197-201).

    Optional fit metadata (uncertainties, chi-square) mirror the
    reference's report headers.
    """

    S2: jnp.ndarray
    C: jnp.ndarray
    tau: jnp.ndarray
    mask: jnp.ndarray
    zeta: jnp.ndarray
    s2fast: jnp.ndarray
    dS2: Optional[jnp.ndarray] = None
    dC: Optional[jnp.ndarray] = None
    dtau: Optional[jnp.ndarray] = None
    chisq: Optional[jnp.ndarray] = None
    names: List[str] = dataclasses.field(
        default_factory=list, metadata=dict(static=True)
    )

    # -- construction ---------------------------------------------------
    @staticmethod
    def from_lists(
        names: Sequence[str],
        S2: Sequence[float],
        C_list: Sequence[Sequence[float]],
        tau_list: Sequence[Sequence[float]],
        s2fast: Optional[Sequence[bool]] = None,
        zeta: float = 1.0,
        max_comps: Optional[int] = None,
        dS2=None,
        dC_list=None,
        dtau_list=None,
        chisq=None,
        sort: bool = True,
    ) -> "CtModelSet":
        """Build from ragged per-residue lists (as parsed from a
        ``*_fittedCt.dat`` file), padding to a common K.  Components are
        sorted fast-to-slow like the reference
        (fitting_Ct_functions.py:203-209)."""
        n = len(names)
        K = max_comps or max((len(c) for c in C_list), default=1)
        K = max(K, 1)
        C = np.zeros((n, K))
        tau = np.ones((n, K))
        mask = np.zeros((n, K))
        dC = np.zeros((n, K))
        dtau = np.zeros((n, K))
        for i, (cs, ts) in enumerate(zip(C_list, tau_list)):
            cs = np.asarray(cs, dtype=float)
            ts = np.asarray(ts, dtype=float)
            # dC and dtau are handled symmetrically and independently:
            # either may be given without the other (the legacy fittedCt
            # format can carry dC-only rows).
            dc = np.asarray(dC_list[i], dtype=float) if dC_list is not None else None
            dt = np.asarray(dtau_list[i], dtype=float) if dtau_list is not None else None
            if sort and len(ts) > 1:
                order = np.argsort(ts)
                cs, ts = cs[order], ts[order]
                if dc is not None:
                    dc = dc[order]
                if dt is not None:
                    dt = dt[order]
            k = len(cs)
            C[i, :k] = cs
            tau[i, :k] = ts
            mask[i, :k] = 1.0
            if dc is not None:
                dC[i, :k] = dc
            if dt is not None:
                dtau[i, :k] = dt
        if s2fast is None:
            s2fast = [False] * n
        return CtModelSet(
            S2=jnp.asarray(np.asarray(S2, dtype=float)),
            C=jnp.asarray(C),
            tau=jnp.asarray(tau),
            mask=jnp.asarray(mask),
            zeta=jnp.asarray(float(zeta)),
            s2fast=jnp.asarray(np.asarray(s2fast, dtype=float)),
            dS2=None if dS2 is None else jnp.asarray(np.asarray(dS2, dtype=float)),
            dC=None if dC_list is None else jnp.asarray(dC),
            dtau=None if dtau_list is None else jnp.asarray(dtau),
            chisq=None if chisq is None else jnp.asarray(np.asarray(chisq, dtype=float)),
            names=[str(x) for x in names],
        )

    # -- properties -----------------------------------------------------
    @property
    def n_models(self) -> int:
        return self.S2.shape[0]

    @property
    def max_comps(self) -> int:
        return self.C.shape[1]

    def n_comps(self):
        return jnp.sum(self.mask, axis=-1).astype(jnp.int32)

    def s2_fast(self):
        """S2_fast = 1 - S2 - sum(C) where enabled, else 0
        (fitting_Ct_functions.py:197-201)."""
        val = 1.0 - self.S2 - jnp.sum(self.C * self.mask, axis=-1)
        return jnp.where(self.s2fast > 0, val, 0.0)

    # -- evaluation -----------------------------------------------------
    def eval(self, dt):
        """C(t) curves: (nRes, nT) = zeta*(S2 + sum_i C_i e^(-t/tau_i))
        (fitting_Ct_functions.py:266-270)."""
        dt = jnp.asarray(dt)
        decay = jnp.exp(-dt[None, None, :] / self.tau[:, :, None])
        s = jnp.sum(self.C[:, :, None] * self.mask[:, :, None] * decay, axis=1)
        return self.zeta * (self.S2[:, None] + s)

    def select(self, idx) -> "CtModelSet":
        """Subset of residues (host-side), preserving names.  Accepts
        integer indices or a boolean mask (normalised to indices so the
        names list — int-indexed below — stays aligned with the arrays)."""
        idx = np.asarray(idx)
        if idx.dtype == bool:
            idx = np.where(idx)[0]
        take = lambda a: None if a is None else jnp.asarray(np.asarray(a)[idx])
        return CtModelSet(
            S2=take(self.S2),
            C=take(self.C),
            tau=take(self.tau),
            mask=take(self.mask),
            zeta=self.zeta,
            s2fast=take(self.s2fast),
            dS2=take(self.dS2),
            dC=take(self.dC),
            dtau=take(self.dtau),
            chisq=take(self.chisq),
            names=[self.names[int(i)] for i in idx],
        )

    def with_zeta(self, zeta: float) -> "CtModelSet":
        return dataclasses.replace(self, zeta=jnp.asarray(float(zeta)))
