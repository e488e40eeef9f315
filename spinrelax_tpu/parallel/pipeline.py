"""The fused end-to-end compute step: bond vectors -> C(t) -> multi-exp
fit -> J(omega) -> R1/R2/NOE/rho, as one jitted program.

This is the "training step" equivalent of the framework: the reference
runs it as four separate processes communicating through files
(run-all.bash steps 2-4); here it is a single XLA program whose
intermediate tensors never leave the device, shardable over a
(rep, res) mesh for multi-chip execution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..constants import NucleusPair
from ..fit.lm import fit_multiexp
from ..ops import autocorr, relaxation as rx
from ..ops.jomega import j_combine_isotropic, j_combine_symmtop


class PipelineOutput(NamedTuple):
    Ct: jnp.ndarray  # (nDeltas, nRes)
    dCt: jnp.ndarray  # (nDeltas, nRes)
    S2: jnp.ndarray  # (nRes,)
    C: jnp.ndarray  # (nRes, K)
    tau: jnp.ndarray  # (nRes, K)
    R1: jnp.ndarray  # (nRes,)
    R2: jnp.ndarray  # (nRes,)
    NOE: jnp.ndarray  # (nRes,)
    rho: jnp.ndarray  # (nRes,)


def spinrelax_forward(
    vecs: jnp.ndarray,
    delta_t: float,
    omega: jnp.ndarray,
    f_dd: float,
    f_csa: float,
    time_fact: float,
    gamma_ratio: float,
    tau_iso: float,
    n_components: int = 2,
    zeta: float = 1.0,
) -> PipelineOutput:
    """Full forward pass on Palmer-chunked vectors.

    vecs : (nReplicates, nFramesPerChunk, nResidues, 3) unit vectors.
    The physical constants come in as plain floats (static under jit);
    isotropic tumbling keeps the benchmark single-kernel — the
    axisymmetric path only adds the A/D coefficient stage.
    """
    Ct, dCt = autocorr.ct_palmer(vecs)  # (nDeltas, nRes)
    n_deltas = Ct.shape[0]
    dt = (jnp.arange(n_deltas, dtype=vecs.dtype) + 1.0) * delta_t

    # Weight the fit by the Palmer SEMs like the reference
    # (calculate-fitted-Ct.py:171 passes dDecay into curve_fit) and this
    # repo's staged path (stages.py fit_ct_ladder with ddecays): dCt
    # grows strongly with lag, so an unweighted fit over-weights the
    # noisy tail.  Zero/invalid SEMs (e.g. 1-chunk runs) fall back to 1.
    sigma = jnp.where(dCt.T > 0, dCt.T, 1.0)
    fit = fit_multiexp(dt, Ct.T, sigma, K=n_components, s2_free=True)

    J = j_combine_isotropic(
        omega, tau_iso, fit.S2, fit.C, fit.tau, zeta=zeta
    )  # (nRes, 5)
    R1 = rx.r1_from_j(J, f_dd, f_csa, time_fact)
    R2 = rx.r2_from_j(J, f_dd, f_csa, time_fact)
    NOE = rx.noe_from_j(J, f_dd, time_fact, gamma_ratio, R1)
    rho = rx.rho_from_j(J)
    return PipelineOutput(Ct, dCt, fit.S2, fit.C, fit.tau, R1, R2, NOE, rho)


def make_forward(pair: Optional[NucleusPair] = None, tau_iso: float = 4242.0,
                 delta_t: float = 1.0, n_components: int = 2, zeta: float = 1.0):
    """Close over physical constants -> a (vecs -> PipelineOutput) function
    ready for jit / pjit."""
    pair = pair or NucleusPair(time_unit="ps")
    omega = jnp.asarray(pair.omega5())
    f_dd = pair.factor_dd()
    f_csa = pair.factor_csa()
    tf = pair.time_fact
    gr = pair.gamma_b / pair.gamma_a

    def fwd(vecs):
        return spinrelax_forward(
            vecs,
            delta_t=delta_t,
            omega=omega.astype(vecs.dtype),
            f_dd=f_dd,
            f_csa=f_csa,
            time_fact=tf,
            gamma_ratio=gr,
            tau_iso=tau_iso,
            n_components=n_components,
            zeta=zeta,
        )

    return fwd


def make_sharded_forward(mesh, **kwargs):
    """jit the forward step with (rep, res) sharding constraints; GSPMD
    inserts the cross-chunk mean/SEM collectives."""
    fwd = make_forward(**kwargs)
    from .mesh import vecs_sharding

    return jax.jit(fwd, in_shardings=vecs_sharding(mesh))
