"""Global rotational-diffusion models.

One dataclass + dispatch replaces the reference's parallel class
hierarchies (``globalRotationalDiffusion_{Base,Isotropic,Axisymmetric}``
spectral_densities.py:253-603 and the legacy ``diffusionModel``
spectral_densities.py:1450-1558).  Internal storage follows the
reference's (Diso, Daniso) convention; Dx<=Dy<=Dz so the unique axis is z
when Daniso>1 (prolate) and x when Daniso<1 (oblate)
(spectral_densities.py:503-526).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import jomega as jw


ISOTROPIC = "isotropic"
AXISYMMETRIC = "axisymmetric"
ELLIPSOID = "ellipsoid"
DIRECT = "direct"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Diffusion:
    """Global rotational diffusion tensor.

    kind      : one of isotropic / axisymmetric / ellipsoid / direct (static).
    diso      : isotropic rate, 1/(6 tau_iso), in 1/<time_unit>.
    aniso     : Daniso = Dpar/Dperp (axisymmetric only; 1.0 otherwise).
    dxyz      : (3,) Dx<=Dy<=Dz for the fully anisotropic case.
    """

    kind: str = dataclasses.field(metadata=dict(static=True))
    diso: jnp.ndarray = 0.0
    aniso: jnp.ndarray = 1.0
    dxyz: Optional[jnp.ndarray] = None

    # -- constructors ---------------------------------------------------
    @staticmethod
    def isotropic(diso=None, tau=None) -> "Diffusion":
        if diso is None:
            diso = 1.0 / (6.0 * tau)
        return Diffusion(kind=ISOTROPIC, diso=jnp.asarray(diso), aniso=jnp.asarray(1.0))

    @staticmethod
    def axisymmetric(diso=None, aniso=None, tau=None, dpar=None, dperp=None) -> "Diffusion":
        if dpar is not None:
            # Convert (Dpar, Dperp) -> (Diso, Daniso)
            # (spectral_densities.py:475-482)
            diso = (2.0 * dperp + dpar) / 3.0
            aniso = dpar / dperp
        elif diso is None:
            diso = 1.0 / (6.0 * tau)
        return Diffusion(kind=AXISYMMETRIC, diso=jnp.asarray(diso), aniso=jnp.asarray(aniso))

    @staticmethod
    def ellipsoid(dxyz) -> "Diffusion":
        dxyz = jnp.sort(jnp.asarray(dxyz))
        return Diffusion(
            kind=ELLIPSOID,
            diso=jnp.mean(dxyz),
            aniso=2.0 * dxyz[2] / (dxyz[0] + dxyz[1]),
            dxyz=dxyz,
        )

    @staticmethod
    def direct() -> "Diffusion":
        """No global tumbling: J is the direct transform of local C(t)
        (spectral_densities.py:1464-1467)."""
        return Diffusion(kind=DIRECT, diso=jnp.asarray(jnp.nan))

    # -- derived --------------------------------------------------------
    @property
    def tau_iso(self):
        return 1.0 / (6.0 * self.diso)

    def dpar_dperp(self):
        """(Dpar, Dperp) from (Diso, Daniso)
        (spectral_densities.py:535-540)."""
        return jw.symmtop_from_diso_aniso(self.diso, self.aniso)

    @property
    def prolate(self):
        return self.aniso > 1.0

    def with_diso(self, diso) -> "Diffusion":
        """Replace Diso.  For the ellipsoid kind this rescales all three
        principal values by diso/Diso_old (shape-preserving) so that the
        legacy Diso fit actually moves the ellipsoid J — the reference
        hard-exits here instead ('change_Diso ... for fully anisotropic
        models, not implemented', spectral_densities.py:1545-1547); a
        plain dataclasses.replace would silently change nothing because
        the ellipsoid J reads only dxyz."""
        diso = jnp.asarray(diso)
        if self.kind == ELLIPSOID:
            return dataclasses.replace(
                self, diso=diso, dxyz=self.dxyz * (diso / self.diso)
            )
        return dataclasses.replace(self, diso=diso)

    def with_aniso(self, aniso) -> "Diffusion":
        if self.kind == ELLIPSOID:
            # A single anisotropy ratio does not determine the three
            # principal values; rebuilding dxyz from it is ambiguous.
            raise ValueError(
                "with_aniso is undefined for the ellipsoid kind "
                "(set the principal values via Diffusion.ellipsoid)"
            )
        return dataclasses.replace(self, aniso=jnp.asarray(aniso))

    # -- J(omega) -------------------------------------------------------
    def j_combined(self, omega, S2, C, tau, mask=None, vecs=None, zeta=1.0):
        """J(omega) combining this tumbling model with local C(t) params.

        S2 (nRes,), C/tau/mask (nRes, K); ``vecs`` (nRes, [nSamp,] 3) PAF
        vectors required for anisotropic kinds.  Returns
        (nRes, [nSamp,] nOm).
        """
        if self.kind == ISOTROPIC:
            return jw.j_combine_isotropic(
                omega, self.tau_iso, S2, C, tau, comp_mask=mask, zeta=zeta
            )
        if self.kind == AXISYMMETRIC:
            dpar, dperp = self.dpar_dperp()
            if vecs is None:
                raise ValueError("axisymmetric diffusion requires PAF vectors")
            extra = vecs.ndim - S2.ndim - 1  # broadcast residue params over samples
            S2b = S2.reshape(S2.shape + (1,) * extra)
            Cb = C.reshape(C.shape[:-1] + (1,) * extra + C.shape[-1:])
            taub = tau.reshape(tau.shape[:-1] + (1,) * extra + tau.shape[-1:])
            maskb = (
                None
                if mask is None
                else mask.reshape(mask.shape[:-1] + (1,) * extra + mask.shape[-1:])
            )
            return jw.j_combine_symmtop(
                omega, vecs, dpar, dperp, S2b, Cb, taub, comp_mask=maskb, zeta=zeta
            )
        if self.kind == ELLIPSOID:
            if vecs is None:
                raise ValueError("ellipsoid diffusion requires PAF vectors")
            extra = vecs.ndim - S2.ndim - 1
            S2b = S2.reshape(S2.shape + (1,) * extra)
            Cb = C.reshape(C.shape[:-1] + (1,) * extra + C.shape[-1:])
            taub = tau.reshape(tau.shape[:-1] + (1,) * extra + tau.shape[-1:])
            maskb = (
                None
                if mask is None
                else mask.reshape(mask.shape[:-1] + (1,) * extra + mask.shape[-1:])
            )
            return jw.j_combine_ellipsoid(
                omega, vecs, self.dxyz, S2b, Cb, taub, comp_mask=maskb, zeta=zeta
            )
        if self.kind == DIRECT:
            C_eff = C * (mask if mask is not None else 1.0)
            return zeta * jw.j_direct_transform(omega, C_eff, tau)
        raise ValueError(f"unknown diffusion kind {self.kind!r}")

    def j_rigid(self, omega, vecs=None):
        """Rigid-body J for this tumbling model
        (spectral_densities.py:460-461, 600-603)."""
        if self.kind == ISOTROPIC:
            return jw.j_rigid_sphere_D(omega, self.diso)
        if self.kind == AXISYMMETRIC:
            dpar, dperp = self.dpar_dperp()
            return jw.j_rigid_symmtop(omega, vecs, dpar, dperp)
        if self.kind == ELLIPSOID:
            return jw.j_rigid_ellipsoid(omega, vecs, self.dxyz)
        raise ValueError(f"no rigid J for kind {self.kind!r}")
