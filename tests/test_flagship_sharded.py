"""The FLAGSHIP physics runs sharded: streamed C(t) -> DoF ladder ->
symmtop J with vector ensembles -> legacy ensemble rates on the 8-device
mesh equals the single-device library path (the same code stage_fit_ct /
stage_relax run; reference spectral_densities.py:2057-2077 +
fitting_Ct_functions.py:278-304).
"""

import numpy as np
import pytest

from spinrelax_tpu.constants import NucleusPair, field_from_mhz
from spinrelax_tpu.fit.expfit import fit_ct_ladder
from spinrelax_tpu.models import Diffusion
from spinrelax_tpu.ops import observables as obs
from spinrelax_tpu.ops.autocorr import ct_palmer
from spinrelax_tpu.parallel.mesh import make_mesh
from spinrelax_tpu.parallel.streamed import ShardedCtStream, run_sharded_finish


@pytest.mark.parametrize("kind", ["axisymmetric", "isotropic", "ellipsoid"])
def test_flagship_sharded_matches_single_device(rng, kind):
    mesh = make_mesh(8)
    n_frames, n_res, n_samp = 32, 9, 12  # n_res NOT divisible by the mesh
    delta_t = 1.0
    names = [str(i + 2) for i in range(n_res)]

    # Correlated random walk on the sphere (diffusion-like, correlation
    # time ~ a few frames) so C(t) has real exponential structure: iid
    # random vectors give pure-noise decays whose ladder fits are ALL
    # degenerate, and the per-residue rung selection then flips on 1-ulp
    # input differences between the streamed and two-pass C(t) (their
    # reduction orders differ) — chaos amplification, not a physics
    # discrepancy.
    steps = rng.normal(size=(7 * n_frames, n_res, 3))
    walk = np.empty((7 * n_frames, n_res, 3))
    walk[0] = steps[0] / np.linalg.norm(steps[0], axis=-1, keepdims=True)
    for t in range(1, 7 * n_frames):
        w = walk[t - 1] + 0.25 * steps[t]
        walk[t] = w / np.linalg.norm(w, axis=-1, keepdims=True)
    chunks = walk.reshape(7, n_frames, n_res, 3)
    vecs = rng.normal(size=(n_res, n_samp, 3))
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    weights = rng.uniform(0.5, 2.0, (n_res, n_samp))
    csa = rng.uniform(-180e-6, -160e-6, n_res)
    pair = NucleusPair(B0=field_from_mhz(600.133), time_unit="ps")
    if kind == "axisymmetric":
        diffusion = Diffusion.axisymmetric(diso=4e-5, aniso=1.5)
        v_in, w_in = vecs, weights
    elif kind == "ellipsoid":
        # fully anisotropic (Drhomb != 0): exercises the 5-coefficient
        # ellipsoid J through the sharded ensemble-rates jit
        diffusion = Diffusion.ellipsoid(np.array([2.8e-5, 3.6e-5, 5.6e-5]))
        v_in, w_in = vecs, weights
    else:
        diffusion = Diffusion.isotropic(diso=4e-5)
        v_in = w_in = None

    # --- single-device reference path (what the stages run) -----------
    Ct_ref, dCt_ref = ct_palmer(chunks)  # (nDeltas, nRes)
    dt = (np.arange(Ct_ref.shape[0]) + 1.0) * delta_t
    cts_ref = fit_ct_ladder(
        names=names, dt=dt, decays=np.asarray(Ct_ref).T,
        ddecays=np.asarray(dCt_ref).T, zeta=0.89,
    )
    rates_ref = obs.predict_rates(
        pair, diffusion, cts_ref, vecs=v_in, weights=w_in, csa=csa
    )

    # --- sharded streamed path ----------------------------------------
    stream = ShardedCtStream(mesh, n_frames, n_res, dtype=np.float64)
    stream.update(chunks[:4])
    stream.update(chunks[4:])  # 3 chunks: not divisible by the rep axis
    out = run_sharded_finish(
        mesh, *stream.accumulators(),
        n_res=n_res, delta_t=delta_t, diffusion=diffusion, pair=pair,
        vecs=v_in, weights=w_in, csa=csa, zeta=0.89, names=names,
    )

    np.testing.assert_allclose(out.Ct, np.asarray(Ct_ref).T, rtol=1e-10)
    np.testing.assert_allclose(out.dCt, np.asarray(dCt_ref).T, rtol=1e-10)
    # atol floors the S2 comparison above the dead-parameter asymptote:
    # pure-noise residues have true S2 = 0, realised as wherever the
    # optimiser's convergence gate stops along the sigmoid boundary
    # (0.0 after underflow vs ~1e-22) — the streamed Ct differs from
    # ct_palmer's by 1 ulp (reduction order), which is enough to shift
    # that stop point.  Real S2 here are O(1e-2).
    np.testing.assert_allclose(
        np.asarray(out.cts.S2), np.asarray(cts_ref.S2), rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.cts.mask), np.asarray(cts_ref.mask)
    )
    for f in ("R1", "R2", "NOE", "rho", "dR1", "dR2", "dNOE", "drho"):
        a, b = getattr(out, f), getattr(rates_ref, f)
        if b is None:
            assert a is None, f
            continue
        # atol floors the comparison above cancellation noise: residues
        # whose (noise-driven) fit gives J ~ 0 have true ensemble sd 0,
        # realised as ~1e-24 garbage that differs between reduction
        # orders.  Real rates/sds here are O(1e-4).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-12, err_msg=f
        )


def test_flagship_sharded_single_chunk_stream_is_finite(rng):
    """count == 1 streams have dCt = NaN everywhere (the deliberate
    sqrt(n)-1 quirk of palmer_pooled_stats); the ladder's sigma<=0 guard
    does NOT catch NaN, so without the NaN-safe weight guard the whole
    flagship finish silently returned all-NaN rates."""
    mesh = make_mesh(8)
    n_frames, n_res = 32, 9
    chunks = rng.normal(size=(1, n_frames, n_res, 3))
    chunks /= np.linalg.norm(chunks, axis=-1, keepdims=True)
    stream = ShardedCtStream(mesh, n_frames, n_res, dtype=np.float64)
    stream.update(chunks)
    out = run_sharded_finish(
        mesh, *stream.accumulators(),
        n_res=n_res, delta_t=1.0, diffusion=Diffusion.isotropic(diso=4e-5),
    )
    assert np.all(np.isnan(out.dCt))  # the count==1 quirk itself stays
    for f in ("R1", "R2", "NOE", "rho"):
        assert np.all(np.isfinite(np.asarray(getattr(out, f)))), f
