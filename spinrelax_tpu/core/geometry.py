"""Spherical-coordinate transforms and histogram helpers (pure JAX).

Replaces ``general_maths.py:118-205`` (xyz<->r/phi/theta) and the
Lambert-cylindrical histogram logic from ``calculate-Ct-from-traj.py:609-636``
/ ``spectral_densities.py:2334-2350``.  The reference's unit-vector
``xyz_to_rtp`` contains a latent bug (theta computed as arccos(z/phi),
general_maths.py:131-139); here we implement the intended maths
(theta = arccos(z) for unit vectors) as SURVEY §2.7 prescribes.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyz_to_rtp(v):
    """(..., 3) xyz -> (..., 3) [r, phi, theta]; phi in (-pi, pi],
    theta in [0, pi] from +z (general_maths.py:118-158, intended maths)."""
    r = jnp.linalg.norm(v, axis=-1)
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    safe_r = jnp.where(r > 0, r, 1.0)
    theta = jnp.arccos(jnp.clip(v[..., 2] / safe_r, -1.0, 1.0))
    return jnp.stack([r, phi, theta], axis=-1)


def xyz_to_pt(v):
    """Unit vectors (..., 3) -> (..., 2) [phi, theta]."""
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    theta = jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))
    return jnp.stack([phi, theta], axis=-1)


def pt_to_xyz(pt):
    """(..., 2) [phi, theta] -> unit vectors (..., 3)
    (general_maths.py:160-187 with bUnit=True)."""
    phi, theta = pt[..., 0], pt[..., 1]
    st = jnp.sin(theta)
    return jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta)], axis=-1)


def rtp_to_xyz(rtp):
    """(..., 3) [r, phi, theta] -> (..., 3) xyz."""
    r, phi, theta = rtp[..., 0], rtp[..., 1], rtp[..., 2]
    st = jnp.sin(theta)
    return jnp.stack(
        [r * jnp.cos(phi) * st, r * jnp.sin(phi) * st, r * jnp.cos(theta)], axis=-1
    )


def lambert_histogram(vecs, bins_phi: int = 72, bins_cos: int = 36,
                      valid=None):
    """2D histogram over (phi, cos(theta)) — the Lambert cylindrical
    projection, equal-area so bin occupancies are comparable
    (calculate-Ct-from-traj.py:609-636).

    Parameters
    ----------
    vecs : (..., nSamples, 3) unit vectors; the histogram is taken over the
        second-to-last axis independently for each leading index.
    valid : optional bool mask broadcastable to (..., nSamples); False
        samples are discarded (scattered into a dropped overflow slot) —
        used by fixed-shape streaming callers that zero-pad partial
        chunk groups (stages.stage_ct_streamed).

    Returns
    -------
    hist : (..., bins_phi, bins_cos) int32 counts
    edges_phi : (bins_phi+1,) edges spanning (-pi, pi)
    edges_cos : (bins_cos+1,) edges spanning (-1, 1)
    """
    vecs = jnp.asarray(vecs)
    phi = jnp.arctan2(vecs[..., 1], vecs[..., 0])
    cth = jnp.clip(vecs[..., 2], -1.0, 1.0)

    # Bin indices; right-inclusive top edge like np.histogramdd.
    fx = (phi + jnp.pi) / (2.0 * jnp.pi) * bins_phi
    fy = (cth + 1.0) / 2.0 * bins_cos
    ix = jnp.clip(fx.astype(jnp.int32), 0, bins_phi - 1)
    iy = jnp.clip(fy.astype(jnp.int32), 0, bins_cos - 1)
    flat = ix * bins_cos + iy

    nbins = bins_phi * bins_cos
    n_slots = nbins
    if valid is not None:
        mask = jnp.broadcast_to(jnp.asarray(valid, bool), flat.shape)
        flat = jnp.where(mask, flat, nbins)  # discard slot
        n_slots = nbins + 1
    lead_shape = flat.shape[:-1]
    flat2 = flat.reshape((-1, flat.shape[-1]))
    # Vectorised scatter-add over leading axes without a Python loop.
    # Counts accumulate as int32, NOT the coordinate dtype: f32 counts
    # saturate at 2^24 (+1.0 becomes a no-op), which the streamed >RAM
    # trajectory path would hit silently on long rigid bonds (callers
    # that pool chunk histograms should pool in int64/f64).
    hist = jnp.zeros((flat2.shape[0], n_slots), dtype=jnp.int32)
    rows = jnp.arange(flat2.shape[0])[:, None]
    hist = hist.at[rows, flat2].add(1)
    hist = hist[:, :nbins].reshape(lead_shape + (bins_phi, bins_cos))

    edges_phi = jnp.linspace(-jnp.pi, jnp.pi, bins_phi + 1)
    edges_cos = jnp.linspace(-1.0, 1.0, bins_cos + 1)
    return hist, edges_phi, edges_cos


def lambert_hist_to_vecs(hist, edges_phi, edges_cos):
    """Histogram -> (bin-centre unit vectors, weights); zero-weight bins are
    kept for fixed shapes (spectral_densities.py:2334-2350).

    hist : (nRes, bins_phi, bins_cos)
    Returns vecs (nRes, nPoints, 3) and weights (nRes, nPoints).
    """
    hist = jnp.asarray(hist)
    edges_phi = jnp.asarray(edges_phi)
    edges_cos = jnp.asarray(edges_cos)
    phis = 0.5 * (edges_phi[:-1] + edges_phi[1:])
    thetas = jnp.arccos(jnp.clip(0.5 * (edges_cos[:-1] + edges_cos[1:]), -1.0, 1.0))
    pp, tt = jnp.meshgrid(phis, thetas, indexing="ij")
    bin_vecs = pt_to_xyz(jnp.stack([pp, tt], axis=-1)).reshape(-1, 3)
    n_res = hist.shape[0]
    n_pts = bin_vecs.shape[0]
    vecs = jnp.broadcast_to(bin_vecs[None], (n_res, n_pts, 3))
    weights = hist.reshape(n_res, n_pts)
    return vecs, weights
