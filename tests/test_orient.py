"""Horn orientation / superposition tests: exact recovery of known
rotations, weighted fits, and noise robustness."""

import jax
import numpy as np

import jax.numpy as jnp

from spinrelax_tpu.core import quaternion as qt
from spinrelax_tpu.ops import orient


def random_unit_quats(rng, n):
    x = rng.normal(size=(n, 4))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    x[x[:, 0] < 0] *= -1
    return x


def make_molecule(rng, n_atoms=40):
    return rng.normal(size=(n_atoms, 3)) * 1.5


def test_exact_rotation_recovery(rng):
    ref = make_molecule(rng)
    quats = random_unit_quats(rng, 25)
    frames = np.asarray(qt.rotate_vector(ref[None, :, :], quats[:, None, :]))
    got = np.asarray(orient.orientation_quats(frames, ref))
    # Compare up to global sign continuity: |dot| ~ 1.
    dots = np.abs(np.sum(got * quats, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_recovery_with_translation(rng):
    ref = make_molecule(rng)
    quats = random_unit_quats(rng, 10)
    frames = np.asarray(qt.rotate_vector(ref[None], quats[:, None]))
    frames = frames + rng.normal(size=(10, 1, 3)) * 5.0  # random COM shifts
    got = np.asarray(orient.orientation_quats(frames, ref))
    dots = np.abs(np.sum(got * quats, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_weighted_fit_ignores_unweighted_atoms(rng):
    ref = make_molecule(rng, 30)
    quats = random_unit_quats(rng, 5)
    frames = np.asarray(qt.rotate_vector(ref[None], quats[:, None])).copy()
    # Corrupt the last 10 atoms, but give them zero fit weight.
    frames[:, 20:, :] += rng.normal(size=(5, 10, 3)) * 3.0
    w = np.concatenate([np.ones(20), np.zeros(10)])
    got = np.asarray(orient.orientation_quats(frames, ref, weights=w))
    dots = np.abs(np.sum(got * quats, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_superpose_restores_reference(rng):
    ref = make_molecule(rng)
    ref -= ref.mean(axis=0)
    quats = random_unit_quats(rng, 8)
    frames = np.asarray(qt.rotate_vector(ref[None], quats[:, None]))
    frames = frames + rng.normal(size=(8, 1, 3)) * 2.0
    fitted = np.asarray(orient.superpose(frames, ref))
    np.testing.assert_allclose(fitted, np.broadcast_to(ref, fitted.shape), atol=1e-8)


def test_sign_continuity(rng):
    """Slow continuous rotation must produce a continuous quaternion
    trajectory (no sign flips between adjacent frames)."""
    ref = make_molecule(rng)
    angles = np.linspace(0, 4 * np.pi, 400)  # two full turns
    axis = np.array([0.0, 0.0, 1.0])
    quats = np.stack(
        [np.concatenate([[np.cos(a / 2)], axis * np.sin(a / 2)]) for a in angles]
    )
    frames = np.asarray(qt.rotate_vector(ref[None], quats[:, None]))
    got = np.asarray(orient.orientation_quats(frames, ref))
    jumps = np.linalg.norm(np.diff(got, axis=0), axis=-1)
    assert np.max(jumps) < 0.1  # continuous, no 2-unit sign jumps


def test_bond_vectors_rigid_body(rng):
    """For a rigid molecule, fitted bond vectors are frame-independent."""
    ref = make_molecule(rng, 20)
    ref -= ref.mean(axis=0)
    quats = random_unit_quats(rng, 12)
    frames = np.asarray(qt.rotate_vector(ref[None], quats[:, None]))
    idx_h = np.array([1, 3, 5])
    idx_x = np.array([0, 2, 4])
    bv = orient.bond_vectors(frames, ref, jnp.asarray(idx_h), jnp.asarray(idx_x))
    fitted = np.asarray(bv.fitted)
    # All frames identical after superposition.
    np.testing.assert_allclose(fitted, np.broadcast_to(fitted[0], fitted.shape), atol=1e-8)
    # Raw vectors differ across frames (sanity).
    raw = np.asarray(bv.raw)
    assert np.std(raw, axis=0).max() > 0.1


def test_bond_obs_split_matches_bond_vectors(rng):
    """The host-reduced observables path (bond_obs_host ->
    bond_vectors_from_obs) must reproduce the monolithic device
    bond_vectors: same Horn fit, same conventions, only the 3x3
    correlation is accumulated on host (in f64) instead of on device."""
    ref = make_molecule(rng, 30)
    quats = random_unit_quats(rng, 25)
    frames = np.asarray(
        qt.rotate_vector(ref[None], quats[:, None])
    ) + 0.01 * rng.normal(size=(25, 30, 3))
    frames += rng.normal(size=(25, 1, 3))  # translations must cancel
    idx_h = np.array([1, 3, 5, 7])
    idx_x = np.array([0, 2, 4, 6])
    w = rng.uniform(0.0, 1.0, 30)

    want = orient.bond_vectors(
        frames.astype(np.float32), ref.astype(np.float32),
        jnp.asarray(idx_h), jnp.asarray(idx_x), jnp.asarray(w.astype(np.float32)),
    )
    raw_diff, S = orient.bond_obs_host(
        frames.astype(np.float32), ref, idx_h, idx_x, w
    )
    assert raw_diff.dtype == np.float32 and S.dtype == np.float32
    got = orient.bond_vectors_from_obs(raw_diff, S)
    np.testing.assert_allclose(np.asarray(got.raw), np.asarray(want.raw),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.fitted), np.asarray(want.fitted), atol=1e-5
    )

    # Slab-bounded host accumulation is exact (same values at any slab).
    raw2, S2 = orient.bond_obs_host(
        frames.astype(np.float32), ref, idx_h, idx_x, w,
        frame_slab_bytes=30 * 3 * 8,  # one frame per slab
    )
    np.testing.assert_array_equal(S2, S)
    np.testing.assert_array_equal(raw2, raw_diff)

    # f64 input keeps the CANONICAL dtype — exactly what jnp.asarray
    # would produce (f64 under x64, f32 otherwise).  Hard-casting to f32
    # broke the mesh-CLI artefact parity (reduction-order diffs surfaced
    # at the f32 cancellation floor; test_runall_streamed_ct_mesh_cli).
    raw64, S64 = orient.bond_obs_host(
        frames.astype(np.float64), ref, idx_h, idx_x, w
    )
    want_dtype = jax.dtypes.canonicalize_dtype(np.float64)
    assert raw64.dtype == want_dtype and S64.dtype == want_dtype
