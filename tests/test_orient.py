"""Horn orientation / superposition tests: exact recovery of known
rotations, weighted fits, and noise robustness."""

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
