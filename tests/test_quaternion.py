"""Unit tests for core quaternion ops against independent numpy references.

The expected values are computed with standalone numpy implementations of
textbook quaternion algebra (scalar-first Hamilton convention), mirroring
the semantics of the reference's transforms3d_supplement.py (double-cover
reduction, frame-transform-min, SIMD vector rotation).
"""

import numpy as np
import pytest

from spinrelax_tpu.core import quaternion as q


def np_qmult(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ]
    )


def np_rotate(v, quat):
    w, x, y, z = quat
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return R @ v


def random_unit_quats(rng, n):
    x = rng.normal(size=(n, 4))
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_qmult_matches_numpy(rng):
    qa = random_unit_quats(rng, 50)
    qb = random_unit_quats(rng, 50)
    got = np.asarray(q.qmult(qa, qb))
    want = np.stack([np_qmult(a, b) for a, b in zip(qa, qb)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_qmult_broadcasts(rng):
    qa = random_unit_quats(rng, 10).reshape(2, 5, 4)
    qb = random_unit_quats(rng, 1)[0]
    got = np.asarray(q.qmult(qa, qb))
    want = np.stack(
        [np_qmult(a, qb) for a in qa.reshape(10, 4)]
    ).reshape(2, 5, 4)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotation_matches_matrix(rng):
    quats = random_unit_quats(rng, 30)
    vecs = rng.normal(size=(30, 3))
    got = np.asarray(q.rotate_vector(vecs, quats))
    want = np.stack([np_rotate(v, qq) for v, qq in zip(vecs, quats)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotation_broadcast_one_quat(rng):
    quat = random_unit_quats(rng, 1)[0]
    vecs = rng.normal(size=(4, 7, 3))
    got = np.asarray(q.rotate_vector(vecs, quat))
    want = np.stack(
        [np_rotate(v, quat) for v in vecs.reshape(-1, 3)]
    ).reshape(4, 7, 3)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_conjugate_inverts_rotation(rng):
    quats = random_unit_quats(rng, 20)
    vecs = rng.normal(size=(20, 3))
    roundtrip = q.rotate_vector(q.rotate_vector(vecs, quats), q.qconj(quats))
    np.testing.assert_allclose(np.asarray(roundtrip), vecs, atol=1e-12)


def test_qreduce_signs(rng):
    quats = random_unit_quats(rng, 100)
    red = np.asarray(q.qreduce(quats))
    assert np.all(red[:, 0] >= 0)
    # Reduction preserves the rotation (q and -q are the same rotation).
    vecs = rng.normal(size=(100, 3))
    np.testing.assert_allclose(
        np.asarray(q.rotate_vector(vecs, red)),
        np.asarray(q.rotate_vector(vecs, quats)),
        atol=1e-12,
    )


def test_quat_v1v2_rotates_correctly(rng):
    v1 = rng.normal(size=(40, 3))
    v2 = rng.normal(size=(40, 3))
    v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
    v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
    quat = q.quat_v1v2(v1, v2)
    got = np.asarray(q.rotate_vector(v1, quat))
    np.testing.assert_allclose(got, v2, atol=1e-8)


def test_quat_v1v2_identical_vectors():
    v = np.array([0.0, 0.0, 1.0])
    quat = np.asarray(q.quat_v1v2(v, v))
    np.testing.assert_allclose(quat, [1.0, 0, 0, 0], atol=1e-12)


def test_mat_quat_roundtrip(rng):
    quats = np.asarray(q.qreduce(random_unit_quats(rng, 60)))
    mats = np.asarray(q.quat_to_mat(quats))
    back = np.asarray(q.mat_to_quat(mats))
    np.testing.assert_allclose(back, quats, atol=1e-9)


def test_mat_to_quat_handles_180_rotations():
    # w ~ 0 cases exercise the non-trace pivots.
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0
        quat = np.asarray(q.mat_to_quat(R))
        R2 = np.asarray(q.quat_to_mat(quat))
        np.testing.assert_allclose(R2, R, atol=1e-9)


def test_frame_transform_min_maps_axes_to_lab(rng):
    # Build a random right-handed orthonormal frame.
    quats = random_unit_quats(rng, 25)
    frames = np.asarray(q.quat_to_mat(quats))  # rows are rotated lab axes?
    # rows of R are the lab-frame coordinates of the rotated basis vectors
    # when we apply R to e_i; take axes as rows.
    for R in frames:
        axes = R.T  # columns of R are images of lab axes; rows of axes
        qf = np.asarray(q.frame_transform_min(axes))
        rotated = np.asarray(q.rotate_vector(axes, qf[None, :]))
        # Each axis must land on +-lab axis, with the diagonal structure.
        target = np.abs(rotated)
        np.testing.assert_allclose(target, np.eye(3), atol=1e-7)


def test_frame_transform_min_prefers_small_rotation():
    # For a frame very close to identity, the min transform should be ~identity
    eps = 1e-3
    axes = np.eye(3) + eps * np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 0]])
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    qf = np.asarray(q.frame_transform_min(axes))
    assert qf[0] > 0.999


def test_axangle_quat(rng):
    ax = np.array([0.0, 0.0, 1.0])
    th = np.pi / 2
    quat = np.asarray(q.axangle_to_quat(ax, th))
    got = np.asarray(q.rotate_vector(np.array([1.0, 0, 0]), quat))
    np.testing.assert_allclose(got, [0, 1, 0], atol=1e-12)


def test_vecnorm_zero_safe():
    v = np.array([[0.0, 0.0, 0.0], [3.0, 4.0, 0.0]])
    got = np.asarray(q.vecnorm(v))
    np.testing.assert_allclose(got[0], [0, 0, 0])
    np.testing.assert_allclose(got[1], [0.6, 0.8, 0.0])


def test_slerp_endpoints(rng):
    qa, qb = random_unit_quats(rng, 2)
    qa = np.asarray(q.qreduce(qa))
    qb = np.asarray(q.qreduce(qb))
    np.testing.assert_allclose(np.asarray(q.slerp(qa, qb, 0.0)), qa, atol=1e-9)
    np.testing.assert_allclose(np.asarray(q.slerp(qa, qb, 1.0)), qb, atol=1e-9)
