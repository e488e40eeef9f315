"""Property-based tests of the quaternion algebra (hypothesis).

Checks the algebraic laws the rest of the pipeline silently relies on
(associativity, conjugate anti-homomorphism, rotation isometry,
matrix round-trips) on randomly generated inputs rather than fixtures.
"""

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra.numpy import arrays

import jax.numpy as jnp

from spinrelax_tpu.core import quaternion as qt

SETTINGS = dict(max_examples=15, deadline=None)

finite = st.floats(-10.0, 10.0, allow_nan=False, allow_infinity=False)


def _unit_quats(draw, n):
    raw = draw(
        arrays(np.float64, (n, 4), elements=finite).filter(
            lambda a: np.all(np.linalg.norm(a, axis=-1) > 1e-3)
        )
    )
    return raw / np.linalg.norm(raw, axis=-1, keepdims=True)


quat_batch = st.composite(lambda draw, n=3: _unit_quats(draw, n))
vec3 = arrays(np.float64, (3,), elements=finite).filter(
    lambda v: np.linalg.norm(v) > 1e-3
)


@settings(**SETTINGS)
@given(quat_batch(), quat_batch(), quat_batch())
def test_qmult_associative(a, b, c):
    ab_c = qt.qmult(qt.qmult(jnp.asarray(a), jnp.asarray(b)), jnp.asarray(c))
    a_bc = qt.qmult(jnp.asarray(a), qt.qmult(jnp.asarray(b), jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(ab_c), np.asarray(a_bc), atol=1e-12)


@settings(**SETTINGS)
@given(quat_batch(), quat_batch())
def test_conj_antihomomorphism(a, b):
    lhs = qt.qconj(qt.qmult(jnp.asarray(a), jnp.asarray(b)))
    rhs = qt.qmult(qt.qconj(jnp.asarray(b)), qt.qconj(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


@settings(**SETTINGS)
@given(quat_batch())
def test_unit_norm_preserved_and_inverse(a):
    q = jnp.asarray(a)
    prod = qt.qmult(q, qt.qconj(q))
    ident = np.zeros((a.shape[0], 4))
    ident[:, 0] = 1.0
    np.testing.assert_allclose(np.asarray(prod), ident, atol=1e-12)


@settings(**SETTINGS)
@given(quat_batch(n=1), vec3)
def test_rotation_isometry_and_matrix_consistency(a, v):
    q = jnp.asarray(a[0])
    rv = np.asarray(qt.rotate_vector(jnp.asarray(v), q, normalised=True))
    np.testing.assert_allclose(np.linalg.norm(rv), np.linalg.norm(v), rtol=1e-12)
    R = np.asarray(qt.quat_to_mat(q))
    np.testing.assert_allclose(rv, R @ v, atol=1e-10)


@settings(**SETTINGS)
@given(quat_batch(n=1))
def test_mat_roundtrip_up_to_sign(a):
    q = jnp.asarray(a[0])
    q2 = np.asarray(qt.mat_to_quat(qt.quat_to_mat(q)))
    dot = abs(float(np.dot(np.asarray(q[..., :]), q2)))
    assert dot > 1 - 1e-10


@settings(**SETTINGS)
@given(quat_batch(n=1))
def test_qreduce_same_rotation_nonneg_w(a):
    q = jnp.asarray(a[0])
    qr = qt.qreduce(q)
    assert float(qr[0]) >= 0
    np.testing.assert_allclose(
        np.asarray(qt.quat_to_mat(qr)), np.asarray(qt.quat_to_mat(q)), atol=1e-12
    )


@settings(**SETTINGS)
@given(vec3, vec3)
def test_quat_v1v2_aligns(v1, v2):
    # Skip near-antiparallel pairs where the rotation axis is degenerate.
    c = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    if c < -0.99:
        return
    q = qt.quat_v1v2(jnp.asarray(v1), jnp.asarray(v2))
    rv = np.asarray(qt.rotate_vector(jnp.asarray(v1), q, normalised=True))
    cos = np.dot(rv, v2) / (np.linalg.norm(rv) * np.linalg.norm(v2))
    assert cos > 1 - 1e-9


@settings(**SETTINGS)
@given(quat_batch(n=1), vec3, st.floats(-np.pi, np.pi))
def test_axangle_matches_rodrigues(a, axis, angle):
    axis = axis / np.linalg.norm(axis)
    q = qt.axangle_to_quat(jnp.asarray(axis), jnp.asarray(angle), normalised=True)
    v = a[0, 1:]  # reuse quaternion tail as an arbitrary vector
    rv = np.asarray(qt.rotate_vector(jnp.asarray(v), q, normalised=True))
    k = axis
    rod = (
        v * np.cos(angle)
        + np.cross(k, v) * np.sin(angle)
        + k * np.dot(k, v) * (1 - np.cos(angle))
    )
    np.testing.assert_allclose(rv, rod, atol=1e-10)


@settings(**SETTINGS)
@given(quat_batch(n=2), st.floats(0.0, 1.0))
def test_slerp_endpoints_and_unit(a, t):
    q1, q2 = jnp.asarray(a[0]), jnp.asarray(a[1])
    s = qt.slerp(q1, q2, jnp.asarray(t))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s)), 1.0, rtol=1e-10)
    s0 = np.asarray(qt.slerp(q1, q2, jnp.asarray(0.0)))
    np.testing.assert_allclose(s0, np.asarray(q1), atol=1e-9)
    # r=1 lands on q2 up to sign (shortest-path convention).
    s1 = np.asarray(qt.slerp(q1, q2, jnp.asarray(1.0)))
    assert abs(float(np.dot(s1, np.asarray(q2)))) > 1 - 1e-9
    # Identical endpoints must return the endpoint, not a zero vector.
    si = np.asarray(qt.slerp(q1, q1, jnp.asarray(t)))
    np.testing.assert_allclose(si, np.asarray(q1), atol=1e-9)
    # Constant angular velocity: angle(q1, s) = t * angle(q1, q2).
    d12 = min(1.0, abs(float(np.dot(np.asarray(q1), np.asarray(q2)))))
    d1s = min(1.0, abs(float(np.dot(np.asarray(q1), s1 if False else np.asarray(s)))))
    np.testing.assert_allclose(np.arccos(d1s), t * np.arccos(d12), atol=1e-7)
