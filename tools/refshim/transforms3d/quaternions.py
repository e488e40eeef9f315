import math

import numpy as np


def qeye():
    return np.array([1.0, 0.0, 0.0, 0.0])


def qnorm(q):
    return np.dot(q, q)


def qisunit(q):
    return np.allclose(qnorm(q), 1.0)


def qconjugate(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def qinverse(q):
    return qconjugate(q) / qnorm(q)


def qmult(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ]
    )


def nearly_equivalent(q1, q2, rtol=1e-5, atol=1e-8):
    q1 = np.asarray(q1)
    q2 = np.asarray(q2)
    return np.allclose(q1, q2, rtol, atol) or np.allclose(q1, -q2, rtol, atol)


def axangle2quat(vector, theta, is_normalized=False):
    vector = np.asarray(vector, dtype=float)
    if not is_normalized:
        n = math.sqrt(np.dot(vector, vector))
        if n > 0:
            vector = vector / n
    t2 = theta / 2.0
    st2 = math.sin(t2)
    return np.concatenate(([math.cos(t2)], vector * st2))


def quat2mat(q):
    w, x, y, z = q
    Nq = w * w + x * x + y * y + z * z
    if Nq < np.finfo(float).eps:
        return np.eye(3)
    s = 2.0 / Nq
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    return np.array(
        [
            [1.0 - (yY + zZ), xY - wZ, xZ + wY],
            [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
            [xZ - wY, yZ + wX, 1.0 - (xX + yY)],
        ]
    )


def mat2quat(M):
    # Bar-Itzhack / eigenvector method: robust for any proper rotation.
    M = np.asarray(M, dtype=float)
    Qxx, Qyx, Qzx = M[0, 0], M[0, 1], M[0, 2]
    Qxy, Qyy, Qzy = M[1, 0], M[1, 1], M[1, 2]
    Qxz, Qyz, Qzz = M[2, 0], M[2, 1], M[2, 2]
    K = (
        np.array(
            [
                [Qxx - Qyy - Qzz, 0, 0, 0],
                [Qyx + Qxy, Qyy - Qxx - Qzz, 0, 0],
                [Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, 0],
                [Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def rotate_vector(v, q, is_normalized=True):
    q = np.asarray(q, dtype=float)
    if not is_normalized:
        q = q / math.sqrt(qnorm(q))
    varr = np.asarray(v, dtype=float)
    qv = q[1:]
    a = np.cross(qv, varr) + q[0] * varr
    b = np.cross(qv, a)
    return varr + 2 * b
