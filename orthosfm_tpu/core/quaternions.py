"""Quaternion utilities (w, x, y, z convention, scalar-first).

Pure jnp functions; everything broadcasts over leading batch dimensions.
Replaces the reference's use of Eigen::Quaternion (e.g.
src/algorithms/orthographic_quaternion/OrthoQuaternionCamera.cpp:14-83).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def multiply(a, b):
    """Hamilton product a ⊗ b, both (..., 4) scalar-first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def to_matrix(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), scalar-first.

    Branch-free (for vmap/jit): computes all four candidate extractions and
    selects the numerically best by the largest pivot.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its own pivot 4q_i^2 = 1 + 2 m_ii - tr (or 1+tr)
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], -2)  # (..., 4cand, 4)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    return normalize(q[..., 0, :])


def exp_map(delta):
    """Angle-axis tangent (..., 3) -> unit quaternion, matching Ceres
    EigenQuaternionParameterization::Plus step construction.

    Differentiable at delta = 0 (where BA evaluates the Jacobian): both the
    Taylor and exact branches are computed on safe inputs so no NaN gradients
    leak through the `where`.
    """
    a2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    small = a2 < 1e-12
    safe_a2 = jnp.where(small, 1.0, a2)
    angle = jnp.sqrt(safe_a2)
    k = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(0.5 * angle) / angle)
    w = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(0.5 * angle))
    return jnp.concatenate([w, k * delta], axis=-1)


def from_to_rotation(q_from, q_to):
    """Relative rotation from⁻¹ ⊗ to, normalized (reference:
    OrthoQuaternionCamera.cpp:34-43, citing Bianco et al. eq. 4)."""
    return normalize(multiply(conjugate(normalize(q_from)), normalize(q_to)))


def slerp(q0, q1, t):
    """Spherical linear interpolation (reference uses Eigen slerp at
    OrthoQuaternionRecoAlgorithm.cpp:100)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def angular_distance(q0, q1):
    """Angle in radians between two rotations (Eigen angularDistance analog,
    used for eval metrics; reference: full_pipeline_tests.cpp:281)."""
    rel = multiply(conjugate(normalize(q0)), normalize(q1))
    vec_norm = jnp.linalg.norm(rel[..., 1:], axis=-1)
    return 2.0 * jnp.arctan2(vec_norm, jnp.abs(rel[..., 0]))
