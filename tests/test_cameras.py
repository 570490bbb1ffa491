"""Tests for core camera math against the reference formulas
(OrthographicCamera.cpp, OrthoQuaternionCamera.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orthosfm_tpu.config import SolverType
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.core import quaternions as quat


def _ref_spherical_matrix(phi, theta, roll):
    """Direct NumPy transcription of the reference formula
    (OrthographicCamera.cpp:78-95) for cross-checking."""
    omega = theta + 0.5 * np.pi
    Ry = np.array([[np.cos(roll), -np.sin(roll), 0], [np.sin(roll), np.cos(roll), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(omega), -np.sin(omega)], [0, np.sin(omega), np.cos(omega)]])
    Rz = np.array([[np.cos(phi), -np.sin(phi), 0], [np.sin(phi), np.cos(phi), 0], [0, 0, 1]])
    return (Rz @ Rx) @ Ry


C = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])


def _ref_project(phi, theta, roll, offx, offy, scale, w, h, p):
    S = _ref_spherical_matrix(phi, theta, roll)
    local = S.T @ C @ p
    x = w * (((local[0] / scale) - offx) / -2 + 0.5)
    y = h * (((local[1] / scale) - offy) / -2 + 0.5)
    return np.array([x, y])


def test_spherical_matrix_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(10):
        phi, theta, roll = rng.uniform(-np.pi, np.pi, 3)
        ours = cam_mod.spherical_matrix(jnp.array([phi, theta, roll]))
        np.testing.assert_allclose(ours, _ref_spherical_matrix(phi, theta, roll), atol=1e-5)


def test_projection_matches_reference():
    rng = np.random.default_rng(1)
    angles = rng.uniform(-1.0, 1.0, (4, 3))
    cams = cam_mod.make_euler(np.arange(4), 640, 480, angles=angles)
    pts = rng.uniform(-1, 1, (7, 3))
    pts4 = np.concatenate([pts, np.ones((7, 1))], axis=-1)
    pix = cam_mod.project(cams, jnp.asarray(pts4, jnp.float32))
    for v in range(4):
        for t in range(7):
            expect = _ref_project(*angles[v], 0.0, 0.0, 1.0, 640, 480, pts[t])
            np.testing.assert_allclose(pix[v, t], expect, atol=2e-2)


def test_euler_quaternion_projection_agree():
    """A quaternion camera built from the Euler camera's basis projects identically."""
    rng = np.random.default_rng(2)
    angles = rng.uniform(-1.0, 1.0, (5, 3))
    e = cam_mod.make_euler(np.arange(5), 1024, 768, angles=angles)
    q = cam_mod.make_quaternion(np.arange(5), 1024, 768, q=quat.from_matrix(cam_mod.basis(e)))
    pts4 = jnp.asarray(np.concatenate([rng.uniform(-1, 1, (9, 3)), np.ones((9, 1))], -1), jnp.float32)
    np.testing.assert_allclose(cam_mod.project(e, pts4), cam_mod.project(q, pts4), atol=1e-3)


def test_basis_angle_roundtrip():
    rng = np.random.default_rng(3)
    angles = np.stack(
        [rng.uniform(-np.pi, np.pi, 6), rng.uniform(-1.2, 1.2, 6), rng.uniform(-np.pi, np.pi, 6)], -1
    )
    cams = cam_mod.make_euler(np.arange(6), 100, 100, angles=angles)
    b = cam_mod.basis(cams)
    rec = cam_mod.basis_to_phi_theta_roll(b)
    cams2 = cam_mod.make_euler(np.arange(6), 100, 100, angles=rec)
    np.testing.assert_allclose(cam_mod.basis(cams2), b, atol=1e-4)


def test_pixel_plane_roundtrip():
    """Unprojecting a projected point and reprojecting the plane point is identity."""
    rng = np.random.default_rng(4)
    angles = rng.uniform(-1, 1, (3, 3))
    cams = cam_mod.make_euler(np.arange(3), 512, 512, angles=angles,
                              offset=rng.uniform(-0.1, 0.1, (3, 2)),
                              scale=rng.uniform(0.8, 1.2, (3,)))
    pix = jnp.asarray(rng.uniform(0, 512, (3, 8, 2)), jnp.float32)
    plane = cam_mod.pixel_to_plane_point(cams, pix)
    pts4 = jnp.concatenate([plane, jnp.ones_like(plane[..., :1])], -1)
    # project each camera's own plane points
    for v in range(3):
        single = cam_mod.take(cams, np.array([v]))
        repix = cam_mod.project(single, pts4[v])[0]
        np.testing.assert_allclose(repix, pix[v], atol=3e-2)


def test_origin_distance():
    cams = cam_mod.make_euler(np.arange(2), 10, 10, angles=np.random.default_rng(5).uniform(-1, 1, (2, 3)))
    o = cam_mod.origins(cams)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(o), axis=-1), 10.0, atol=1e-4)


def test_normalize_scene_identity_first_cam():
    rng = np.random.default_rng(6)
    for kind in ("euler", "quat"):
        angles = rng.uniform(-1, 1, (4, 3))
        e = cam_mod.make_euler(np.arange(4), 64, 64, angles=angles)
        cams = e if kind == "euler" else cam_mod.make_quaternion(
            np.arange(4), 64, 64, q=quat.from_matrix(cam_mod.basis(e))
        )
        normed = cam_mod.normalize_scene(cams)
        np.testing.assert_allclose(cam_mod.basis(normed)[0], np.eye(3), atol=1e-4)
        # Relative rotations preserved
        b0, b1 = cam_mod.basis(cams), cam_mod.basis(normed)
        rel0 = np.asarray(b0[1]).T @ np.asarray(b0[2])
        rel1 = np.asarray(b1[1]).T @ np.asarray(b1[2])
        np.testing.assert_allclose(rel0, rel1, atol=1e-4)


def test_retract_free_mask():
    cams = cam_mod.make_euler(np.arange(3), 64, 64,
                              solver=SolverType.ORTHO_EULER_HORIZONTAL_VERTICAL)
    mask = np.asarray(cam_mod.free_mask(cams))
    assert mask[0].tolist() == [True, True, False, False, False, False]
    cams = cams.replace(fixed=jnp.array([True, False, False]))
    mask = np.asarray(cam_mod.free_mask(cams))
    assert not mask[0].any()

    q = cam_mod.make_quaternion(np.arange(3), 64, 64)
    mask = np.asarray(cam_mod.free_mask(q))
    assert mask[0].tolist() == [True, True, True, True, True, False]

    delta = jnp.ones((3, 6)) * 0.01
    moved = cam_mod.retract(q, delta)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(moved.rot), axis=-1), 1.0, atol=1e-5)


def test_quat_helpers():
    rng = np.random.default_rng(7)
    a = quat.normalize(jnp.asarray(rng.normal(size=(5, 4))))
    b = quat.normalize(jnp.asarray(rng.normal(size=(5, 4))))
    # from_to: a ⊗ (a→b) = ±b
    ft = quat.from_to_rotation(a, b)
    ab = quat.multiply(a, ft)
    d = np.abs(np.sum(np.asarray(ab) * np.asarray(b), axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # matrix roundtrip
    m = quat.to_matrix(a)
    a2 = quat.from_matrix(m)
    d = np.abs(np.sum(np.asarray(a) * np.asarray(a2), axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # angular distance of q vs -q is 0
    np.testing.assert_allclose(quat.angular_distance(a, -a), 0.0, atol=1e-5)
