"""Bundle adjustment solver tests: recovery of perturbed camera poses on
synthetic scenes (both parameterizations)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orthosfm_tpu.config import SolverType
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.core import quaternions as quat
from orthosfm_tpu.data import synthetic
from orthosfm_tpu.ops import triangulate
from orthosfm_tpu.solvers import ba


def _subsample(ts, n, seed=0):
    rng = np.random.default_rng(seed)
    alive_idx = np.flatnonzero(np.asarray(ts.alive))
    keep = rng.choice(alive_idx, size=n, replace=False)
    alive = np.zeros(ts.capacity, bool)
    alive[keep] = True
    return ts.replace(alive=jnp.asarray(alive))


@pytest.mark.parametrize("solver", [SolverType.ORTHO_QUATERNION, SolverType.ORTHO_EULER_ALL_DOF])
def test_ba_recovers_perturbed_cameras(solver):
    ds = synthetic.generate_dataset("Sphere", num_views=6, seed=0)
    ts = _subsample(ds.tracks, 400)
    gt = ds.gt_cameras
    rng = np.random.default_rng(1)

    # Perturb rotations by ~1.5 degrees
    d_angles = np.deg2rad(rng.uniform(-1.5, 1.5, (6, 3))).astype(np.float32)
    pert_angles = np.asarray(gt.rot[:, :3]) + d_angles
    if solver.is_quaternion:
        e = cam_mod.make_euler(np.arange(6), 2048, 2048, angles=pert_angles)
        cams = cam_mod.make_quaternion(np.arange(6), 2048, 2048,
                                       q=quat.from_matrix(cam_mod.basis(e)))
        gt_cmp = cam_mod.make_quaternion(np.arange(6), 2048, 2048,
                                         q=quat.from_matrix(cam_mod.basis(gt)))
    else:
        cams = cam_mod.make_euler(np.arange(6), 2048, 2048, angles=pert_angles, solver=solver)
        gt_cmp = gt
    cams = cams.replace(fixed=jnp.zeros(6, bool).at[0].set(True))
    # Undo perturbation of the fixed camera so gauge matches GT
    if solver.is_quaternion:
        e0 = cam_mod.make_euler(np.arange(1), 2048, 2048, angles=np.asarray(gt.rot[:1, :3]))
        cams = cams.replace(rot=cams.rot.at[0].set(
            quat.from_matrix(cam_mod.basis(e0))[0]))
    else:
        cams = cams.replace(rot=cams.rot.at[0].set(gt.rot[0]))

    ts = triangulate.triangulate_tracks(cams, ts, np.arange(6))
    mask = ts.obs_mask & ts.alive[:, None] & ts.has_point[:, None]

    res = ba.run(cams, ts.points, ts.obs, mask, optimize_points=True)
    assert float(res.cost) < float(res.initial_cost) * 1e-3

    err = ba.reprojection_errors(res.cams, res.points, ts.obs, mask)
    mean_err = float(err.sum() / mask.sum())
    assert mean_err < 0.05, mean_err

    # Angular error vs ground truth after BA should be tiny (gauge pinned by cam 0)
    q_est = quat.from_matrix(cam_mod.basis(res.cams))
    q_gt = quat.from_matrix(cam_mod.basis(gt_cmp))
    ang = np.rad2deg(np.asarray(quat.angular_distance(q_est, q_gt)))
    assert ang.max() < 0.1, ang


def test_ba_fixed_camera_stays_fixed():
    ds = synthetic.generate_dataset("Cube", num_views=4, seed=2)
    ts = _subsample(ds.tracks, 200)
    cams = ds.gt_cameras.replace(fixed=jnp.zeros(4, bool).at[0].set(True))
    rot0 = np.asarray(cams.rot[0]).copy()
    ts = triangulate.triangulate_tracks(cams, ts, np.arange(4))
    noisy = synthetic.add_observation_noise(ts, 1.0, jax.random.PRNGKey(3))
    mask = noisy.obs_mask & noisy.alive[:, None] & noisy.has_point[:, None]
    res = ba.run(cams, noisy.points, noisy.obs, mask)
    np.testing.assert_allclose(np.asarray(res.cams.rot[0]), rot0, atol=1e-7)
    assert int(res.iterations) >= 1


@pytest.mark.parametrize("solver", [SolverType.ORTHO_QUATERNION, SolverType.ORTHO_EULER_ALL_DOF])
def test_analytic_jacobians_match_autodiff(solver):
    """The T-minor analytic Jacobians must agree with jacfwd of the
    retraction-composed residual."""
    ds = synthetic.generate_dataset("Cube", num_views=5, seed=7)
    ts = _subsample(ds.tracks, 64)
    if solver.is_quaternion:
        e = cam_mod.make_euler(np.arange(5), 2048, 2048,
                               angles=np.asarray(ds.gt_cameras.rot[:, :3]))
        cams = cam_mod.make_quaternion(np.arange(5), 2048, 2048,
                                       q=quat.from_matrix(cam_mod.basis(e)))
    else:
        cams = ds.gt_cameras
    ts = triangulate.triangulate_tracks(cams, ts, np.arange(5))
    mask = ts.obs_mask & ts.alive[:, None] & ts.has_point[:, None]
    # Perturb observations so residuals/weights are non-trivial
    obs = ts.obs + 2.5
    p_hat = ts.points / jnp.maximum(
        jnp.linalg.norm(ts.points, axis=-1, keepdims=True), 1e-20)
    p_hat = jnp.where(jnp.any(mask, axis=1)[:, None], p_hat,
                      jnp.array([0.0, 0.0, 0.0, 1.0]))

    r_ref, Jc_ref, Jp_ref, w_ref = ba._residuals_and_jacobians_autodiff(
        cams, p_hat, obs, mask, 1.0)
    blocks = ba._residuals_and_jacobians(
        cams, p_hat.T, jnp.transpose(obs, (1, 2, 0)), mask.T, 1.0)

    np.testing.assert_allclose(np.asarray(jnp.transpose(blocks.r, (2, 0, 1))),
                               np.asarray(r_ref), atol=1e-2)
    np.testing.assert_allclose(np.asarray(jnp.transpose(blocks.Jc, (3, 0, 1, 2))),
                               np.asarray(Jc_ref), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(jnp.transpose(blocks.Jp, (3, 0, 1, 2))),
                               np.asarray(Jp_ref), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(blocks.weight.T), np.asarray(w_ref),
                               atol=1e-5)


def test_point_manifold():
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    p_hat = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    B = ba.point_tangent_basis(p_hat)
    # columns orthonormal and orthogonal to p_hat
    BtB = jnp.einsum("tij,tik->tjk", B, B)
    np.testing.assert_allclose(np.asarray(BtB), np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.einsum("tij,ti->tj", B, p_hat)), 0.0, atol=1e-5)
    p2 = ba.retract_point(p_hat, jnp.zeros((10, 3)))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p_hat), atol=1e-6)
