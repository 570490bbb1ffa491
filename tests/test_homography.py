"""Homography RANSAC (CudaSift-path equivalent) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orthosfm_tpu.ops import ransac_h


def test_homography_recovery():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.02, 0.05, 12.0], [-0.03, 0.98, -7.0], [1e-5, -2e-5, 1.0]])
    n = 300
    p1 = rng.uniform(0, 1000, (n, 2))
    x1 = np.concatenate([p1, np.ones((n, 1))], -1)
    q = x1 @ H_true.T
    p2 = q[:, :2] / q[:, 2:3]
    # 30% outliers
    bad = rng.choice(n, 90, replace=False)
    p2c = p2.copy()
    p2c[bad] += rng.uniform(-200, 200, (90, 2))

    res = ransac_h.find_homography(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2c, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(1), iterations=2000)
    inl = np.asarray(res.inliers)
    good = ~np.isin(np.arange(n), bad)
    assert inl[good].mean() > 0.95
    assert inl[bad].mean() < 0.1
    H = np.asarray(res.homography)
    H = H / H[2, 2]
    np.testing.assert_allclose(H, H_true, atol=0.5)


def test_even_odd_ba():
    from orthosfm_tpu.core import cameras as cam_mod, quaternions as quat
    from orthosfm_tpu.data import synthetic
    from orthosfm_tpu.ops import triangulate
    from orthosfm_tpu.solvers import ba

    ds = synthetic.generate_dataset(synthetic.sphere_cloud(200), num_views=4, seed=0)
    rng = np.random.default_rng(1)
    pert = np.asarray(ds.gt_cameras.rot[:, :3]) + np.deg2rad(
        rng.uniform(-1, 1, (4, 3))).astype(np.float32)
    e = cam_mod.make_euler(np.arange(4), 2048, 2048, angles=pert)
    cams = cam_mod.make_quaternion(np.arange(4), 2048, 2048,
                                   q=quat.from_matrix(cam_mod.basis(e)))
    cams = cams.replace(fixed=jnp.zeros(4, bool).at[0].set(True))
    ts = triangulate.triangulate_tracks(cams, ds.tracks, np.arange(4))
    mask = ts.obs_mask & ts.alive[:, None] & ts.has_point[:, None]
    res = ba.run_even_odd(cams, ts.points, ts.obs, mask)
    assert float(res.cost) < float(res.initial_cost) * 1e-2
    # original fixed flags restored
    np.testing.assert_array_equal(np.asarray(res.cams.fixed), [True, False, False, False])
