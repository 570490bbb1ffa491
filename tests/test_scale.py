"""Large-problem scaling: track counts well beyond the reference's typical
working set must flow through BA, triangulation and the outlier filters
without truncation (the reference handles arbitrary std::vector sizes,
src/util/common.cpp:73-139; CudaSift alone allows 32768 features/view,
src/matching/matching.h:24)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orthosfm_tpu.config import BundleAdjustConfig, FilterConfig
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.core import quaternions as quat
from orthosfm_tpu.data import synthetic
from orthosfm_tpu.ops import outliers, triangulate
from orthosfm_tpu.solvers import ba


@pytest.mark.slow
def test_ba_and_filters_at_65k_tracks():
    n_points, num_views = 66_000, 8
    ds = synthetic.generate_dataset(synthetic.sphere_cloud(n_points),
                                    num_views=num_views, seed=0,
                                    width=2048, height=2048)
    assert int(ds.tracks.count()) == n_points  # nothing dropped anywhere

    rng = np.random.default_rng(1)
    pert = np.asarray(ds.gt_cameras.rot[:, :3]) + np.deg2rad(
        rng.uniform(-1.0, 1.0, (num_views, 3))).astype(np.float32)
    e = cam_mod.make_euler(np.arange(num_views), 2048.0, 2048.0, angles=pert)
    cams = cam_mod.make_quaternion(np.arange(num_views), 2048.0, 2048.0,
                                   q=quat.from_matrix(cam_mod.basis(e)))
    cams = cams.replace(fixed=jnp.zeros(num_views, bool).at[0].set(True))

    ts = triangulate.triangulate_tracks(cams, ds.tracks, np.arange(num_views))
    assert int(jnp.sum(ts.has_point)) == n_points
    mask = ts.obs_mask & ts.alive[:, None] & ts.has_point[:, None]

    cfg = BundleAdjustConfig(max_iterations=5, function_tolerance=0.0)
    res = ba.run(cams, ts.points, ts.obs, mask, optimize_points=True, config=cfg)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) < float(res.initial_cost)
    assert res.points.shape[0] == ts.capacity

    # Chunked NN outlier filter must keep the (clean) cloud intact
    filtered = outliers.filter_outlier_tracks(
        ts.replace(points=res.points / res.points[:, 3:4]), FilterConfig())
    kept = int(jnp.sum(filtered.alive))
    assert kept > 0.95 * n_points


def test_chunked_nn_matches_dense():
    rng = np.random.default_rng(0)
    T = 700  # deliberately not a multiple of the chunk size
    pts = jnp.asarray(rng.normal(size=(T, 4)).astype(np.float32))
    has_pt = jnp.asarray(rng.random(T) < 0.8)
    nn = outliers.nearest_neighbor_distances(pts, has_pt)

    p = np.asarray(pts)
    d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    d[:, ~np.asarray(has_pt)] = np.inf
    expect = np.where(np.asarray(has_pt), d.min(axis=1), 0.0)
    np.testing.assert_allclose(np.asarray(nn), expect, rtol=1e-3, atol=1e-3)
