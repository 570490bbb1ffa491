"""Mask filtering, color propagation and restricted-DoF solver coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from orthosfm_tpu.config import ReconstructionConfig, SolverType
from orthosfm_tpu.data import synthetic, tracks as tracks_mod
from orthosfm_tpu.data.views import View
from orthosfm_tpu.pipeline import incremental, track_utils
from orthosfm_tpu.testbench import metrics


def _views_with_images(n, w, h):
    views = []
    for i in range(n):
        v = View(i, f"v{i}.png")
        v.width, v.height = w, h
        v.pixels = np.full((h, w, 3), 100 + i, np.uint8)
        views.append(v)
    return views


def test_mask_filtering_drops_masked_tracks():
    track_list = [
        [(0, 0, 0, 10.0, 10.0, 0, 0, 0), (1, 0, 1, 12.0, 12.0, 0, 0, 0)],
        [(0, 1, 2, 90.0, 90.0, 0, 0, 0), (1, 1, 3, 92.0, 92.0, 0, 0, 0)],
    ]
    ts = tracks_mod.from_feature_lists(track_list, np.arange(2))
    views = _views_with_images(2, 100, 100)
    # Mask on view 0: left half kept (bright), right half masked out (dark)
    mask = np.zeros((100, 100), np.uint8)
    mask[:, :50] = 255
    views[0].mask = mask
    out = track_utils.filter_tracks_with_masks(ts, views)
    alive = np.asarray(out.alive)
    assert alive[0] and not alive[1]

    # No masks → untouched
    views[0].mask = None
    out2 = track_utils.filter_tracks_with_masks(ts, views)
    assert np.asarray(out2.alive).sum() == 2


def test_color_propagation_samples_images():
    track_list = [[(0, 0, 0, 5.0, 5.0, 0, 0, 0), (1, 0, 1, 6.0, 6.0, 0, 0, 0)]]
    ts = tracks_mod.from_feature_lists(track_list, np.arange(2))
    views = _views_with_images(2, 32, 32)
    out = track_utils.propagate_colors(ts, views)
    colors = np.asarray(out.colors)
    assert (colors[0, 0] == 100).all()
    assert (colors[0, 1] == 101).all()


@pytest.mark.parametrize("solver", [SolverType.ORTHO_EULER_HORIZONTAL,
                                    SolverType.ORTHO_EULER_HORIZONTAL_VERTICAL])
def test_restricted_dof_solvers(solver):
    """Restricted solvers on a scene matching their assumptions: a flat ring
    (theta = roll = 0) must be recovered by the 1-DoF solver."""
    gt = synthetic.generate_gt_cameras(num_views=6, theta_range=0.0,
                                       roll_range=0.0, seed=0)
    cloud = synthetic.sphere_cloud(300)
    ds = synthetic.generate_dataset(cloud, num_views=6, seed=0)
    # Rebuild tracks with the flat-ring cameras
    import orthosfm_tpu.core.cameras as cam_mod

    pts4 = jnp.concatenate([jnp.asarray(cloud / 3.0, jnp.float32),
                            jnp.ones((300, 1), jnp.float32)], -1)
    pix = jnp.transpose(cam_mod.project(gt, pts4), (1, 0, 2))
    ts = ds.tracks.replace(obs=ds.tracks.obs.at[:300].set(pix))

    config = ReconstructionConfig(solver=solver)
    res = incremental.run_pose_estimation(ts, 2048.0, 2048.0, config, verbose=False)
    ang, pos = metrics.pose_errors(res.cameras, gt)
    assert ang.max() < 2.0, ang
    # Fixed angles stay exactly zero for the restricted solver
    angles = np.asarray(res.cameras.rot[:, :3])
    if solver == SolverType.ORTHO_EULER_HORIZONTAL:
        np.testing.assert_allclose(angles[:, 1:], 0.0, atol=1e-6)
    else:
        np.testing.assert_allclose(angles[:, 2], 0.0, atol=1e-6)
