"""Triangulation + synthetic dataset round-trip tests."""

import numpy as np
import jax.numpy as jnp

from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.data import synthetic, tracks as tracks_mod
from orthosfm_tpu.ops import triangulate


def test_intersect_rays_simple():
    # Two orthogonal rays through (1, 2, 3)
    origins = jnp.array([[[1.0, 2.0, 0.0], [0.0, 2.0, 3.0], [0.0, 0.0, 0.0]]])
    dirs = jnp.array([[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    mask = jnp.array([[True, True, False]])
    pts, valid = triangulate.intersect_rays(origins, dirs, mask)
    assert bool(valid[0])
    np.testing.assert_allclose(pts[0], [1.0, 2.0, 3.0], atol=1e-5)

    # Single ray → invalid
    mask1 = jnp.array([[True, False, False]])
    _, valid1 = triangulate.intersect_rays(origins, dirs, mask1)
    assert not bool(valid1[0])


def test_synthetic_roundtrip_triangulation():
    """GT cameras + perfect tracks must triangulate back to the original cloud."""
    ds = synthetic.generate_dataset("Sphere", num_views=8, seed=1)
    cams = ds.gt_cameras
    cols = np.arange(8)
    ts = triangulate.triangulate_tracks(cams, ds.tracks, cols, reset_existing=True)
    assert bool(jnp.all(ts.has_point == ts.alive))
    pts = np.asarray(ts.points[np.asarray(ts.alive)])[:, :3]
    cloud = synthetic.CLOUDS["Sphere"]() / 3.0
    np.testing.assert_allclose(pts, cloud, atol=5e-3)


def test_synthetic_reprojection_zero():
    ds = synthetic.generate_dataset("Cube", num_views=6, seed=2)
    ts = triangulate.triangulate_tracks(ds.gt_cameras, ds.tracks, np.arange(6))
    pix = cam_mod.project(ds.gt_cameras, ts.points)  # (V, T, 2)
    err = jnp.linalg.norm(jnp.transpose(pix, (1, 0, 2)) - ts.obs, axis=-1)
    masked_err = jnp.where(ts.obs_mask & ts.alive[:, None], err, 0.0)
    assert float(jnp.max(masked_err)) < 0.1  # pixels, f32 tolerance at 2048²


def test_track_filtering_masks():
    ds = synthetic.generate_dataset("Cube", num_views=4, seed=3)
    ts = ds.tracks
    # knock out view 2 of the first 10 tracks
    ts = ts.replace(obs_mask=ts.obs_mask.at[:10, 2].set(False))
    full = tracks_mod.full_size_mask(ts, np.array([0, 1, 2]))
    assert not bool(full[:10].any())
    assert bool(full[10:][np.asarray(ts.alive[10:])].all())
    shared = tracks_mod.shared_mask(ts, np.array([0, 2]))
    assert not bool(shared[:10].any())
