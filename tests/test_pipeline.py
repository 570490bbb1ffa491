"""End-to-end incremental pose estimation on synthetic tracks (the minimum
end-to-end slice: SURVEY.md §7 steps 1-6)."""

import numpy as np
import pytest

from orthosfm_tpu.config import ReconstructionConfig, SolverType
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.data import synthetic
from orthosfm_tpu.pipeline import grouping, incremental
from orthosfm_tpu.testbench import metrics


def test_build_groups_covers_all_views():
    ds = synthetic.generate_dataset(synthetic.sphere_cloud(100), num_views=7, seed=0)
    inc = np.asarray(ds.tracks.obs_mask) & np.asarray(ds.tracks.alive)[:, None]
    groups = grouping.build_groups(np.arange(7), inc, 3)
    assert groups[0][:2] == [0, 1]
    covered = set()
    for g in groups:
        assert len(g) == 3
        covered.update(g)
    assert covered == set(range(7))
    # Later groups must seed with 2 already-used views
    used = set(groups[0])
    for g in groups[1:]:
        assert len([i for i in g if i in used]) >= 2
        used.update(g)


def test_vectorized_groups_match_reference_loop():
    """The triple-count tensor schedule must reproduce the reference-faithful
    combinatorial loop exactly (same groups, same order) on random track
    incidence structures."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        V = int(rng.integers(4, 11))
        T = int(rng.integers(30, 200))
        inc = rng.random((T, V)) < rng.uniform(0.25, 0.7)
        # ensure every view appears and the first two overlap somewhere
        inc[:V] |= np.eye(V, dtype=bool)
        inc[0, :2] = True
        ids = list(range(V))
        fast = grouping.build_groups(ids, inc, 3)
        slow = grouping._build_groups_generic(ids, inc, 3)
        assert fast == slow, (trial, fast, slow)


def test_grouping_scales_to_many_views():
    """64 views / 20k tracks must schedule in well under a second (the
    reference omp-parallelizes an O(C(used,2)·remaining·tracks) rescan per
    group, group.cpp:118; the tensor schedule is one-shot)."""
    import time

    rng = np.random.default_rng(1)
    V, T = 64, 20000
    centers = rng.integers(0, V, T)
    span = rng.integers(2, 6, T)
    cols = np.arange(V)[None, :]
    inc = (np.abs((cols - centers[:, None] + V // 2) % V - V // 2)
           <= span[:, None])
    t0 = time.monotonic()
    groups = grouping.build_groups(list(range(V)), inc, 3)
    dt = time.monotonic() - t0
    covered = set()
    for g in groups:
        covered.update(g)
    assert covered == set(range(V))
    assert dt < 5.0, f"grouping took {dt:.2f}s"


@pytest.mark.parametrize("solver", [SolverType.ORTHO_QUATERNION,
                                    SolverType.ORTHO_EULER_ALL_DOF])
@pytest.mark.slow
def test_pose_estimation_synthetic(solver):
    ds = synthetic.generate_dataset(synthetic.sphere_cloud(300), num_views=6, seed=0)
    config = ReconstructionConfig(solver=solver)
    res = incremental.run_pose_estimation(ds.tracks, 2048.0, 2048.0, config,
                                          verbose=False)
    assert res.present.all()
    ang, pos = metrics.pose_errors(res.cameras, ds.gt_cameras)
    assert ang.max() < 2.0, ang
    assert pos.max() < 0.05, pos


def test_strict_reference_behavior_disables_init_fallback():
    """config.strict_reference_behavior reproduces the reference's hard-throw
    (tomasi_kanade.cpp:202-205) when the filtered track set starves a group,
    instead of falling back to the pristine pre-filter observations."""
    import dataclasses

    import jax

    from orthosfm_tpu.config import ReconstructionConfig
    from orthosfm_tpu.data import synthetic

    ds = synthetic.generate_dataset(synthetic.sphere_cloud(400), num_views=4,
                                    seed=0)
    pristine = ds.tracks
    # "Filtered" set: the global reprojection filter stripped almost all
    # observations of the group views
    starved = dataclasses.replace(
        pristine, obs_mask=pristine.obs_mask.at[8:].set(False))
    ids = [0, 1, 2]
    kwargs = dict(
        ids=ids, widths=np.full(3, 2048.0), heights=np.full(3, 2048.0),
        solver=SolverType.ORTHO_QUATERNION, key=jax.random.key(0),
        global_cams=None, global_idx_pair=None,
        fallback_tracks=pristine)

    cfg = ReconstructionConfig(project_folder=".", image_folder=".")
    cams = incremental.initial_alignment(starved, config=cfg, **kwargs)
    assert len(cams) == 3  # fallback rescued the group

    strict = dataclasses.replace(cfg, strict_reference_behavior=True)
    with pytest.raises(incremental.TooFewTracksError):
        incremental.initial_alignment(starved, config=strict, **kwargs)


def test_lazy_schedule_matches_dense_tensor():
    """Above DENSE_S3_MAX_VIEWS build_groups switches to the O(V^2)-memory
    lazy schedule; it must reproduce the dense S3 path exactly (same groups,
    same order, same tie resolution) on random incidence structures."""
    rng = np.random.default_rng(3)
    for trial in range(6):
        V = int(rng.integers(5, 14))
        T = int(rng.integers(40, 250))
        inc = rng.random((T, V)) < rng.uniform(0.25, 0.7)
        inc[:V] |= np.eye(V, dtype=bool)
        inc[0, :2] = True
        ids = list(range(V))
        dense = grouping.build_groups(ids, inc, 3)
        lazy = grouping._build_groups_lazy3(ids, inc)
        assert dense == lazy, (trial, dense, lazy)


def test_large_view_counts_use_bounded_memory_schedule(monkeypatch):
    """V just above the dense ceiling routes through the lazy path and still
    produces a complete, valid schedule."""
    monkeypatch.setattr(grouping, "DENSE_S3_MAX_VIEWS", 32)
    rng = np.random.default_rng(4)
    V, T = 40, 4000
    centers = rng.integers(0, V, T)
    span = rng.integers(2, 6, T)
    cols = np.arange(V)[None, :]
    inc = (np.abs((cols - centers[:, None] + V // 2) % V - V // 2)
           <= span[:, None])
    groups = grouping.build_groups(list(range(V)), inc, 3)
    covered = set()
    for g in groups:
        assert len(g) == 3
        covered.update(g)
    assert covered == set(range(V))
