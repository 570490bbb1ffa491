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


@pytest.mark.parametrize("solver", [SolverType.ORTHO_QUATERNION,
                                    SolverType.ORTHO_EULER_ALL_DOF])
def test_pose_estimation_synthetic(solver):
    ds = synthetic.generate_dataset(synthetic.sphere_cloud(300), num_views=6, seed=0)
    config = ReconstructionConfig(solver=solver)
    res = incremental.run_pose_estimation(ds.tracks, 2048.0, 2048.0, config,
                                          verbose=False)
    assert res.present.all()
    ang, pos = metrics.pose_errors(res.cameras, ds.gt_cameras)
    assert ang.max() < 2.0, ang
    assert pos.max() < 0.05, pos
