"""Hermetic full-pipeline integration test: rendered images → SIFT →
matching → tracks → incremental poses → artifacts (the reference's
full-pipeline testbench analog, self-contained)."""

import os

import numpy as np
import pytest

from orthosfm_tpu.config import ReconstructionConfig, SolverType
from orthosfm_tpu.io import cameras_io, project as project_io, timing
from orthosfm_tpu.pipeline.reconstruct import reconstruct
from orthosfm_tpu.testbench import metrics, render


@pytest.mark.slow
def test_reconstruct_from_images(tmp_path):
    images = str(tmp_path / "images")
    proj = str(tmp_path / "project")
    gt = render.make_image_dataset(images, num_views=5, width=224, height=224,
                                   seed=3, ring_degrees=100)
    project_io.create_project(proj)
    cfg = ReconstructionConfig(project_folder=proj, image_folder=images,
                               solver=SolverType.ORTHO_QUATERNION)
    res, views = reconstruct(cfg, verbose=False)

    assert res.present.all()
    ang, pos = metrics.pose_errors(res.cameras, gt)
    assert ang.max() < 3.0, ang
    assert pos.max() < 0.06, pos

    # All reference artifacts must exist
    for name in ("cameras.txt", "sparse_cloud.ply", "tracks.txt",
                 "time_measurements.txt"):
        assert os.path.isfile(os.path.join(proj, name)), name
    cams = cameras_io.import_cameras(os.path.join(proj, "cameras.txt"))
    assert len(cams) == 5
    m = timing.load_runtimes(os.path.join(proj, "time_measurements.txt"))
    assert m.total_time > 0
