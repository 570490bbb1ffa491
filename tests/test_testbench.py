"""Testbench harness tests (small grids — the CLI uses the reference's full
101-sample sweep)."""

import os

import numpy as np
import pytest

from orthosfm_tpu.config import SolverType
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.testbench import full_pipeline, synthetic_tests


@pytest.mark.slow
def test_noise_sweep_small():
    results = synthetic_tests.run_noise_sweep(
        datasets=("Sphere",),
        solvers=(SolverType.ORTHO_QUATERNION,),
        noise_levels=(0.0, 2.0),
        num_views=6,
        max_tracks=300,
        verbose=False,
    )
    assert len(results) == 2
    clean = results[0]
    assert not clean.failed
    assert clean.mean_angular_error_deg < 1.0
    noisy = results[1]
    assert noisy.mean_angular_error_deg < 5.0


def test_sweep_csv(tmp_path):
    entries = [synthetic_tests.SweepEntry("Cube", "Q", 0.0, 0.1, 0.02, 0.001)]
    path = str(tmp_path / "out.csv")
    synthetic_tests.save_results(entries, path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("dataset,solver,noise_px")
    assert lines[1].startswith("Cube,Q,0.0,0.1,")


def test_references_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    gt = cam_mod.make_euler(np.arange(4), 256, 256,
                            angles=rng.uniform(-0.6, 0.6, (4, 3)))
    names = [f"v{i}.png" for i in range(4)]
    path = str(tmp_path / "references.txt")
    full_pipeline.write_references(path, gt, names)
    refs = full_pipeline.load_references(path)
    assert [r.name for r in names and refs] == names
    R_gt = np.asarray(cam_mod.basis(gt), np.float64)
    o_gt = np.einsum("vij,j->vi", R_gt, [0, 0, -10.0])
    for i, r in enumerate(refs):
        np.testing.assert_allclose(r.rotation_matrix, R_gt[i], atol=1e-4)
        np.testing.assert_allclose(r.position, o_gt[i], atol=1e-4)


def test_results_csv_schema(tmp_path):
    results = [full_pipeline.FullPipelineResult(
        "DS", "Quaternion", 1.0, 0.5, 0.01, 0.005, 12.0, 8.0)]
    path = str(tmp_path / "results.csv")
    full_pipeline.save_results_csv(results, path)
    content = open(path).read()
    assert "Mean Angular Error [deg];DS;1.000000" in content
    assert "Mean Pose Runtime [s];DS;8.000000" in content
