"""Full-pipeline evaluation harness: run the app end-to-end on image datasets
and score against reference camera files.

Reproduces src/testbench/full_pipeline_tests.cpp:381-552: per (dataset, run
configuration, repetition) the CLI app runs as a SUBPROCESS, artifacts are read
back (cameras.txt + time_measurements.txt), the estimated poses are compared to
the dataset's references.txt with coordinate-frame + global-flip normalization
(:113-297), and aggregated metrics go to results.csv (:37-93).

references.txt format (one line per camera):
    imageName;m00;m01;m02;tx;m10;m11;m12;ty;m20;m21;m22;tz[;...]
with the coordinate transform of full_pipeline_tests.cpp:135-158 applied at
load. Datasets can be external (the reference's downloads) or generated
hermetically via testbench.render.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
import sys
from typing import List, Optional, Sequence

import numpy as np

from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.core import quaternions as quat
from orthosfm_tpu.io import cameras_io, timing
from orthosfm_tpu.testbench import metrics

COORD_TRANSFORM = np.array([[-1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])


@dataclasses.dataclass
class ReferenceCamera:
    name: str
    rotation_matrix: np.ndarray  # (3, 3) world basis after coordinate transform
    position: np.ndarray  # (3,)


@dataclasses.dataclass
class RunConfiguration:
    name: str
    solver: int = 0
    downscale_factor: int = 1
    extra_args: Sequence[str] = ()


@dataclasses.dataclass
class FullPipelineResult:
    dataset: str
    config: str
    mean_angular_error: float
    std_angular_error: float
    mean_position_error: float
    std_position_error: float
    mean_runtime: float
    mean_pose_runtime: float


def load_references(path: str) -> List[ReferenceCamera]:
    """Parse references.txt with the reference's coordinate transform
    (full_pipeline_tests.cpp:124-189)."""
    import jax.numpy as jnp

    cams = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(";")
            name = parts[0]
            vals = [float(v) for v in parts[1:13]]
            position = -COORD_TRANSFORM @ np.array([vals[3], vals[7], vals[11]])
            mat = np.array([[vals[0], vals[1], vals[2]],
                            [vals[4], vals[5], vals[6]],
                            [vals[8], vals[9], vals[10]]])
            mat = COORD_TRANSFORM @ mat
            # Reference re-projects through the Euler camera's angle
            # extraction (convertFromAxis; full_pipeline_tests.cpp:166-180)
            ang = cam_mod.basis_to_phi_theta_roll(jnp.asarray(mat, jnp.float32))
            S = cam_mod.spherical_matrix(ang)
            basis = np.asarray(cam_mod.COORD_TRANSFORM.T @ S, np.float64)
            cams.append(ReferenceCamera(name, basis, position))
    return cams


def write_references(path: str, gt_cams: cam_mod.CameraSet,
                     image_names: Sequence[str]) -> None:
    """Write a references.txt for generated datasets (inverse of
    load_references' transform)."""
    R = np.asarray(cam_mod.basis(gt_cams), np.float64)  # world basis
    o = np.einsum("vij,j->vi", R, [0.0, 0.0, -cam_mod.CAMERA_DISTANCE])
    Ct = COORD_TRANSFORM.T  # C is orthogonal: inverse transform = Cᵀ·
    with open(path, "w") as f:
        for v, name in enumerate(image_names):
            mat = Ct @ R[v]
            t = Ct @ (-o[v])
            row = [mat[0, 0], mat[0, 1], mat[0, 2], t[0],
                   mat[1, 0], mat[1, 1], mat[1, 2], t[1],
                   mat[2, 0], mat[2, 1], mat[2, 2], t[2]]
            f.write(name + ";" + ";".join(f"{x:.9f}" for x in row) + "\n")


def evaluate_run(project_folder: str, references: List[ReferenceCamera]):
    """Score one finished run (full_pipeline_tests.cpp:219-297). Returns
    (angular_errors, position_errors, runtime, pose_runtime)."""
    m = timing.load_runtimes(os.path.join(project_folder, "time_measurements.txt"))
    calculated = cameras_io.import_cameras(os.path.join(project_folder, "cameras.txt"))
    by_name = {r.name: r for r in references}

    est_origins = [c.transform[:3, 3] for c in calculated[:2]]
    ref_pair = [by_name[c.image_name].position for c in calculated[:2]]
    flipped = metrics.detect_flip(np.asarray(est_origins), np.asarray(ref_pair))

    import jax.numpy as jnp

    ang_errors, pos_errors = [], []
    for c in calculated:
        ref = by_name.get(c.image_name)
        if ref is None:
            continue
        R = c.transform[:3, :3].copy()
        pos = c.transform[:3, 3].copy()
        if flipped:
            R = metrics.FLIP_ROT @ R @ metrics.FLIP_ROT
            pos = metrics.FLIP_POS @ pos
        q_est = quat.from_matrix(jnp.asarray(R, jnp.float32))
        q_ref = quat.from_matrix(jnp.asarray(ref.rotation_matrix, jnp.float32))
        ang = float(np.rad2deg(np.asarray(quat.angular_distance(q_est, q_ref))))
        ang_errors.append(abs(ang))
        pn = pos / max(np.linalg.norm(pos), 1e-12)
        rn = ref.position / max(np.linalg.norm(ref.position), 1e-12)
        pos_errors.append(float(np.linalg.norm(pn - rn)))
    return ang_errors, pos_errors, m.total_time, m.pose_estimation_time


def run_full_pipeline_tests(
    project_root: str,
    dataset_folder: str,
    dataset_names: Sequence[str],
    configs: Sequence[RunConfiguration],
    repetitions: int = 5,
    executable: Optional[Sequence[str]] = None,
    verbose: bool = True,
    in_process: bool = False,
    discard_cold_runtime: bool = True,
) -> List[FullPipelineResult]:
    """Run the app per (dataset, config, repetition)
    (full_pipeline_tests.cpp:479-537) and aggregate results.

    discard_cold_runtime: the first repetition of each (dataset, config)
    absorbs jit tracing/compilation (tens of seconds for whichever solver
    runs first), so its runtime is excluded from the Mean Runtime rows when
    more repetitions exist — the published rows then reflect steady state.
    Its accuracy metrics still count (they are unaffected by compile time).

    in_process=True invokes orthosfm_tpu.app.main() in this interpreter
    instead of a subprocess: identical CLI arguments and on-disk artifacts
    (cameras.txt / time_measurements.txt are still written and read back),
    but jit traces are shared across the whole matrix. A fresh process pays
    ~3-6 minutes re-tracing every program of the pipeline even with a warm
    on-disk executable cache, which at 80 runs dwarfs the actual compute;
    the subprocess mode stays available for strict reference-style isolation
    (the reference shells out per run via system(), :527-533)."""
    executable = list(executable or [sys.executable, "-m", "orthosfm_tpu.app"])
    results = []
    combi_id = 0
    for ds_name in dataset_names:
        ds_path = os.path.join(dataset_folder, ds_name)
        references = load_references(os.path.join(ds_path, "references.txt"))
        image_folder = os.path.join(ds_path, "images")
        if not os.path.isdir(image_folder):
            image_folder = ds_path
        for config in configs:
            combi_id += 1
            angular, position, runtimes, pose_times = [], [], [], []
            for rep in range(repetitions):
                proj = os.path.join(
                    project_root,
                    f"{combi_id:03d}_{rep:03d}_{ds_name}_{config.name}")
                argv = [proj, image_folder,
                        f"--downscale-factor={config.downscale_factor}",
                        "--overwrite",
                        f"--solver={config.solver}",
                        *config.extra_args]
                cmd = executable + argv
                if verbose:
                    print("Running:", " ".join(cmd))
                try:
                    if in_process:
                        from orthosfm_tpu import app

                        rc = app.main(argv)
                        if rc:
                            raise RuntimeError(f"app.main returned {rc}")
                    else:
                        # timeout: a wedged device tunnel must fail the run
                        # (and be recorded as such), not hang the matrix
                        subprocess.run(cmd, check=True,
                                       capture_output=not verbose,
                                       timeout=1800)
                    a, p, rt, pt = evaluate_run(proj, references)
                    angular += a
                    position += p
                    if not (discard_cold_runtime and rep == 0
                            and repetitions > 1):
                        runtimes.append(rt)
                        pose_times.append(pt)
                except Exception as e:  # noqa: BLE001 — testbench continues on
                    # per-run failure (full_pipeline_tests.cpp:535-537)
                    print(f"Run failed: {e}")
            if angular:
                ma, sa = metrics.mean_and_std(angular)
                mp, sp = metrics.mean_and_std(position)
                results.append(FullPipelineResult(
                    ds_name, config.name, ma, sa, mp, sp,
                    float(np.mean(runtimes)) if runtimes else float("nan"),
                    float(np.mean(pose_times)) if pose_times else float("nan")))
    return results


def save_results_csv(results: List[FullPipelineResult], path: str) -> None:
    """results.csv in the reference's metric-rows schema
    (full_pipeline_tests.cpp:37-93)."""
    datasets = sorted({r.dataset for r in results})
    configs = sorted({r.config for r in results})
    rows = [
        ("Mean Angular Error [deg]", "mean_angular_error"),
        ("Std Angular Error [deg]", "std_angular_error"),
        ("Mean Position Error", "mean_position_error"),
        ("Std Position Error", "std_position_error"),
        ("Mean Runtime [s]", "mean_runtime"),
        ("Mean Pose Runtime [s]", "mean_pose_runtime"),
    ]
    lookup = {(r.dataset, r.config): r for r in results}
    with open(path, "w") as f:
        f.write("Metric;Dataset;" + ";".join(configs) + "\n")
        for label, attr in rows:
            for ds in datasets:
                vals = []
                for cfg in configs:
                    r = lookup.get((ds, cfg))
                    vals.append(f"{getattr(r, attr):.6f}" if r else "")
                f.write(f"{label};{ds};" + ";".join(vals) + "\n")
