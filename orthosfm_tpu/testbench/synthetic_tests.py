"""Synthetic robustness testbench: pose accuracy vs observation noise.

Reproduces src/testbench/synthethic_tests.cpp:14-265: 16-view datasets built
from the reference's own Cube/Sphere/Suzanne PLY vertex clouds (loaded via
data.synthetic.reference_cloud; procedural stand-ins when the resources
aren't mounted), a sweep of Gaussian observation noise σ ∈ [0, max]
applied to track features, both algorithm families run IN-PROCESS through
run_pose_estimation, and per-(algorithm, noise) mean/std of the per-camera
quaternion angular distance to ground truth with mirror-flip handling
(synthethic_tests.cpp:138-196).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Sequence

import jax
import numpy as np

from orthosfm_tpu.config import ReconstructionConfig, SolverType
from orthosfm_tpu.data import synthetic
from orthosfm_tpu.pipeline import incremental
from orthosfm_tpu.testbench import metrics


@dataclasses.dataclass
class SweepEntry:
    dataset: str
    solver: str
    noise_px: float
    mean_angular_error_deg: float
    std_angular_error_deg: float
    mean_position_error: float
    failed: bool = False


def run_noise_sweep(
    datasets: Sequence[str] = ("Cube", "Sphere", "Suzanne"),
    solvers: Sequence[SolverType] = (SolverType.ORTHO_QUATERNION,
                                     SolverType.ORTHO_EULER_ALL_DOF),
    noise_levels: Sequence[float] = tuple(np.linspace(0.0, 100.0, 101)),
    num_views: int = 16,
    seed: int = 0,
    max_tracks: int = 2048,
    verbose: bool = True,
    csv_path: str = "",
) -> List[SweepEntry]:
    """The reference sweeps 101 noise samples from 0 to 100 px
    (synthethic_tests.cpp:41-48). Smaller grids are useful for quick checks.

    ``csv_path``: write each entry as soon as it is computed (a multi-hour
    sweep must survive a crash near the end)."""
    results: List[SweepEntry] = []
    csv_f = None
    if csv_path:
        csv_f = open(csv_path, "w")
        csv_f.write("dataset,solver,noise_px,mean_angular_error_deg,"
                    "std_angular_error_deg,mean_position_error,failed\n")
        csv_f.flush()
    for ds_name in datasets:
        ds = synthetic.generate_dataset(ds_name, num_views=num_views, seed=seed)
        tracks = ds.tracks
        if int(tracks.count()) > max_tracks:
            # subsample for runtime parity with the reference's point clouds
            rng = np.random.default_rng(seed)
            alive = np.asarray(tracks.alive)
            idx = np.flatnonzero(alive)
            keep = rng.choice(idx, size=max_tracks, replace=False)
            new_alive = np.zeros_like(alive)
            new_alive[keep] = True
            import jax.numpy as jnp

            tracks = tracks.replace(alive=jnp.asarray(new_alive))
        for solver in solvers:
            config = ReconstructionConfig(solver=solver, seed=seed)
            for ni, sigma in enumerate(noise_levels):
                key = jax.random.PRNGKey(seed * 7919 + ni)
                noisy = synthetic.add_observation_noise(tracks, float(sigma), key)
                try:
                    res = incremental.run_pose_estimation(
                        noisy, 2048.0, 2048.0, config, verbose=False)
                    ang, pos = metrics.pose_errors(res.cameras, ds.gt_cameras)
                    m, s = metrics.mean_and_std(ang)
                    entry = SweepEntry(ds_name, solver.name, float(sigma), m, s,
                                       float(np.mean(pos)))
                except Exception as e:  # noqa: BLE001 — mirror the testbench's
                    # swallow-and-continue behavior (full_pipeline_tests.cpp:535)
                    if verbose:
                        print(f"  {ds_name}/{solver.name}/σ={sigma:.1f} failed: {e}")
                    entry = SweepEntry(ds_name, solver.name, float(sigma),
                                       float("nan"), float("nan"), float("nan"),
                                       failed=True)
                results.append(entry)
                if csv_f is not None:
                    csv_f.write(
                        f"{entry.dataset},{entry.solver},{entry.noise_px},"
                        f"{entry.mean_angular_error_deg},"
                        f"{entry.std_angular_error_deg},"
                        f"{entry.mean_position_error},{int(entry.failed)}\n")
                    csv_f.flush()
                if verbose:
                    print(f"{ds_name} {solver.name} σ={sigma:6.2f}px → "
                          f"angular {entry.mean_angular_error_deg:.3f} ± "
                          f"{entry.std_angular_error_deg:.3f} deg")
    if csv_f is not None:
        csv_f.close()
    return results


def save_results(results: List[SweepEntry], path: str) -> None:
    with open(path, "w") as f:
        f.write("dataset,solver,noise_px,mean_angular_error_deg,"
                "std_angular_error_deg,mean_position_error,failed\n")
        for r in results:
            f.write(f"{r.dataset},{r.solver},{r.noise_px},"
                    f"{r.mean_angular_error_deg},{r.std_angular_error_deg},"
                    f"{r.mean_position_error},{int(r.failed)}\n")


def save_plot(results: List[SweepEntry], path: str) -> None:
    """Noise-robustness curves (the reference plots via matplotlibcpp,
    synthethic_tests.cpp:239-264). No-op if matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return
    series: Dict[str, List[SweepEntry]] = {}
    for r in results:
        series.setdefault(f"{r.dataset}/{r.solver}", []).append(r)
    fig, ax = plt.subplots(figsize=(8, 5))
    for label, entries in series.items():
        entries = sorted(entries, key=lambda r: r.noise_px)
        ax.plot([r.noise_px for r in entries],
                [r.mean_angular_error_deg for r in entries], label=label)
    ax.set_xlabel("observation noise σ [px]")
    ax.set_ylabel("mean angular error [deg]")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
