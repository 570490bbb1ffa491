"""Top-level reconstruction driver (reference: src/sfm/reconstruct.cpp:32-172).

Phases and their timers mirror the reference exactly: initialization (image
loading) → track building (feature matching or track-file load) → pose
estimation (incremental alignment) → artifact export (sparse_cloud.ply,
cameras.txt via the pose stage, time_measurements.txt).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import numpy as np

from orthosfm_tpu.config import ReconstructionConfig
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.data import tracks as tracks_mod
from orthosfm_tpu.data.views import View, load_views
from orthosfm_tpu.io import cameras_io, ply, timing, tracks_io
from orthosfm_tpu.pipeline import incremental, track_utils


def reconstruct(config: ReconstructionConfig, verbose: bool = True, mesh=None
                ) -> Tuple[incremental.PoseEstimationResult, List[View]]:
    """Full reconstruction. ``mesh``: optional jax.sharding.Mesh — with more
    than one device, pose estimation runs through the sharded solvers (see
    incremental.run_pose_estimation)."""
    start_all = time.monotonic()

    # --- Initialization: load views (+ masks) ---------------------------------
    views = load_views(config.image_folder, config.mask_folder,
                       config.downscale_factor)
    if verbose:
        print(f"Initialized project with {len(views)} views")
    end_init = time.monotonic()

    # --- Track building -------------------------------------------------------
    view_ids = np.asarray([v.view_id for v in views], np.int32)
    if config.track_file:
        if verbose:
            print(f"Loading tracks from {config.track_file}")
        tracks = tracks_io.load_tracks(config.track_file, view_ids)
        if verbose:
            track_utils.print_track_overview(tracks)
    else:
        from orthosfm_tpu.pipeline import matching as matching_mod

        tracks = matching_mod.build_tracks(views, config, verbose=verbose,
                                           mesh=mesh)
        tracks = track_utils.filter_tracks_with_masks(tracks, views)
        tracks = track_utils.propagate_colors(tracks, views)
        if verbose:
            track_utils.print_track_overview(tracks)
        if config.project_folder:
            tracks_io.save_tracks(tracks, os.path.join(config.project_folder, "tracks.txt"))
    end_track = time.monotonic()

    if config.export_pairwise_tracks and config.project_folder:
        tracks_io.save_pairwise_tracks(tracks, config.project_folder)

    # --- Pose estimation ------------------------------------------------------
    widths = np.asarray([v.width for v in views], np.float32)
    heights = np.asarray([v.height for v in views], np.float32)
    start_pose = time.monotonic()
    result = incremental.run_pose_estimation(tracks, widths, heights, config,
                                             verbose=verbose, mesh=mesh)
    end_pose = time.monotonic()

    # --- Export ---------------------------------------------------------------
    if config.project_folder:
        _export_cameras(result, views, os.path.join(config.project_folder, "cameras.txt"))
        ply.save_point_cloud(result.tracks,
                             os.path.join(config.project_folder, "sparse_cloud.ply"))
        end_all = time.monotonic()
        timing.save_runtimes(
            os.path.join(config.project_folder, "time_measurements.txt"),
            end_init - start_all, end_track - end_init,
            end_pose - start_pose, end_all - start_all)
    return result, views


def _export_cameras(result: incremental.PoseEstimationResult, views: List[View],
                    path: str) -> None:
    """cameras.txt in reconstruction (insertion) order, like the reference's
    alignedCameras vector (reconstruct.cpp:290)."""
    name_by_id = {v.view_id: v.image_name for v in views}
    vids = np.asarray(result.cameras.view_ids)
    col_of = {int(v): i for i, v in enumerate(vids)}
    order = [col_of[vid] for vid in result.insertion_order]
    names = [name_by_id[int(vids[i])] for i in range(len(vids))]
    cameras_io.export_cameras(result.cameras, names, path, order=order)
