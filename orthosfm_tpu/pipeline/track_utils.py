"""Track utilities bridging views (host images) and track tensors: mask
filtering and color propagation (reference: src/matching/matching.cpp:325-368,
src/util/common.cpp:289-315)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from orthosfm_tpu.data import tracks as tracks_mod
from orthosfm_tpu.data.views import View


def filter_tracks_with_masks(tracks: tracks_mod.TrackSet,
                             views: List[View]) -> tracks_mod.TrackSet:
    """Drop every track that has ANY feature on a masked-out pixel
    (reference: matching.cpp:325-368). No-op when no view has a mask."""
    by_id = {v.view_id: v for v in views}
    if not any(v.mask is not None for v in views):
        print("No masks available. Continuing without masking.")
        return tracks

    obs = np.asarray(tracks.obs)
    mask = np.asarray(tracks.obs_mask)
    alive = np.array(tracks.alive)
    vids = np.asarray(tracks.view_ids)

    keep = alive.copy()
    for c, vid in enumerate(vids):
        view = by_id.get(int(vid))
        if view is None or view.mask is None:
            continue
        xs = np.clip(obs[:, c, 0], 0, view.width - 1).astype(np.int32)
        ys = np.clip(obs[:, c, 1], 0, view.height - 1).astype(np.int32)
        masked_in = view.mask[ys, xs] > 16
        keep &= ~mask[:, c] | masked_in
    n_before = int(alive.sum())
    print(f"{int(keep.sum())} tracks out of {n_before} remaining after filtering")
    return tracks.replace(alive=jnp.asarray(keep))


def propagate_colors(tracks: tracks_mod.TrackSet,
                     views: List[View]) -> tracks_mod.TrackSet:
    """Sample each feature's pixel color from its view image
    (reference: common.cpp:289-315)."""
    by_id = {v.view_id: v for v in views}
    obs = np.asarray(tracks.obs)
    colors = np.array(tracks.colors)
    vids = np.asarray(tracks.view_ids)
    for c, vid in enumerate(vids):
        view = by_id.get(int(vid))
        if view is None or view.pixels is None:
            continue
        xs = np.clip(obs[:, c, 0], 0, view.width - 1).astype(np.int32)
        ys = np.clip(obs[:, c, 1], 0, view.height - 1).astype(np.int32)
        colors[:, c, :] = view.pixels[ys, xs]
    return tracks.replace(colors=jnp.asarray(colors))


def print_track_overview(tracks: tracks_mod.TrackSet) -> None:
    """Histogram of track lengths (reference: track.cpp:101-120)."""
    counts = np.asarray(tracks.feature_counts())
    alive = np.asarray(tracks.alive)
    counts = counts[alive]
    total = len(counts)
    print(f"Built {total} tracks:")
    if total:
        for length in range(2, int(counts.max()) + 1):
            n = int((counts == length).sum())
            if n:
                print(f"  {n} tracks of length {length}")
