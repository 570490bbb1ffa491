"""Track building from pairwise matches (union-find).

Host-side equivalent of MVE's bundler Tracks stage
(src/mve/sfm/bundler_tracks.cc:24-176): pairwise matches union into
multi-view tracks; any track ending up with two features in one view is
invalid and removed. Also covers the CudaSift-path pairwise merge
(src/matching/matching.cpp:233-283) whose same-camera conflict rejection
maps to the same invariant.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


class UnionFind:
    """Array-based DSU with path halving."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(pair_matches: List[Tuple[int, int, np.ndarray, np.ndarray]],
                 feature_counts: List[int]):
    """Union pairwise matches into tracks.

    pair_matches: list of (view_i, view_j, idx_i, idx_j) with idx arrays of
    matched feature indices. feature_counts: features per view.
    Returns list of tracks; each track is a list of (view, feature_idx),
    with same-view-conflict tracks removed (bundler_tracks.cc:151-176).
    """
    offsets = np.concatenate([[0], np.cumsum(feature_counts)]).astype(np.int64)
    uf = UnionFind(int(offsets[-1]))
    for vi, vj, idx_i, idx_j in pair_matches:
        gi = offsets[vi] + np.asarray(idx_i, np.int64)
        gj = offsets[vj] + np.asarray(idx_j, np.int64)
        for a, b in zip(gi, gj):
            uf.union(int(a), int(b))

    # Collect only features that participated in at least one match
    touched = set()
    for vi, vj, idx_i, idx_j in pair_matches:
        touched.update((offsets[vi] + np.asarray(idx_i, np.int64)).tolist())
        touched.update((offsets[vj] + np.asarray(idx_j, np.int64)).tolist())

    groups: dict = {}
    for node in touched:
        root = uf.find(int(node))
        groups.setdefault(root, []).append(int(node))

    view_of = np.searchsorted(offsets, np.arange(offsets[-1]), side="right") - 1

    tracks = []
    for members in groups.values():
        if len(members) < 2:
            continue
        views = [int(view_of[m]) for m in members]
        if len(set(views)) != len(views):
            continue  # conflict: two features in one view → invalid track
        tracks.append([(v, int(m - offsets[v])) for v, m in zip(views, members)])
    return tracks
