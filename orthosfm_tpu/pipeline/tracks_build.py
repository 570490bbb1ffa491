"""Track building from pairwise matches (union-find).

Host-side equivalent of MVE's bundler Tracks stage
(src/mve/sfm/bundler_tracks.cc:24-176): pairwise matches union into
multi-view tracks; any track ending up with two features in one view is
invalid and removed. Also covers the CudaSift-path pairwise merge
(src/matching/matching.cpp:233-283) whose same-camera conflict rejection
maps to the same invariant.

The DSU itself runs in the native C++ runtime (orthosfm_tpu/native) when
available — it is the irregular pointer-chasing hot loop between device
stages — with a pure-Python fallback. Grouping and conflict removal are
vectorized NumPy either way.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from orthosfm_tpu import native


class UnionFind:
    """Array-based DSU with path halving (pure-Python fallback)."""

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


def _roots(edges_a: np.ndarray, edges_b: np.ndarray, n: int) -> np.ndarray:
    out = native.union_find(edges_a, edges_b, n)
    if out is not None:
        return out
    uf = UnionFind(n)
    for a, b in zip(edges_a, edges_b):
        uf.union(int(a), int(b))
    return np.asarray([uf.find(i) for i in range(n)], np.int64)


def build_tracks(pair_matches: List[Tuple[int, int, np.ndarray, np.ndarray]],
                 feature_counts: List[int]):
    """Union pairwise matches into tracks.

    pair_matches: list of (view_i, view_j, idx_i, idx_j) with idx arrays of
    matched feature indices. feature_counts: features per view.
    Returns list of tracks; each track is a list of (view, feature_idx),
    with same-view-conflict tracks removed (bundler_tracks.cc:151-176).
    """
    offsets = np.concatenate([[0], np.cumsum(feature_counts)]).astype(np.int64)
    n = int(offsets[-1])
    if not pair_matches:
        return []
    ea = np.concatenate([offsets[vi] + np.asarray(ii, np.int64)
                         for vi, vj, ii, jj in pair_matches])
    eb = np.concatenate([offsets[vj] + np.asarray(jj, np.int64)
                         for vi, vj, ii, jj in pair_matches])
    root = _roots(ea, eb, n)

    # Only nodes that participated in a match form tracks
    touched = np.unique(np.concatenate([ea, eb]))
    t_root = root[touched]
    view_of = (np.searchsorted(offsets, touched, side="right") - 1).astype(np.int64)
    feat_of = touched - offsets[view_of]

    # Group by root; drop singleton groups and groups with duplicate views
    order = np.argsort(t_root, kind="stable")
    r = t_root[order]
    v = view_of[order]
    f = feat_of[order]
    starts = np.flatnonzero(np.concatenate([[True], r[1:] != r[:-1]]))
    ends = np.concatenate([starts[1:], [len(r)]])

    # Conflict detection: within a group, any duplicated view invalidates it
    pair_key = r * (np.max(view_of) + 2) + v
    sorted_pairs = np.sort(pair_key)
    dup_keys = sorted_pairs[1:][sorted_pairs[1:] == sorted_pairs[:-1]]
    conflicted_roots = set((dup_keys // (np.max(view_of) + 2)).tolist())

    tracks = []
    for s, e in zip(starts, ends):
        if e - s < 2 or int(r[s]) in conflicted_roots:
            continue
        tracks.append([(int(v[k]), int(f[k])) for k in range(s, e)])
    return tracks
