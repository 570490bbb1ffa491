"""Greedy next-best-view group construction (host-side).

Replaces the reference's combinatorial loops (src/data_structures/group.cpp:
13-212) with vectorized NumPy scoring over the track-view incidence matrix:
the per-candidate "number of shared full-size tracks" becomes a masked
column-product reduction instead of O(#candidates × #tracks) list filtering.
Control flow stays on the host — group construction is inherently sequential
and tiny next to the device work it schedules.
"""

from __future__ import annotations

import itertools
from typing import List

import numpy as np


def complete_group(seed_ids, incidence, view_ids, remaining, group_size):
    """Greedily extend seed_ids to group_size by adding, at each step, the
    remaining view sharing the most full-size tracks with the current group
    (reference: group.cpp:90-155). Returns (ids, shared_track_count)."""
    col = {int(v): i for i, v in enumerate(view_ids)}
    ids = list(seed_ids)
    added_tracks = 0
    while len(ids) < group_size:
        group_cols = [col[i] for i in ids]
        base = incidence[:, group_cols].all(axis=1)  # tracks covering the group
        best_id, best_score = None, -1
        for cand in sorted(remaining):
            if cand in ids:
                continue
            score = int(np.sum(base & incidence[:, col[cand]]))
            if score > best_score:
                best_id, best_score = cand, score
        if best_id is None:  # nothing left to add
            break
        ids.append(best_id)
        added_tracks = best_score
    return ids, added_tracks


def build_groups(view_ids, incidence, group_size: int = 3) -> List[List[int]]:
    """Ordered group schedule, always seeded with views 0 and 1
    (reference: group.cpp:13-88).

    view_ids: (V,) ids in track-tensor column order.
    incidence: (T, V) bool — track t observed in view column v.
    """
    view_ids = [int(v) for v in view_ids]
    if len(view_ids) < group_size:
        raise ValueError(f"need at least {group_size} views, got {len(view_ids)}")

    to_assign = set(view_ids[2:])
    used: set = set()
    groups: List[List[int]] = []

    ids, n = complete_group(view_ids[:2], incidence, view_ids, to_assign, group_size)
    groups.append(ids)
    for i in ids:
        to_assign.discard(i)
        used.add(i)

    while to_assign:
        best_ids, best_score = None, -1
        # All (group_size-1)-combinations of used cameras as seeds
        for seed in itertools.combinations(sorted(used), group_size - 1):
            ids, score = complete_group(list(seed), incidence, view_ids, to_assign, group_size)
            if score > best_score:
                best_ids, best_score = ids, score
        if best_score == 0:
            import warnings

            warnings.warn(
                "A view did not contain any matches to any other views; "
                "the reconstruction may not succeed."
            )
        groups.append(best_ids)
        for i in best_ids:
            to_assign.discard(i)
            used.add(i)
    return groups
