"""Feature matching orchestration: views → SIFT features → exhaustive pairwise
matching with geometric verification → tracks.

The TPU-native calculateTracksUsingMVE (reference: src/matching/
matching_mve.cpp:247-473): no on-disk MVE scene — images go straight through
the JAX SIFT, pairs run as batched device programs, track building is a host
union-find. Gates and thresholds follow the reference's bundler configuration
(matching_mve.cpp:393-417): lowres pre-gate (500 features, ≥5 matches) when
|f1|·|f2| > 1e6, Lowe ratio 0.8, ≥max(8, 50) consistent matches,
RANSAC-F 1000 iterations at 0.0015, ≥max(8, 30) inliers.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from orthosfm_tpu.config import ReconstructionConfig
from orthosfm_tpu.data import tracks as tracks_mod
from orthosfm_tpu.data.views import View
from orthosfm_tpu.ops import matching as match_ops
from orthosfm_tpu.ops import ransac_f, sift
from orthosfm_tpu.pipeline import tracks_build


@dataclasses.dataclass
class ViewFeatures:
    """Combined per-view features, ordered [SIFT..., SURF...] like MVE's
    FeatureSet (feature_set.cc). Descriptors stay per-type (128-d / 64-d) and
    are matched separately, then combined with index offsets
    (mve/sfm/matching.cc combine_results)."""

    xy: np.ndarray  # (N, 2) pixel coords in the view's (config-downscaled) image
    norm_xy: np.ndarray  # (N, 2) MVE-normalized coords
    scale: np.ndarray  # (N,)
    sift_desc: np.ndarray  # (Ns, 128)
    surf_desc: np.ndarray  # (Nu, 64)

    @property
    def count(self) -> int:
        return self.xy.shape[0]

    @property
    def n_sift(self) -> int:
        return self.sift_desc.shape[0]


def _bucket(n: int, step: int = 512) -> int:
    return max(step, ((n + step - 1) // step) * step)


def extract_view_features(view: View, config: ReconstructionConfig) -> ViewFeatures:
    """SIFT on one view, with MVE-style halving until ≤ max_image_pixels
    (reference: bundler_features.cc:66-68) and positions mapped back to the
    view's pixel space."""
    gray = np.asarray(sift.grayscale(jnp.asarray(view.pixels)))
    halvings = 0
    while gray.shape[0] * gray.shape[1] > config.matching.max_image_pixels:
        gray = np.asarray(sift.half_size_gaussian(jnp.asarray(gray)))
        halvings += 1

    feats = sift.extract(jnp.asarray(gray))
    v = np.asarray(feats.valid)
    xy_s = np.asarray(feats.xy)[v]
    scale_s = np.asarray(feats.scale)[v] * (2.0**halvings)
    sift_desc = np.asarray(feats.desc)[v]

    if config.matching.use_surf:
        from orthosfm_tpu.ops import surf as surf_mod

        sfeats = surf_mod.extract(jnp.asarray(gray))
        sv = np.asarray(sfeats.valid)
        xy_u = np.asarray(sfeats.xy)[sv]
        scale_u = np.asarray(sfeats.scale)[sv] * (2.0**halvings)
        surf_desc = np.asarray(sfeats.desc)[sv]
    else:
        xy_u = np.zeros((0, 2), np.float32)
        scale_u = np.zeros((0,), np.float32)
        surf_desc = np.zeros((0, 64), np.float32)

    cap = config.matching.max_features_per_view
    if xy_s.shape[0] > cap:
        order = np.argsort(-scale_s)[:cap]
        xy_s, scale_s, sift_desc = xy_s[order], scale_s[order], sift_desc[order]
    if xy_u.shape[0] > cap:
        order = np.argsort(-scale_u)[:cap]
        xy_u, scale_u, surf_desc = xy_u[order], scale_u[order], surf_desc[order]

    xy = np.concatenate([xy_s, xy_u])
    scale = np.concatenate([scale_s, scale_u])
    # Map detected coords back to the view image (pixel centers: x' = 2x+0.5)
    for _ in range(halvings):
        xy = 2.0 * xy + 0.5

    w, h = float(view.width), float(view.height)
    maxdim = max(w, h)
    norm_xy = np.stack([(xy[:, 0] + 0.5 - w / 2.0) / maxdim,
                        (xy[:, 1] + 0.5 - h / 2.0) / maxdim], -1)
    return ViewFeatures(xy=xy, norm_xy=norm_xy, scale=scale,
                        sift_desc=sift_desc, surf_desc=surf_desc)


def _padded(arr, n, fill=0.0):
    out = np.full((n,) + arr.shape[1:], fill, arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def _match_combined(fi: ViewFeatures, fj: ViewFeatures, m) -> np.ndarray:
    """Match SIFT and SURF descriptors separately (their own Lowe ratios,
    MVE matching_base.h:27-31) and combine the per-type match lists with
    index offsets (matching.cc combine_results). Returns combined m12."""
    out = np.full(fi.count, -1, np.int64)
    specs = [
        (fi.sift_desc, fj.sift_desc, m.lowe_ratio, 0, 0),
        (fi.surf_desc, fj.surf_desc, m.surf_lowe_ratio, fi.n_sift, fj.n_sift),
    ]
    for dA, dB, ratio, off_i, off_j in specs:
        na, nb = dA.shape[0], dB.shape[0]
        if na == 0 or nb == 0:
            continue
        ba, bb = _bucket(na), _bucket(nb)
        m12 = match_ops.match_pair(
            jnp.asarray(_padded(dA, ba)), jnp.arange(ba) < na,
            jnp.asarray(_padded(dB, bb)), jnp.arange(bb) < nb,
            lowe_ratio=float(ratio))
        m12 = np.asarray(m12)[:na]
        hit = m12 >= 0
        out[off_i:off_i + na][hit] = m12[hit] + off_j
    return out


def match_all_pairs(features: List[ViewFeatures], config: ReconstructionConfig,
                    verbose: bool = True):
    """Exhaustive pairwise matching with gates; returns
    [(i, j, idx_i, idx_j), ...] inlier match lists."""
    m = config.matching
    n_views = len(features)
    key = jax.random.PRNGKey(config.seed + 7919)
    results = []
    for i in range(n_views):
        for j in range(i + 1, n_views):
            fi, fj = features[i], features[j]
            ni, nj = fi.count, fj.count
            if ni == 0 or nj == 0:
                continue

            # Low-res matchability gate on SIFT descriptors
            # (two_view_matching, bundler_matching.cc:146-158)
            if ni * nj > 1_000_000 and fi.n_sift and fj.n_sift:
                nlow = min(m.lowres_feature_count, fi.n_sift, fj.n_sift)
                si = np.asarray(match_ops.lowres_subset(
                    jnp.asarray(fi.scale[:fi.n_sift]),
                    jnp.ones(fi.n_sift, bool), nlow))
                sj = np.asarray(match_ops.lowres_subset(
                    jnp.asarray(fj.scale[:fj.n_sift]),
                    jnp.ones(fj.n_sift, bool), nlow))
                m_low = match_ops.match_pair(
                    jnp.asarray(fi.sift_desc[si]), jnp.ones(nlow, bool),
                    jnp.asarray(fj.sift_desc[sj]), jnp.ones(nlow, bool),
                    lowe_ratio=m.lowe_ratio)
                if int(match_ops.count_matches(m_low)) < m.lowres_match_threshold:
                    if verbose:
                        print(f"Pair ({i},{j}) rejected, low-res matches below "
                              f"{m.lowres_match_threshold}.")
                    continue

            m12 = _match_combined(fi, fj, m)
            n_match = int((m12 >= 0).sum())
            if n_match < max(8, m.min_feature_matches):
                if verbose:
                    print(f"Pair ({i},{j}) rejected, {n_match} matches below "
                          f"threshold {max(8, m.min_feature_matches)}.")
                continue

            idx_i = np.flatnonzero(m12 >= 0)
            idx_j = m12[idx_i]
            key, k = jax.random.split(key)
            if m.pair_verification == "homography":
                # CudaSift-style verification on pixel coordinates
                from orthosfm_tpu.ops import ransac_h

                p1 = jnp.asarray(_padded(fi.xy[idx_i], _bucket(len(idx_i), 256)))
                p2 = jnp.asarray(_padded(fj.xy[idx_j], p1.shape[0]))
                valid = jnp.arange(p1.shape[0]) < len(idx_i)
                res = ransac_h.find_homography(
                    p1, p2, valid, k, iterations=m.homography_iterations,
                    threshold_px=m.homography_threshold_px,
                    find_threshold_px=m.homography_find_threshold_px)
                min_required = m.homography_min_inliers
            else:
                p1 = jnp.asarray(_padded(fi.norm_xy[idx_i], _bucket(len(idx_i), 256)))
                p2 = jnp.asarray(_padded(fj.norm_xy[idx_j], p1.shape[0]))
                valid = jnp.arange(p1.shape[0]) < len(idx_i)
                res = ransac_f.ransac_fundamental(
                    p1, p2, valid, k, iterations=m.ransac_f_iterations,
                    threshold=m.ransac_f_threshold)
                min_required = max(m.min_pair_inliers_to_accept, m.min_matching_inliers)
            n_inl = int(res.num_inliers)
            if n_inl < min_required:
                if verbose:
                    print(f"Pair ({i},{j}) rejected, {n_inl} inliers below "
                          f"threshold {min_required}.")
                continue
            inl = np.asarray(res.inliers)[: len(idx_i)]
            results.append((i, j, idx_i[inl], idx_j[inl]))
            if verbose:
                print(f"Pair ({i},{j}) matched, {n_inl} inliers.")
    if verbose:
        print(f"Found a total of {len(results)} matching image pairs.")
    return results


def build_tracks(views: List[View], config: ReconstructionConfig,
                 verbose: bool = True) -> tracks_mod.TrackSet:
    """Full matching stage: SIFT → pairwise matching → union-find tracks."""
    features = [extract_view_features(v, config) for v in views]
    if verbose:
        for v, f in zip(views, features):
            print(f"{v.display_name} {f.count} features "
                  f"({f.n_sift} SIFT + {f.count - f.n_sift} SURF)")
    pair_matches = match_all_pairs(features, config, verbose=verbose)
    feature_counts = [f.count for f in features]
    raw_tracks = tracks_build.build_tracks(pair_matches, feature_counts)

    view_ids = np.asarray([v.view_id for v in views], np.int32)
    track_list = []
    for t_id, members in enumerate(raw_tracks):
        feats = []
        for (vi, fi) in members:
            x, y = features[vi].xy[fi]
            gid = vi * (1 << 20) + fi
            feats.append((int(view_ids[vi]), int(fi), int(gid),
                          float(x), float(y), 0, 0, 0))
        track_list.append(feats)
    return tracks_mod.from_feature_lists(track_list, view_ids,
                                         capacity=max(len(track_list), 1))


def filter_duplicate_tracks(tracks):
    """No-op duplicate-track filter.

    API parity with the reference's filterDuplicateTracks, whose hnswlib-based
    body is fully commented out and which returns its input unchanged
    (src/matching/matching.cpp:370-436).
    """
    return tracks
