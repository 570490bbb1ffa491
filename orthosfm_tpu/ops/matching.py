"""Pairwise descriptor matching.

TPU-native replacement for the reference's matchers (MVE exhaustive/cascade
hashing: src/mve/sfm/{matching,exhaustive_matching,cascade_hashing}.*;
CudaSift: src/cuda_sift/matching.cu). On TPU the brute-force descriptor
product IS the fast path — one (N1, 128)×(128, N2) MXU matmul replaces the
LSH machinery entirely; top-2 selection, Lowe ratio on squared distances
(MVE matching.h:126-142) and the mutual cross-check (matching.cc:18-36) are
fused reductions. On TPU backends the product+top-2 runs as a fused Pallas
kernel (matching_pallas.py) that never materializes the similarity matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("lowe_ratio",))
def _match_pair_xla(desc1, valid1, desc2, valid2, lowe_ratio: float = 0.8):
    big = jnp.asarray(4.0, desc1.dtype)  # > max possible squared distance

    def oneway(dA, vA, dB, vB):
        sim = dA @ dB.T  # (NA, NB) MXU
        d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        d2 = jnp.where(vB[None, :], d2, big)
        neg_top2, idx2 = jax.lax.top_k(-d2, 2)
        d_best, d_second = -neg_top2[:, 0], -neg_top2[:, 1]
        ok = (d_best <= lowe_ratio * lowe_ratio * d_second) & vA & (d_best < big)
        return jnp.where(ok, idx2[:, 0], -1)

    m12 = oneway(desc1, valid1, desc2, valid2)
    m21 = oneway(desc2, valid2, desc1, valid1)
    back = jnp.where(m12 >= 0, m21[jnp.clip(m12, 0, m21.shape[0] - 1)], -2)
    consistent = back == jnp.arange(m12.shape[0])
    return jnp.where(consistent, m12, -1)


def _match_pair_pallas(desc1, valid1, desc2, valid2, lowe_ratio: float = 0.8):
    from orthosfm_tpu.ops import matching_pallas as mp

    big = 4.0  # max possible squared distance between unit descriptors

    def oneway(dA, vA, dB, vB):
        best, second, idx = mp.oneway_top2(dA, vA, dB, vB)
        d_best = jnp.maximum(2.0 - 2.0 * best, 0.0)
        # Clamp like the XLA path: an invalid-biased second-best must act as
        # distance `big`, not 2−2·(sim−4) ≈ 10, or the ratio test trivializes
        d_second = jnp.minimum(jnp.maximum(2.0 - 2.0 * second, 0.0), big)
        ok = (d_best <= lowe_ratio * lowe_ratio * d_second) & vA & (best > -2.0)
        return jnp.where(ok, idx, -1)

    m12 = oneway(desc1, valid1, desc2, valid2)
    m21 = oneway(desc2, valid2, desc1, valid1)
    back = jnp.where(m12 >= 0, m21[jnp.clip(m12, 0, m21.shape[0] - 1)], -2)
    consistent = back == jnp.arange(m12.shape[0])
    return jnp.where(consistent, m12, -1)


def match_pair(desc1, valid1, desc2, valid2, lowe_ratio: float = 0.8):
    """Two-way matching with Lowe ratio + consistency check.

    desc: (N, 128) L2-normalized descriptors; valid: (N,) masks.
    Returns matches_12: (N1,) int32 index into set 2, −1 for unmatched —
    only mutually-consistent matches survive (MVE twoway_match +
    remove_inconsistent_matches). Dispatches to the fused Pallas kernel on
    TPU backends, plain XLA elsewhere.
    """
    if jax.default_backend() in ("tpu", "axon"):
        return _match_pair_pallas(desc1, valid1, desc2, valid2, lowe_ratio)
    return _match_pair_xla(desc1, valid1, desc2, valid2, lowe_ratio)


def count_matches(m12):
    return jnp.sum(m12 >= 0)


def lowres_subset(scale, valid, n: int):
    """Indices of the n largest-scale (lowest-resolution) valid features —
    the low-res matchability gate subset (MVE matching_base.h:46-52,
    exhaustive_matching sorts FeatureSet by scale)."""
    score = jnp.where(valid, scale, -jnp.inf)
    _, idx = jax.lax.top_k(score, n)
    return idx

# ---------------------------------------------------------------------------
# Batched pair matching: one compiled program processes a whole batch of view
# pairs at once. This replaces the reference's omp-parallel per-pair loop
# (mve/sfm/bundler_matching.cc:74-96) with MXU-batched similarity matmuls —
# the per-pair dispatch overhead of the host loop disappears and every
# (B, N1, N2) similarity block is one large matmul.


@functools.partial(jax.jit, static_argnames=("lowe_ratio",))
def match_pairs_batched(desc1, valid1, desc2, valid2, lowe_ratio: float = 0.8):
    """Two-way Lowe-ratio + mutual-consistency matching for a BATCH of pairs.

    desc1: (B, N1, D), valid1: (B, N1); desc2: (B, N2, D), valid2: (B, N2).
    Returns (B, N1) int32 index into each pair's set 2, −1 for unmatched.
    Semantics identical to match_pair for every pair in the batch.
    """
    big = jnp.asarray(4.0, desc1.dtype)

    def oneway(dA, vA, dB, vB):
        sim = jnp.einsum("bnd,bmd->bnm", dA, dB,
                         preferred_element_type=jnp.float32)
        d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
        d2 = jnp.where(vB[:, None, :], d2, big)
        neg_top2, idx2 = jax.lax.top_k(-d2, 2)
        d_best, d_second = -neg_top2[..., 0], -neg_top2[..., 1]
        ok = (d_best <= lowe_ratio * lowe_ratio * d_second) & vA & (d_best < big)
        return jnp.where(ok, idx2[..., 0], -1)

    m12 = oneway(desc1, valid1, desc2, valid2)  # (B, N1)
    m21 = oneway(desc2, valid2, desc1, valid1)  # (B, N2)
    back = jnp.take_along_axis(m21, jnp.clip(m12, 0, m21.shape[1] - 1), axis=1)
    consistent = (m12 >= 0) & (back == jnp.arange(m12.shape[1])[None, :])
    return jnp.where(consistent, m12, -1)
