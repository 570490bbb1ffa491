"""Rotation alignment between point correspondence sets (Kabsch/Umeyama).

Replaces Eigen::umeyama(src, dst, false) as used by the reference for
scene normalization and group→global alignment
(reference: OrthographicCamera.cpp:103-126,
OrthographicReconstructionAlgorithm.cpp:125-141). Only the rotation block of
the returned similarity is consumed there, so we return R directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_align(src, dst):
    """Best rotation R (3,3) minimizing Σ‖R·src_i − dst_i‖² after demeaning.

    src, dst: (N, 3) correspondence points. Handles reflections via the
    det-sign correction (Umeyama 1991).
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    src_c = src - src.mean(axis=0, keepdims=True)
    dst_c = dst - dst.mean(axis=0, keepdims=True)
    cov = dst_c.T @ src_c  # (3, 3)
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.stack([1.0, 1.0, d]))
    return u @ diag @ vt
