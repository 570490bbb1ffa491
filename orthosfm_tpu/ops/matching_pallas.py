"""Pallas TPU kernel: fused descriptor matching (dot product + top-2).

The XLA path materializes the (N1, N2) similarity matrix in HBM before the
top-k (256 MB at 8192²·f32). This kernel tiles both operand sets over a 2-D
grid, issues one MXU matmul per (i, j) tile and folds the running best /
second-best statistics into the revisited output block in VMEM — HBM traffic
drops from O(N1·N2) to O((N1+N2)·D).

Replaces the role of CudaSift's MatchSiftData (src/cuda_sift/matching.cu:6-64)
and MVE's SSE nearest-neighbour search (src/mve/sfm/nearest_neighbor.cc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TILE_M = 256  # query rows per grid step
TILE_N = 512  # database rows per grid step


def _kernel(d1_ref, d2_ref, best_ref, second_ref, idx_ref):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    neg = jnp.float32(-3.0e38)

    d1 = d1_ref[:]  # (TILE_M, D) — last lane group carries the validity bias
    d2 = d2_ref[:]  # (TILE_N, D)
    sim = jax.lax.dot_general(d1, d2, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)

    cb = jnp.max(sim, axis=1, keepdims=True)  # (TILE_M, 1)
    ca = jnp.argmax(sim, axis=1).astype(jnp.int32)[:, None] + j * TILE_N
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + j * TILE_N
    masked = jnp.where(cols == ca, neg, sim)
    cs = jnp.max(masked, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        best_ref[:] = cb
        second_ref[:] = cs
        idx_ref[:] = ca

    @pl.when(j > 0)
    def _():
        best = best_ref[:]
        second = second_ref[:]
        bidx = idx_ref[:]
        new_best = jnp.maximum(best, cb)
        idx_ref[:] = jnp.where(cb > best, ca, bidx)
        second_ref[:] = jnp.maximum(jnp.minimum(best, cb),
                                    jnp.maximum(second, cs))
        best_ref[:] = new_best


INVALID_BIAS = -4.0  # added to sim of invalid db rows; min valid sim is −1


@jax.jit
def top2_similarity(d1, d2, valid2):
    """Per-row best/second-best similarity and best index of d1 @ d2ᵀ.

    d1: (N1, D), d2: (N2, D) unit-ish descriptors — N1 % TILE_M == 0,
    N2 % TILE_N == 0, D % 128 == 0. Invalid d2 rows are excluded by folding a
    bias of INVALID_BIAS into one extra lane group (keeps all kernel operands
    MXU-shaped; a (TILE_N, 1) mask operand breaks Mosaic's VMEM budgeting).
    Returns (best (N1,), second (N1,), idx (N1,) int32); rows whose best is
    ≤ −2 matched only invalid entries.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, d = d1.shape
    n2 = d2.shape[0]
    assert n1 % TILE_M == 0 and n2 % TILE_N == 0 and d % 128 == 0

    ones = jnp.zeros((n1, 128), d1.dtype).at[:, 0].set(1.0)
    bias = jnp.zeros((n2, 128), d2.dtype).at[:, 0].set(
        jnp.where(valid2, 0.0, INVALID_BIAS))
    d1a = jnp.concatenate([d1, ones], axis=1)
    d2a = jnp.concatenate([d2, bias], axis=1)

    grid = (n1 // TILE_M, n2 // TILE_N)
    da = d + 128
    best, second, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, da), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, da), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n1, 1), jnp.int32),
        ],
    )(d1a, d2a)
    return best[:, 0], second[:, 0], idx[:, 0]


def pad_to(x, n, axis=0, value=0.0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def oneway_top2(dA, vA, dB, vB):
    """Padded-shape wrapper: returns (best_sim, second_sim, best_idx) over the
    original (unpadded) row count of dA."""
    n1 = ((dA.shape[0] + TILE_M - 1) // TILE_M) * TILE_M
    n2 = ((dB.shape[0] + TILE_N - 1) // TILE_N) * TILE_N
    d = ((dA.shape[1] + 127) // 128) * 128
    d1 = pad_to(pad_to(dA, n1, 0), d, 1)
    d2 = pad_to(pad_to(dB, n2, 0), d, 1)
    v2 = pad_to(vB, n2, 0, value=False)
    best, second, idx = top2_similarity(d1, d2, v2)
    m = dA.shape[0]
    return best[:m], second[:m], idx[:m]
