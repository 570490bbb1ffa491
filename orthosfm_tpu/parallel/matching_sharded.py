"""Pair-axis sharding for the matching stage.

The reference's biggest parallel surface is the omp-parallel per-pair loop
(src/mve/sfm/bundler_matching.cc:74-96). Its TPU-native multi-chip analog:
the batched pair programs (descriptor-similarity matmuls in
ops/matching.match_pairs_batched, RANSAC-F/H verification in
ops/ransac_f.py / ops/ransac_h.py) shard their leading PAIR axis over the
mesh via shard_map — each device runs the identical compiled program on its
pair shard, no collectives needed (pairs are independent; results come back
to the host for the gate logic exactly as in the single-device path).

Per-pair PRNG keys are pre-split on the host from the caller's key so every
pair sees the key it would see unsharded — sharded and single-device runs
produce bit-identical matches (asserted by tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from orthosfm_tpu.parallel.mesh import TRACK_AXIS


def pad_pair_axis(arrs, n: int):
    """Zero-pad each array's leading (pair) axis to a multiple of n."""
    p0 = arrs[0].shape[0]
    pad = (-p0) % n
    if pad == 0:
        return list(arrs), p0
    out = []
    for a in arrs:
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, widths))
    return out, p0


def run_over_pairs(mesh, fn, *arrs):
    """Run `fn(*arrs)` (batched over the leading pair axis of every operand)
    with that axis sharded over the mesh. Padded pairs (zeros) are computed
    redundantly and sliced off; every output is sliced back to the true
    pair count."""
    n = mesh.devices.size
    padded, p0 = pad_pair_axis(arrs, n)
    spec = P(TRACK_AXIS)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=tuple(spec for _ in padded),
                        out_specs=spec, check_vma=False)
    out = sharded(*padded)
    return jax.tree_util.tree_map(lambda x: x[:p0], out)
