"""Distributed bundle adjustment over a device mesh.

The TPU-native replacement for what a multi-node BA would need NCCL/MPI for:
tracks (and their observations + point blocks) shard across the mesh's
"tracks" axis; cameras are replicated. Each device assembles its shard's
contribution to the camera blocks U, the Schur-reduced system S and the
reduced RHS; `psum` over ICI produces the global (tiny) camera system, which
every device solves redundantly — point back-substitution never leaves the
shard. The LM control flow (damping, accept/reject) is replicated and
deterministic, so no divergence between devices.

Reference mapping: this is the distributed analog of Ceres SPARSE_SCHUR
(bundle_adjustment.cpp:126-145) — point blocks are the eliminated group,
cameras the reduced camera system (SURVEY.md §2.3, §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from orthosfm_tpu.config import BundleAdjustConfig
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.parallel.mesh import TRACK_AXIS, pad_to_multiple
from orthosfm_tpu.solvers import ba


def make_sharded_ba(mesh, optimize_points: bool = True,
                    config: BundleAdjustConfig = BundleAdjustConfig()):
    """Build a jitted distributed BA function over the given mesh.

    Returns run(cams, points4, obs, mask) -> BAResult with identical semantics
    to solvers.ba.run. Track-dimension inputs must be divisible by the mesh
    size (use pad_tracks)."""

    psum = functools.partial(jax.lax.psum, axis_name=TRACK_AXIS)
    replicated = P()
    sharded0 = P(TRACK_AXIS)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(replicated, sharded0, sharded0, sharded0),
        out_specs=(replicated, sharded0, replicated, replicated, replicated),
        check_vma=False,
    )
    def _run(cams, points4, obs, mask):
        dtype = obs.dtype
        free_c = cam_mod.free_mask(cams)
        p_hat = points4 / jnp.maximum(
            jnp.linalg.norm(points4, axis=-1, keepdims=True), 1e-20)
        track_valid = jnp.any(mask, axis=1)
        mask_ = mask & track_valid[:, None]
        safe = jnp.array([0.0, 0.0, 0.0, 1.0], dtype)
        p0 = jnp.where(track_valid[:, None], p_hat, safe)

        def cost_of(cams_, p_):
            r = ba._project_residuals(cams_, p_, obs)
            return psum(ba.robust_cost(jnp.where(mask_[..., None], r, 0.0),
                                       mask_, config.huber_delta))

        init_cost = cost_of(cams, p0)

        def cond(state):
            _, _, _, _, it, done = state
            return (~done) & (it < config.max_iterations)

        def body(state):
            cams_, p_, lam, cost, it, done = state
            blocks = ba._residuals_and_jacobians(cams_, p_, obs, mask_,
                                                 config.huber_delta)
            U, Wc, Vt, g_c, g_p = ba.normal_equations(blocks, free_c)
            U = psum(U)
            g_c = psum(g_c)
            delta_c, delta_p = ba.schur_solve(U, Wc, Vt, g_c, g_p, free_c, lam,
                                              optimize_points, reduce_fn=psum)
            cams_new = cam_mod.retract(cams_, delta_c.astype(dtype))
            p_new = ba.retract_point(p_, delta_p.astype(dtype)) if optimize_points else p_
            new_cost = cost_of(cams_new, p_new)
            accept = new_cost < cost
            cams_ = jax.tree.map(lambda a, b: jnp.where(accept, b, a), cams_, cams_new)
            p_ = jnp.where(accept, p_new, p_)
            rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
            done_new = accept & (rel < config.function_tolerance)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept,
                            jnp.maximum(lam * config.lambda_down, config.min_lambda),
                            jnp.minimum(lam * config.lambda_up, config.max_lambda))
            done_new = done_new | (~accept & (lam >= config.max_lambda))
            return (cams_, p_, lam, cost, it + 1, done_new)

        state = (cams, p0, jnp.asarray(config.initial_lambda, dtype), init_cost,
                 jnp.asarray(0, jnp.int32), jnp.asarray(False))
        cams_f, p_f, _, cost_f, iters, _ = jax.lax.while_loop(cond, body, state)
        return cams_f, p_f, cost_f, init_cost, iters

    @jax.jit
    def run(cams, points4, obs, mask):
        cams_f, p_f, cost, init_cost, iters = _run(cams, points4, obs, mask)
        return ba.BAResult(cams=cams_f, points=p_f, cost=cost,
                           initial_cost=init_cost, iterations=iters)

    return run


def pad_tracks(arrs, n_devices: int):
    """Pad the leading (track) dimension of each array to a multiple of
    n_devices. Returns (padded_arrays, original_length)."""
    t = arrs[0].shape[0]
    t_pad = pad_to_multiple(t, n_devices)
    out = []
    for a in arrs:
        pad = [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad))
    return out, t


def shard_track_arrays(mesh, arrs):
    """Place track-major arrays with NamedSharding over the mesh."""
    sh = NamedSharding(mesh, P(TRACK_AXIS))
    return [jax.device_put(a, sh) for a in arrs]
