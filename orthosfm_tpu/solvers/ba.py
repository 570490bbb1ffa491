"""Bundle adjustment: Huber-robustified Levenberg–Marquardt with Schur
complement over point blocks — the TPU-native replacement for the reference's
Ceres SPARSE_SCHUR solve (src/bundle_adjustment/bundle_adjustment.cpp:49-161).

Design (SURVEY.md §7 step 4):
  - residual per observation r[t,v] = project(cam_v, point_t) − obs[t,v],
    Huber-weighted (δ=1.0, bundle_adjustment.cpp:64) via IRLS weights;
  - manifold Jacobians via jacfwd of the retraction at zero: cameras use the
    6-dim tangent of core.cameras.retract (EigenQuaternionParameterization /
    IdentityParameterization analogs), points use the 3-dim tangent of the
    unit-sphere in R⁴ (HomogeneousVectorParameterization analog,
    bundle_adjustment.cpp:90);
  - normal equations are never materialized per-observation: camera blocks
    U[v] (6×6), point blocks V[t] (3×3) and couplings W[t,v] (6×3) are batched
    einsum reductions that XLA maps onto the MXU;
  - the point blocks are eliminated (Schur), the reduced (6V×6V) camera system
    solves densely with Jacobi preconditioning, point updates back-substitute
    in-shard;
  - fixed parameters (SetParameterBlockConstant analog) are zeroed Jacobian
    columns + identity rows in the reduced system;
  - the whole LM loop is one lax.while_loop → a single XLA program per
    (T, V) shape, reused across incremental groups.

Multi-chip: ba_sharded.py wraps `normal_equations` in shard_map over the track
axis; U/S/rhs contributions are psum-reduced over ICI while point blocks stay
device-local.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orthosfm_tpu.config import BundleAdjustConfig
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.core import quaternions as quat

TAN_C = cam_mod.CAMERA_TANGENT_DIM  # 6
TAN_P = 3


# ---------------------------------------------------------------------------
# Homogeneous point manifold


def point_tangent_basis(p_hat):
    """Orthonormal basis (..., 4, 3) of the tangent space at unit p_hat ∈ S³,
    via the Householder reflection mapping e₃ → ∓p_hat (Ceres
    HomogeneousVectorParameterization's construction)."""
    sign = jnp.where(p_hat[..., 3:4] >= 0, 1.0, -1.0)
    v = p_hat + sign * jnp.array([0.0, 0.0, 0.0, 1.0], p_hat.dtype)
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    H = jnp.eye(4, dtype=p_hat.dtype) - 2.0 * v[..., :, None] * v[..., None, :] / jnp.maximum(
        vn2[..., None], 1e-20
    )
    return H[..., :, :3]


def retract_point(p_hat, delta):
    """Unit-norm retraction p ← normalize(p + B δ)."""
    B = point_tangent_basis(p_hat)
    p_new = p_hat + jnp.einsum("...ij,...j->...i", B, delta)
    return p_new / jnp.maximum(jnp.linalg.norm(p_new, axis=-1, keepdims=True), 1e-20)


# ---------------------------------------------------------------------------
# Per-observation residual (raw parameters, retraction-composed)


def _obs_residual(kind, rot, offset, scale, w, h, p_hat, obs, dc, dp):
    """Residual (2,) of one observation after camera step dc (6,) and point
    step dp (3,). Mirrors the reference residual functors
    (OrthographicReprojectionError.h:26-77,
    OrthographicQuaternionReprojectorError.h:24-67)."""
    if kind == "quat":
        q = quat.normalize(quat.multiply(quat.exp_map(dc[:3]), rot))
        R = quat.to_matrix(q)
    else:
        angles = rot[:3] + dc[:3]
        S = cam_mod.spherical_matrix(angles)
        R = cam_mod.COORD_TRANSFORM.astype(S.dtype).T @ S
    off = offset + dc[3:5]
    sc = scale + dc[5]
    p = retract_point(p_hat, dp)
    p3 = cam_mod.dehomogenize(p)
    local = R.T @ p3
    proj = local[:2] / sc
    xy = (proj - off) / (-2.0) + 0.5
    return jnp.stack([w, h]) * xy - obs


def inv3x3(M):
    """Closed-form batched 3×3 inverse (adjugate/det).

    jnp.linalg.inv lowers to batched LU on TPU which serializes badly; the
    cofactor form is pure fused elementwise arithmetic on the VPU.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def solve3x3(M, y):
    """Batched 3×3 solve via the closed-form inverse."""
    return jnp.einsum("...ij,...j->...i", inv3x3(M), y)


class _Blocks(NamedTuple):
    r: jnp.ndarray  # (T, V, 2) raw residuals
    Jc: jnp.ndarray  # (T, V, 2, 6)
    Jp: jnp.ndarray  # (T, V, 2, 3)
    weight: jnp.ndarray  # (T, V) IRLS robust weights (0 where masked)


def _residuals_and_jacobians(cams: cam_mod.CameraSet, points_hat, obs, mask,
                             huber_delta):
    """Closed-form batched residuals + manifold Jacobians.

    Everything is a handful of large einsums over (T, V) instead of
    per-observation autodiff — the MXU-friendly formulation. Derivation
    (pix = wh·(−(Rᵀp/s − off)/2 + 0.5), r = pix − obs):

      ∂pix/∂local_xy = diag(−wh/2s) =: a
      quaternion tangent (q ← exp(δ)⊗q): ∂local/∂δ = Rᵀ[p]ₓ
      Euler angles:                      ∂local/∂angleₖ = ∂Sₖᵀ·(C·p)
      ∂pix/∂off = diag(wh/2);   ∂pix/∂s = −a·local_xy/s
      point tangent: ∂local/∂ε = Rᵀ·J₃·B with J₃ = [I/w | −p₃/w] (dehomog)
      and B the S³ tangent basis.

    Verified against the jacfwd formulation in tests/test_ba.py.
    """
    dtype = obs.dtype
    R = cam_mod.rotation_l2w(cams)  # (V, 3, 3)
    w_comp = points_hat[..., 3:4]
    safe_w = jnp.where(jnp.abs(w_comp) < 1e-12,
                       jnp.where(w_comp < 0, -1e-12, 1e-12), w_comp)
    p3 = points_hat[..., :3] / safe_w  # (T, 3)

    local = jnp.einsum("vij,ti->tvj", R, p3)  # (T, V, 3) = Rᵀ p3
    s = cams.scale  # (V,)
    wh = jnp.stack([cams.width, cams.height], -1)  # (V, 2)
    off = cams.offset  # (V, 2)
    proj = local[..., :2] / s[None, :, None]
    pix = wh[None] * (-(proj - off[None]) * 0.5 + 0.5)
    r = pix - obs

    a = -wh / (2.0 * s[:, None])  # (V, 2) pix/local_xy scale

    if cams.kind == "quat":
        # Rᵀ[p3]ₓ — contract rows of R (transpose via index order)
        x, y, z = p3[:, 0], p3[:, 1], p3[:, 2]
        P = jnp.stack([
            jnp.stack([jnp.zeros_like(x), -z, y], -1),
            jnp.stack([z, jnp.zeros_like(x), -x], -1),
            jnp.stack([-y, x, jnp.zeros_like(x)], -1),
        ], -2)  # [p]ₓ (T, 3, 3)
        dl_rot = jnp.einsum("vja,tjk->tvak", R, P)  # (T, V, 3, 3)
    else:
        dS = cam_mod.spherical_matrix_derivs(cams.rot[..., :3])  # (V, 3, 3, 3)
        Cp = p3 @ cam_mod.COORD_TRANSFORM.astype(dtype).T  # (T, 3) = C·p3
        # ∂localₐ/∂angleₖ = Σ_b dSₖ[b, a]·(Cp)_b
        dl_rot = jnp.einsum("vkba,tb->tvak", dS, Cp)  # (T, V, 3, 3)

    Jc = jnp.zeros(r.shape[:2] + (2, 6), dtype)
    Jc = Jc.at[..., :, 0:3].set(a[None, :, :, None] * dl_rot[:, :, :2, :])
    eye2 = jnp.eye(2, dtype=dtype)
    Jc = Jc.at[..., :, 3:5].set((wh[:, :, None] * 0.5 * eye2[None])[None])
    Jc = Jc.at[..., :, 5].set(-a[None] * local[..., :2] / s[None, :, None])

    B = point_tangent_basis(points_hat)  # (T, 4, 3)
    J34 = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=dtype), (p3.shape[0], 3, 3)) / safe_w[..., None],
         -(p3 / safe_w)[..., None]], axis=-1)  # (T, 3, 4)
    J3 = J34 @ B  # (T, 3, 3)
    dl_pt = jnp.einsum("vja,tjk->tvak", R, J3)  # (T, V, 3, 3)
    Jp = a[None, :, :, None] * dl_pt[:, :, :2, :]

    r = jnp.where(mask[..., None], r, 0.0)
    Jc = jnp.where(mask[..., None, None], Jc, 0.0)
    Jp = jnp.where(mask[..., None, None], Jp, 0.0)
    rnorm = jnp.linalg.norm(r, axis=-1)
    wgt = jnp.where(rnorm <= huber_delta, 1.0, huber_delta / jnp.maximum(rnorm, 1e-20))
    wgt = jnp.where(mask, wgt, 0.0)
    return _Blocks(r=r, Jc=Jc, Jp=Jp, weight=wgt)


def _residuals_and_jacobians_autodiff(cams: cam_mod.CameraSet, points_hat, obs,
                                      mask, huber_delta):
    """jacfwd reference implementation (kept for cross-checking the analytic
    Jacobians in tests)."""
    kind = cams.kind
    f = functools.partial(_obs_residual, kind)

    def per_obs(rot, offset, scale, w, h, p_hat, o):
        zero_c = jnp.zeros((TAN_C,), obs.dtype)
        zero_p = jnp.zeros((TAN_P,), obs.dtype)
        r = f(rot, offset, scale, w, h, p_hat, o, zero_c, zero_p)
        Jc, Jp = jax.jacfwd(f, argnums=(7, 8))(rot, offset, scale, w, h, p_hat, o, zero_c, zero_p)
        return r, Jc, Jp

    per_track = jax.vmap(per_obs, in_axes=(None, None, None, None, None, 0, 0))
    per_all = jax.vmap(per_track, in_axes=(0, 0, 0, 0, 0, None, 1), out_axes=1)
    r, Jc, Jp = per_all(cams.rot, cams.offset, cams.scale, cams.width, cams.height,
                        points_hat, obs)

    # Hard-zero masked entries: padded/dead observations can carry NaN/Inf
    # (e.g. degenerate points), and 0-weight × NaN would poison the reductions.
    r = jnp.where(mask[..., None], r, 0.0)
    Jc = jnp.where(mask[..., None, None], Jc, 0.0)
    Jp = jnp.where(mask[..., None, None], Jp, 0.0)

    # Huber IRLS weight per residual block (δ from config;
    # w = 1 for ‖r‖ ≤ δ else δ/‖r‖, the sqrt of ρ'(s))
    rnorm = jnp.linalg.norm(r, axis=-1)
    wgt = jnp.where(rnorm <= huber_delta, 1.0, huber_delta / jnp.maximum(rnorm, 1e-20))
    wgt = jnp.where(mask, wgt, 0.0)
    return _Blocks(r=r, Jc=Jc, Jp=Jp, weight=wgt)


def robust_cost(r, mask, huber_delta):
    """½ Σ ρ(‖r‖²) with Huber ρ (Ceres convention)."""
    s = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    rho = jnp.where(s <= d2, s, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(s, 1e-20)) - d2)
    return 0.5 * jnp.sum(jnp.where(mask, rho, 0.0))


def normal_equations(blocks: _Blocks, free_c):
    """Assemble the Schur-ready blocks.

    Returns (U, Wc, Vt, g_c, g_p):
      U (V, 6, 6) camera diag blocks; Wc (T, V, 6, 3) couplings;
      Vt (T, 3, 3) point blocks; g_c (V, 6); g_p (T, 3) — gradients are
      −Jᵀr (the RHS of the GN step). Fixed camera params are projected out.
    """
    w = blocks.weight[..., None, None]  # (T, V, 1, 1)
    Jc = blocks.Jc * free_c[None, :, None, :]  # zero fixed columns
    Jp = blocks.Jp
    U = jnp.einsum("tvki,tvkj,tv->vij", Jc, Jc, blocks.weight)
    Wc = Jc.transpose(0, 1, 3, 2) @ (Jp * w)  # (T, V, 6, 3)
    Vt = jnp.einsum("tvki,tvkj,tv->tij", Jp, Jp, blocks.weight)
    g_c = -jnp.einsum("tvki,tvk,tv->vi", Jc, blocks.r, blocks.weight)
    g_p = -jnp.einsum("tvki,tvk,tv->ti", Jp, blocks.r, blocks.weight)
    return U, Wc, Vt, g_c, g_p


def schur_solve(U, Wc, Vt, g_c, g_p, free_c, lam, optimize_points: bool,
                reduce_fn=None):
    """LM step via Schur elimination of point blocks.

    Returns (delta_c (V,6), delta_p (T,3)).

    ``reduce_fn`` sums partial cross-track contributions across devices
    (jax.lax.psum inside shard_map); U and g_c must already be globally
    reduced by the caller in that case. Point blocks stay local to their
    track shard.
    """
    if reduce_fn is None:
        reduce_fn = lambda x: x  # noqa: E731 — single-device: identity
    T, V = Wc.shape[0], Wc.shape[1]
    dtype = U.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # LM damping on the diagonals (Marquardt scaling with floor)
    dU = jnp.maximum(jnp.einsum("vii->vi", U), 1e-8)
    U_d = U + lam * dU[..., None] * eye6
    dV = jnp.maximum(jnp.einsum("tii->ti", Vt), 1e-8)
    V_d = Vt + lam * dV[..., None] * eye3 + 1e-10 * eye3

    if optimize_points:
        V_inv = inv3x3(V_d)  # (T, 3, 3) — closed-form batched inverses
    else:
        V_inv = jnp.zeros_like(V_d)

    # Reduced camera system S = blkdiag(U) − Σ_t W_t V_t⁻¹ W_tᵀ  (MXU einsum)
    WVi = jnp.einsum("tvap,tpq->tvaq", Wc, V_inv)  # (T, V, 6, 3)
    S_red = reduce_fn(jnp.einsum("tvaq,twbq->vawb", WVi, Wc))  # (V, 6, V, 6)
    S = -S_red
    S = S.at[jnp.arange(V), :, jnp.arange(V), :].add(U_d)
    rhs = g_c - reduce_fn(jnp.einsum("tvaq,tq->va", WVi, g_p))  # (V, 6)

    n = V * 6
    S_f = S.reshape(n, n)
    rhs_f = rhs.reshape(n)
    free_f = free_c.reshape(n)

    # Pin fixed params: identity rows/cols, zero rhs
    fm = free_f.astype(dtype)
    S_f = S_f * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs_f = rhs_f * fm

    # Jacobi preconditioning for f32 conditioning
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(S_f)), 1e-12))
    S_s = S_f / d[:, None] / d[None, :]
    delta_c = (jnp.linalg.solve(S_s, rhs_f / d) / d).reshape(V, 6)
    delta_c = delta_c * free_c.astype(dtype)

    # Back-substitute point updates: δp = V⁻¹(g_p − Wᵀ δc)
    delta_p = jnp.einsum("tpq,tq->tp", V_inv,
                         g_p - jnp.einsum("tvaq,va->tq", Wc, delta_c))
    return delta_c, delta_p


class BAResult(NamedTuple):
    cams: cam_mod.CameraSet
    points: jnp.ndarray  # (T, 4) homogeneous (unit-norm)
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("optimize_points", "config"))
def run(cams: cam_mod.CameraSet, points4, obs, mask,
        optimize_points: bool = True,
        config: BundleAdjustConfig = BundleAdjustConfig()) -> BAResult:
    """Run robust LM bundle adjustment.

    Args:
      cams: V cameras (their ``fixed`` flags and solver type drive free masks).
      points4: (T, 4) homogeneous points (w≠0 for valid tracks).
      obs: (T, V, 2) pixel observations aligned to the camera order.
      mask: (T, V) which observations participate (obs_mask & alive & has_point).

    Equivalent call in the reference: runBundleAdjustment(cameras, tracks,
    algorithm, optimizePoints, retriangulate) — retriangulation is done by the
    caller (pipeline) before invoking this, as bundle_adjustment.cpp:74-83 does.
    """
    dtype = obs.dtype
    free_c = cam_mod.free_mask(cams)
    p_hat = points4 / jnp.maximum(jnp.linalg.norm(points4, axis=-1, keepdims=True), 1e-20)

    track_valid = jnp.any(mask, axis=1)
    mask = mask & track_valid[:, None]
    # Dead/padded tracks get a safe unit point so autodiff through the
    # point manifold never sees an exactly-zero vector (NaN gradients).
    safe = jnp.array([0.0, 0.0, 0.0, 1.0], dtype)
    p_hat = jnp.where(track_valid[:, None], p_hat, safe)

    def cost_of(cams_, p_):
        pix_r = _project_residuals(cams_, p_, obs)
        return robust_cost(jnp.where(mask[..., None], pix_r, 0.0), mask, config.huber_delta)

    init_cost = cost_of(cams, p_hat)

    def cond(state):
        cams_, p_, lam, cost, it, done = state
        return (~done) & (it < config.max_iterations)

    def body(state):
        cams_, p_, lam, cost, it, done = state
        blocks = _residuals_and_jacobians(cams_, p_, obs, mask, config.huber_delta)
        U, Wc, Vt, g_c, g_p = normal_equations(blocks, free_c)
        delta_c, delta_p = schur_solve(U, Wc, Vt, g_c, g_p, free_c, lam, optimize_points)
        cams_new = cam_mod.retract(cams_, delta_c.astype(dtype))
        p_new = retract_point(p_, delta_p.astype(dtype)) if optimize_points else p_
        new_cost = cost_of(cams_new, p_new)
        accept = new_cost < cost
        cams_ = jax.tree.map(lambda a, b: jnp.where(accept, b, a), cams_, cams_new)
        p_ = jnp.where(accept, p_new, p_)
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-20)
        done_new = accept & (rel_decrease < config.function_tolerance)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * config.lambda_down, config.min_lambda),
                        jnp.minimum(lam * config.lambda_up, config.max_lambda))
        done_new = done_new | (~accept & (lam >= config.max_lambda))
        return (cams_, p_, lam, cost, it + 1, done_new)

    state = (cams, p_hat, jnp.asarray(config.initial_lambda, dtype), init_cost,
             jnp.asarray(0, jnp.int32), jnp.asarray(False))
    cams_f, p_f, _, cost_f, iters, _ = jax.lax.while_loop(cond, body, state)
    return BAResult(cams=cams_f, points=p_f, cost=cost_f, initial_cost=init_cost,
                    iterations=iters)


def _project_residuals(cams: cam_mod.CameraSet, points4, obs):
    """(T, V, 2) raw reprojection residuals for all pairs."""
    pix = cam_mod.project(cams, points4)  # (V, T, 2)
    return jnp.transpose(pix, (1, 0, 2)) - obs


def reprojection_errors(cams: cam_mod.CameraSet, points4, obs, mask):
    """Per-observation euclidean reprojection errors (T, V), 0 where masked —
    the evaluateReprojectionError analog
    (reference: OrthographicReconstructionAlgorithm.cpp:204-223)."""
    r = _project_residuals(cams, points4, obs)
    return jnp.where(mask, jnp.linalg.norm(r, axis=-1), 0.0)


def run_even_odd(cams: cam_mod.CameraSet, points4, obs, mask,
                 optimize_points: bool = True,
                 config: BundleAdjustConfig = BundleAdjustConfig(),
                 fix_first_two: bool = False) -> BAResult:
    """Alternating even/odd-camera bundle adjustment
    (reference: bundle_adjustment.cpp:163-198 runEvenOddBundleAdjustment —
    present in the reference API though its call sites are commented out).

    Fixes even cameras, solves; fixes odd cameras, solves; restores the
    original fixed flags (plus optionally the first two) and solves once more.
    """
    n = len(cams)
    idx = jnp.arange(n)
    first_two = fix_first_two & (idx < 2)
    orig_fixed = cams.fixed

    even = (idx % 2 == 0) | first_two
    r1 = run(cams.replace(fixed=even), points4, obs, mask,
             optimize_points=optimize_points, config=config)
    odd = (idx % 2 != 0) | first_two
    r2 = run(r1.cams.replace(fixed=odd), r1.points, obs, mask,
             optimize_points=optimize_points, config=config)
    final_fixed = orig_fixed | first_two
    r3 = run(r2.cams.replace(fixed=final_fixed), r2.points, obs, mask,
             optimize_points=optimize_points, config=config)
    return BAResult(cams=r3.cams, points=r3.points, cost=r3.cost,
                    initial_cost=r1.initial_cost,
                    iterations=r1.iterations + r2.iterations + r3.iterations)
