"""Fused Pallas TPU kernels for the bundle-adjustment LM iteration.

The XLA formulation in solvers/ba.py materializes the per-observation
Jacobians Jc (V,2,6,T), Jp (V,2,3,T), the couplings Wc/WVi (V,6,3,T) and the
point blocks to HBM between ~100 separate fused kernels per LM iteration;
at 16 cams × 8k tracks that costs ~2 ms/iteration, dominated by kernel-launch
overhead and HBM round-trips rather than FLOPs (speed-of-light is ~0.1 ms).

These two kernels fuse the whole per-observation pipeline in VMEM:

  normal_eq_schur:  (points, obs, mask, camera tensors, λ)
                    → S' = U − W V̂⁻¹ Wᵀ (6V×6V), diag(U), rhs = g_c − W V̂⁻¹ g_p
     One grid pass over track tiles. Residuals, Huber weights, analytic
     Jacobians, the 3×3 point-block inverses, and both Schur contractions
     happen per-tile in VMEM; only the 96×96 accumulators ever leave the chip.
     The Schur cross term runs as 3 MXU matmuls (96, TILE)·(TILE, 96) per
     tile; U as 2 more with a block-diagonal mask.

  point_update_cost: ... + δc and the retracted cameras
                    → updated homogeneous points (4, T) and the new robust cost
     Recomputes the (cheap) per-tile blocks instead of storing Wc/V̂⁻¹ to HBM,
     back-substitutes δp = V̂⁻¹(g_p − Wᵀδc), retracts the points on the unit
     sphere, and folds the new-cost evaluation into the same pass.

The dense 96×96 camera solve, camera retraction and LM accept/reject stay in
XLA (they are tiny). ba.py selects these kernels on TPU backends and falls
back to the pure-XLA path elsewhere (CPU tests, virtual-device dry runs).

Reference: this is the TPU replacement for Ceres' SPARSE_SCHUR inner loop
(reference: src/bundle_adjustment/bundle_adjustment.cpp:126-145).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # tracks per grid step

# Flip to True (before first trace) to run the kernels in interpreter mode —
# used by the CPU equivalence tests.
INTERPRET = False


# ---------------------------------------------------------------------------
# Shared per-tile math (traced inside both kernels)


def _eye(n, m, dtype):
    """Identity-like (n, m) built from iota (array constants cannot be
    captured inside Pallas kernels)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return (r == c).astype(dtype)


def _inv3x3_T(M):
    """Closed-form inverse of a (3, 3, TILE) stack (VPU only)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], 0)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], 0)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], 0)
    return jnp.stack([row0, row1, row2], 0) * inv_det[None, None, :]


def _project(R, camp, p3):
    """pix (V, 2, TILE) and local (V, 3, TILE) for local→world rotations R
    (V, 3, 3) and camera params camp = [scale, w, h, offx, offy, ...] (V, 8)."""
    local = (R[:, 0, :, None] * p3[0] + R[:, 1, :, None] * p3[1] +
             R[:, 2, :, None] * p3[2])  # (V, 3, TILE) = Rᵀ p3
    s = camp[:, 0][:, None, None]
    wh = camp[:, 1:3][:, :, None]
    off = camp[:, 3:5][:, :, None]
    pix = wh * (-(local[:, :2] / s - off) * 0.5 + 0.5)
    return pix, local


def _tile_blocks(kind, p4, obs, m, R, dSt, camp, free, huber_delta):
    """Residuals + Huber weights + analytic Jacobians for one track tile.

    Returns (r (V,2,TILE) masked, wgt (V,TILE), Jc (V,2,6,TILE) free-masked,
    Jp (V,2,3,TILE), B (4,3,TILE) point tangent basis). Mirrors
    ba._residuals_and_jacobians — the two implementations are cross-checked in
    tests/test_ba_pallas.py."""
    V = obs.shape[0]
    w_raw = p4[3]
    sw = jnp.where(jnp.abs(w_raw) < 1e-12, jnp.where(w_raw < 0, -1e-12, 1e-12), w_raw)
    p3 = p4[:3] / sw[None, :]  # (3, TILE)

    pix, local = _project(R, camp, p3)
    r = (pix - obs) * m[:, None, :]  # (V, 2, TILE)
    s = camp[:, 0]
    wh = camp[:, 1:3]
    a_sc = -wh / (2.0 * s[:, None])  # (V, 2)

    rnorm = jnp.sqrt(jnp.maximum(r[:, 0] ** 2 + r[:, 1] ** 2, 1e-30))  # (V, TILE)
    wgt = m * jnp.minimum(1.0, huber_delta / rnorm)

    if kind == "quat":
        x, y, z = p3[0], p3[1], p3[2]
        # (Rᵀ[p]ₓ) columns, unrolled from the skew structure
        k0 = R[:, 1, :, None] * z - R[:, 2, :, None] * y  # (V, 3, TILE)
        k1 = -R[:, 0, :, None] * z + R[:, 2, :, None] * x
        k2 = R[:, 0, :, None] * y - R[:, 1, :, None] * x
        dl_rot = jnp.stack([k0, k1, k2], 2)  # (V, a=3, k=3, TILE)
    else:
        # C = [[1,0,0],[0,0,-1],[0,1,0]] → C·p3 = (x, −z, y)
        Cp = jnp.stack([p3[0], -p3[2], p3[1]], 0)  # (3, TILE)
        # dSt is (V, a, k, b) pre-transposed in XLA
        dl_rot = (dSt[:, :, :, 0, None] * Cp[0] + dSt[:, :, :, 1, None] * Cp[1] +
                  dSt[:, :, :, 2, None] * Cp[2])  # (V, 3, 3, TILE)

    Jc_rot = a_sc[:, :, None, None] * dl_rot[:, :2]  # (V, 2, 3, TILE)
    TILE_ = obs.shape[2]
    eye2 = _eye(2, 2, obs.dtype)
    Jc_off = jnp.broadcast_to((wh[:, :, None] * 0.5 * eye2[None])[:, :, :, None],
                              (V, 2, 2, TILE_))
    Jc_s = (-a_sc[:, :, None] * local[:, :2] / s[:, None, None])[:, :, None, :]
    Jc = jnp.concatenate([Jc_rot, Jc_off, Jc_s], axis=2)  # (V, 2, 6, TILE)
    Jc = Jc * free[:, None, :, None] * m[:, None, None, :]

    # Point tangent basis on S³ (Householder, e₃ → ∓p̂)
    sign = jnp.where(p4[3] >= 0, 1.0, -1.0)
    e3col = (jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0) == 3).astype(p4.dtype)
    v4 = p4 + sign[None, :] * e3col
    vn2 = jnp.maximum(v4[0] ** 2 + v4[1] ** 2 + v4[2] ** 2 + v4[3] ** 2, 1e-20)
    eye43 = _eye(4, 3, p4.dtype)
    B = eye43[:, :, None] - 2.0 * v4[:, None, :] * v4[None, :3, :] / vn2[None, None, :]

    # J₃·B = (B[:3] − p3·B[3]) / w
    J3B = (B[:3] - p3[:, None, :] * B[3][None]) / sw[None, None, :]  # (3, 3, TILE)
    dl_pt = (R[:, 0, :, None, None] * J3B[0][None] +
             R[:, 1, :, None, None] * J3B[1][None] +
             R[:, 2, :, None, None] * J3B[2][None])  # (V, 3, 3, TILE)
    Jp = a_sc[:, :, None, None] * dl_pt[:, :2] * m[:, None, None, :]  # (V, 2, 3, TILE)
    return r, wgt, Jc, Jp, B


def _point_blocks(Jp, wgt, lam, optimize_points):
    """Damped point blocks and their inverses: V̂ = Σ w JpᵀJp + λ·diag, (3,3,T)."""
    Jpw = Jp * wgt[:, None, None, :]
    Vt = sum(
        jnp.sum(Jpw[:, k, :, None, :] * Jp[:, k, None, :, :], axis=0)
        for k in range(2)
    )  # (3, 3, TILE)
    dV = jnp.maximum(jnp.stack([Vt[0, 0], Vt[1, 1], Vt[2, 2]], 0), 1e-8)
    eye3 = _eye(3, 3, Jp.dtype)
    V_d = Vt + eye3[:, :, None] * (lam * dV + 1e-10)[:, None, :]
    if optimize_points:
        V_inv = _inv3x3_T(V_d)
    else:
        V_inv = jnp.zeros_like(V_d)
    return Jpw, V_inv


def _couplings(Jc, Jp, wgt):
    """Wc[v,a,p,t] = Σ_k w·Jc[v,k,a,t]·Jp[v,k,p,t]  (V, 6, 3, TILE)."""
    Jcw = Jc * wgt[:, None, None, :]
    return Jcw, (Jcw[:, 0, :, None, :] * Jp[:, 0, None, :, :] +
                 Jcw[:, 1, :, None, :] * Jp[:, 1, None, :, :])


# ---------------------------------------------------------------------------
# Kernel A: normal equations + Schur reduction


def _make_ne_kernel(kind, V, huber_delta, optimize_points):
    n = V * 6

    def kernel(lam_ref, p4_ref, obs_ref, m_ref, R_ref, dSt_ref, camp_ref,
               free_ref, S_ref, vec_ref):
        i = pl.program_id(0)
        lam = lam_ref[0, 0]
        p4 = p4_ref[:]
        obs = obs_ref[:].reshape(V, 2, TILE)
        m = m_ref[:]
        R = R_ref[:].reshape(V, 3, 3)
        dSt = dSt_ref[:].reshape(V, 3, 3, 3)
        camp = camp_ref[:]
        free = free_ref[:]

        r, wgt, Jc, Jp, _ = _tile_blocks(kind, p4, obs, m, R, dSt, camp, free,
                                         huber_delta)
        Jpw, V_inv = _point_blocks(Jp, wgt, lam, optimize_points)
        Jcw, Wc = _couplings(Jc, Jp, wgt)

        # U (block-diagonal part of JᵀJ): 2 flat MXU matmuls + mask
        dot_t = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        U_full = (dot_t(Jcw[:, 0].reshape(n, TILE), Jc[:, 0].reshape(n, TILE)) +
                  dot_t(Jcw[:, 1].reshape(n, TILE), Jc[:, 1].reshape(n, TILE)))
        dU = jnp.sum(Jcw * Jc, axis=(1, 3)).reshape(1, n)  # diag(U)

        # Schur cross term: Σ_q (W V̂⁻¹)_q · W_qᵀ, 3 MXU matmuls
        WVi = (Wc[:, :, 0, None, :] * V_inv[None, None, 0] +
               Wc[:, :, 1, None, :] * V_inv[None, None, 1] +
               Wc[:, :, 2, None, :] * V_inv[None, None, 2])
        S_red = sum(
            dot_t(WVi[:, :, q, :].reshape(n, TILE), Wc[:, :, q, :].reshape(n, TILE))
            for q in range(3)
        )

        g_c = -jnp.sum(Jcw * r[:, :, None, :], axis=(1, 3))  # (V, 6)
        g_p = -jnp.sum(Jpw * r[:, :, None, :], axis=(0, 1))  # (3, TILE)
        rhs2 = jnp.sum(WVi * g_p[None, None, :, :], axis=(2, 3))  # (V, 6)
        rhs = (g_c - rhs2).reshape(1, n)

        rblk = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // 6
        cblk = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // 6
        blkmask = (rblk == cblk).astype(U_full.dtype)
        S_tile = U_full * blkmask - S_red
        vec_tile = jnp.concatenate([dU, rhs], axis=0)  # (2, n)

        @pl.when(i == 0)
        def _():
            S_ref[:] = S_tile
            vec_ref[:] = vec_tile

        @pl.when(i > 0)
        def _():
            S_ref[:] = S_ref[:] + S_tile
            vec_ref[:] = vec_ref[:] + vec_tile

    return kernel


# ---------------------------------------------------------------------------
# Kernel B: point back-substitution + retraction + new-cost evaluation


def _make_update_kernel(kind, V, huber_delta, optimize_points):
    def kernel(lam_ref, p4_ref, obs_ref, m_ref, R_ref, dSt_ref, camp_ref,
               free_ref, dc_ref, Rn_ref, campn_ref, pnew_ref, cost_ref):
        i = pl.program_id(0)
        lam = lam_ref[0, 0]
        p4 = p4_ref[:]
        obs = obs_ref[:].reshape(V, 2, TILE)
        m = m_ref[:]
        R = R_ref[:].reshape(V, 3, 3)
        dSt = dSt_ref[:].reshape(V, 3, 3, 3)
        camp = camp_ref[:]
        free = free_ref[:]
        dc = dc_ref[:]  # (V, 6)

        if optimize_points:
            r, wgt, Jc, Jp, B = _tile_blocks(kind, p4, obs, m, R, dSt, camp,
                                             free, huber_delta)
            Jpw, V_inv = _point_blocks(Jp, wgt, lam, optimize_points)
            _, Wc = _couplings(Jc, Jp, wgt)
            g_p = -jnp.sum(Jpw * r[:, :, None, :], axis=(0, 1))  # (3, TILE)
            # δp = V̂⁻¹ (g_p − Wᵀ δc)
            tmp = g_p - jnp.sum(Wc * dc[:, :, None, None], axis=(0, 1))
            dp = (V_inv[:, 0] * tmp[None, 0] + V_inv[:, 1] * tmp[None, 1] +
                  V_inv[:, 2] * tmp[None, 2])  # (3, TILE)
            p_new = p4 + (B[:, 0] * dp[0] + B[:, 1] * dp[1] + B[:, 2] * dp[2])
            nrm = jnp.sqrt(jnp.maximum(
                p_new[0] ** 2 + p_new[1] ** 2 + p_new[2] ** 2 + p_new[3] ** 2,
                1e-40))
            p_new = p_new / nrm[None, :]
        else:
            p_new = p4

        # New robust cost at (retracted cameras, updated points)
        Rn = Rn_ref[:].reshape(V, 3, 3)
        campn = campn_ref[:]
        w_raw = p_new[3]
        sw = jnp.where(jnp.abs(w_raw) < 1e-12,
                       jnp.where(w_raw < 0, -1e-12, 1e-12), w_raw)
        pix, _ = _project(Rn, campn, p_new[:3] / sw[None, :])
        rn = (pix - obs) * m[:, None, :]
        s2 = rn[:, 0] ** 2 + rn[:, 1] ** 2
        d2 = huber_delta * huber_delta
        rho = jnp.where(s2 <= d2, s2,
                        2.0 * huber_delta * jnp.sqrt(jnp.maximum(s2, 1e-20)) - d2)
        cost_tile = 0.5 * jnp.sum(m * rho)

        pnew_ref[:] = p_new

        @pl.when(i == 0)
        def _():
            cost_ref[0, 0] = cost_tile

        @pl.when(i > 0)
        def _():
            cost_ref[0, 0] = cost_ref[0, 0] + cost_tile

    return kernel


# ---------------------------------------------------------------------------
# Host-callable wrappers (shapes already padded to TILE multiples)


def _common_specs(V):
    rep = lambda i: (0, 0)  # noqa: E731
    return [
        pl.BlockSpec((1, 1), rep, memory_space=pltpu.SMEM),                      # lam
        pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),      # p4
        pl.BlockSpec((V * 2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),  # obs
        pl.BlockSpec((V, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),      # mask
        pl.BlockSpec((V * 3, 3), rep, memory_space=pltpu.VMEM),                  # R
        pl.BlockSpec((V * 9, 3), rep, memory_space=pltpu.VMEM),                  # dSt
        pl.BlockSpec((V, 8), rep, memory_space=pltpu.VMEM),                      # camp
        pl.BlockSpec((V, 6), rep, memory_space=pltpu.VMEM),                      # free
    ]


@functools.partial(jax.jit, static_argnames=("kind", "huber_delta",
                                             "optimize_points", "interpret"))
def normal_eq_schur(kind, pT, obsT, maskT, R, dSt, camp, free, lam,
                    huber_delta, optimize_points, interpret=False):
    """Fused normal equations + Schur reduction over all track tiles.

    pT (4, T), obsT (V, 2, T), maskT (V, T) float; T % TILE == 0.
    Returns (S' (6V, 6V), dU (6V,), rhs (6V,))."""
    V = obsT.shape[0]
    T = obsT.shape[2]
    n = V * 6
    grid = (T // TILE,)
    S, vec = pl.pallas_call(
        _make_ne_kernel(kind, V, float(huber_delta), bool(optimize_points)),
        grid=grid,
        in_specs=_common_specs(V),
        out_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.full((1, 1), lam, jnp.float32), pT, obsT.reshape(V * 2, T), maskT,
      R.reshape(V * 3, 3), dSt.reshape(V * 9, 3), camp, free)
    return S, vec[0], vec[1]


@functools.partial(jax.jit, static_argnames=("kind", "huber_delta",
                                             "optimize_points", "interpret"))
def point_update_cost(kind, pT, obsT, maskT, R, dSt, camp, free, lam,
                      delta_c, R_new, camp_new, huber_delta, optimize_points,
                      interpret=False):
    """Fused point back-substitution + retraction + new-cost evaluation.

    Returns (p_new (4, T), new_cost scalar)."""
    V = obsT.shape[0]
    T = obsT.shape[2]
    grid = (T // TILE,)
    in_specs = _common_specs(V) + [
        pl.BlockSpec((V, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),   # dc
        pl.BlockSpec((V * 3, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),  # R_new
        pl.BlockSpec((V, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),   # camp_new
    ]
    p_new, cost = pl.pallas_call(
        _make_update_kernel(kind, V, float(huber_delta), bool(optimize_points)),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, T), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.full((1, 1), lam, jnp.float32), pT, obsT.reshape(V * 2, T), maskT,
      R.reshape(V * 3, 3), dSt.reshape(V * 9, 3), camp, free,
      delta_c, R_new.reshape(V * 3, 3), camp_new)
    return p_new, cost[0, 0]
