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

  point_update_cost: ... + δc and the retracted cameras
                    → updated homogeneous points (4, T) and the new robust cost
     Recomputes the (cheap) per-tile blocks instead of storing Wc/V̂⁻¹ to HBM,
     back-substitutes δp = V̂⁻¹(g_p − Wᵀδc), retracts the points on the unit
     sphere, and folds the new-cost evaluation into the same pass.

Mosaic layout rules this file obeys (learned the hard way — integer indexing
on >2-D arrays lowers to `gather`, which Mosaic only supports on 2-D
operands, and strided slices crash the compiler):
  - every per-observation tensor inside the kernel is a 2-D (V, TILE) array;
  - small structural axes (x/y residual component, the 6 camera tangent
    params, the 3 point tangent params, the 4 homogeneous components) are
    unrolled into Python lists of 2-D arrays;
  - per-camera constants arrive as (V, k) lane tables sliced with
    `t[:, j:j+1]` (contiguous lane slices only), per-point rows as (1, TILE)
    sublane slices of (4, TILE);
  - the Schur cross term Σ_q (W V̂⁻¹)_q W_qᵀ builds its (6V, TILE) operands by
    sublane concatenation in PARAM-MAJOR row order (row = param·V + view) and
    runs as 3 MXU matmuls; the host wrapper un-permutes the 96×96 result to
    the block-major (view·6 + param) order the dense solve expects.

The dense 96×96 camera solve, camera retraction and LM accept/reject stay in
XLA (they are tiny). ba.py selects these kernels on TPU backends and falls
back to the pure-XLA path elsewhere (CPU tests, virtual-device dry runs).
Equivalence with the XLA path is cross-checked in tests/test_ba_pallas.py
(interpret mode on CPU; compiled smoke test when a TPU is attached).

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
# Shared per-tile math (traced inside both kernels). All values are 2-D:
# (V, TILE) per-observation arrays, (V, 1) camera columns, (1, TILE) point
# rows. Structural axes are Python lists.


def _inv3x3_rows(M):
    """Closed-form inverse of a 3×3 whose entries are (1, TILE) rows.
    M is a 3×3 nested list; returns the same structure."""
    a, b, c = M[0][0], M[0][1], M[0][2]
    d, e, f = M[1][0], M[1][1], M[1][2]
    g, h, i = M[2][0], M[2][1], M[2][2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return [
        [A * inv_det, -(b * i - c * h) * inv_det, (b * f - c * e) * inv_det],
        [B * inv_det, (a * i - c * g) * inv_det, -(a * f - c * d) * inv_det],
        [C * inv_det, -(a * h - b * g) * inv_det, (a * e - b * d) * inv_det],
    ]


def _project_rows(R9, camp, p3):
    """Projection in row form. R9 (V, 9) flattened local→world rotations
    (R9[:, b*3+a] = R[v, b, a]), camp (V, 8) = [scale, w, h, offx, offy, ...],
    p3 = [px, py, pz] list of (1, TILE).

    Returns (pix = [pix_x, pix_y] (V, TILE), local = [l0, l1, l2] (V, TILE))."""
    local = [
        R9[:, 0 + a:1 + a] * p3[0] + R9[:, 3 + a:4 + a] * p3[1] +
        R9[:, 6 + a:7 + a] * p3[2]  # (V, 1)·(1, T) → (V, T); localₐ = (Rᵀp)ₐ
        for a in range(3)
    ]
    s = camp[:, 0:1]
    wh = [camp[:, 1:2], camp[:, 2:3]]
    off = [camp[:, 3:4], camp[:, 4:5]]
    pix = [wh[k] * (-(local[k] / s - off[k]) * 0.5 + 0.5) for k in range(2)]
    return pix, local


def _split_p4(p4):
    """Rows of the (4, TILE) homogeneous point block + safe-w dehomogenized
    coordinates: returns (p4rows, sw, p3rows)."""
    p4r = [p4[i:i + 1] for i in range(4)]
    w = p4r[3]
    sw = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    p3 = [p4r[i] / sw for i in range(3)]
    return p4r, sw, p3


def _tile_blocks(kind, p4, obs, m, R9, dS, camp, free, huber_delta):
    """Residuals + Huber weights + analytic Jacobians for one track tile.

    p4 (4, TILE); obs (2V, TILE) with x components in rows [0, V) and y in
    [V, 2V); m (V, TILE); R9 (V, 9); dS (V, 27) Euler rotation derivatives
    flattened as [a*9 + k*3 + b] (zeros for quat); camp (V, 8); free (V, 6).

    Returns (r = [rx, ry] masked, wgt (V, TILE), Jc = [comp][param] (V, TILE)
    free- and mask-zeroed, Jp = [comp][q], B = [i][q] (1, TILE) point tangent
    basis). Mirrors ba._residuals_and_jacobians — cross-checked in
    tests/test_ba_pallas.py."""
    V = m.shape[0]
    p4r, sw, p3 = _split_p4(p4)
    px, py, pz = p3

    pix, local = _project_rows(R9, camp, p3)
    r = [(pix[k] - obs[k * V:(k + 1) * V]) * m for k in range(2)]
    s = camp[:, 0:1]
    wh = [camp[:, 1:2], camp[:, 2:3]]
    a_sc = [-wh[k] / (2.0 * s) for k in range(2)]  # ∂pix/∂local_xy scale

    rnorm = jnp.sqrt(jnp.maximum(r[0] * r[0] + r[1] * r[1], 1e-30))
    wgt = m * jnp.minimum(1.0, huber_delta / rnorm)

    if kind == "quat":
        # ∂local/∂δₖ = (Rᵀ[p]ₓ)[:, k]: dl_rot[a][k], [p]ₓ columns unrolled
        dl_rot = [
            [
                R9[:, 3 + a:4 + a] * pz - R9[:, 6 + a:7 + a] * py,
                -R9[:, 0 + a:1 + a] * pz + R9[:, 6 + a:7 + a] * px,
                R9[:, 0 + a:1 + a] * py - R9[:, 3 + a:4 + a] * px,
            ]
            for a in range(2)
        ]
    else:
        # C = [[1,0,0],[0,0,-1],[0,1,0]] → C·p3 = (x, −z, y)
        Cp = [px, -pz, py]
        dl_rot = [
            [
                sum(dS[:, a * 9 + k * 3 + b:a * 9 + k * 3 + b + 1] * Cp[b]
                    for b in range(3))
                for k in range(3)
            ]
            for a in range(2)
        ]

    # Jc columns: [rotation (3) | offset (2) | scale (1)], free/mask-zeroed
    zero = jnp.zeros_like(m)
    Jc = [[None] * 6 for _ in range(2)]
    for k in range(2):
        for j in range(3):
            Jc[k][j] = a_sc[k] * dl_rot[k][j]
        Jc[k][3 + k] = jnp.broadcast_to(wh[k] * 0.5, m.shape)
        Jc[k][4 - k] = zero
        Jc[k][5] = -a_sc[k] * local[k] / s
    for k in range(2):
        for j in range(6):
            Jc[k][j] = Jc[k][j] * free[:, j:j + 1] * m

    # Point tangent basis on S³ (Householder, e₃ → ∓p̂): B[i][q] (1, TILE)
    sign = jnp.where(p4r[3] >= 0, 1.0, -1.0)
    v4 = [p4r[0], p4r[1], p4r[2], p4r[3] + sign]
    vn2 = jnp.maximum(sum(v * v for v in v4), 1e-20)
    B = [[(1.0 if i == q else 0.0) - 2.0 * v4[i] * v4[q] / vn2
          for q in range(3)] for i in range(4)]

    # J₃·B = (B[:3] − p3·B[3]) / w, then rotate into camera frame
    J3B = [[(B[j][q] - p3[j] * B[3][q]) / sw for q in range(3)]
           for j in range(3)]
    Jp = [[a_sc[k] * sum(R9[:, j * 3 + k:j * 3 + k + 1] * J3B[j][q]
                         for j in range(3)) * m
           for q in range(3)] for k in range(2)]
    return r, wgt, Jc, Jp, B


def _point_block_inv(Jp, wgt, lam, optimize_points):
    """Damped point blocks and their inverses. Jp[comp][q] (V, TILE) →
    (Jpw weighted Jacobians, V̂⁻¹ as a 3×3 list of (1, TILE) rows)."""
    Jpw = [[Jp[k][q] * wgt for q in range(3)] for k in range(2)]
    Vt = [[sum(jnp.sum(Jpw[k][p] * Jp[k][q], axis=0, keepdims=True)
               for k in range(2)) for q in range(3)] for p in range(3)]
    if not optimize_points:
        z = jnp.zeros_like(Vt[0][0])
        return Jpw, [[z, z, z] for _ in range(3)]
    V_d = [[Vt[p][q] +
            ((lam * jnp.maximum(Vt[p][p], 1e-8) + 1e-10) if p == q else 0.0)
            for q in range(3)] for p in range(3)]
    return Jpw, _inv3x3_rows(V_d)


def _couplings(Jc, Jp, wgt):
    """Jcw and Wc[a][q] = Σ_k w·Jc[k][a]·Jp[k][q], each (V, TILE)."""
    Jcw = [[Jc[k][a] * wgt for a in range(6)] for k in range(2)]
    Wc = [[Jcw[0][a] * Jp[0][q] + Jcw[1][a] * Jp[1][q] for q in range(3)]
          for a in range(6)]
    return Jcw, Wc


# ---------------------------------------------------------------------------
# Kernel A: normal equations + Schur reduction


def _make_ne_kernel(kind, V, huber_delta, optimize_points):
    def kernel(lam_ref, p4_ref, obs_ref, m_ref, R9_ref, dS_ref, camp_ref,
               free_ref, S_ref, U_ref, g_ref):
        i = pl.program_id(0)
        lam = lam_ref[0, 0]
        p4 = p4_ref[:]
        obs = obs_ref[:]
        m = m_ref[:]
        R9 = R9_ref[:]
        dS = dS_ref[:]
        camp = camp_ref[:]
        free = free_ref[:]

        r, wgt, Jc, Jp, _ = _tile_blocks(kind, p4, obs, m, R9, dS, camp,
                                         free, huber_delta)
        Jpw, V_inv = _point_block_inv(Jp, wgt, lam, optimize_points)
        Jcw, Wc = _couplings(Jc, Jp, wgt)
        WVi = [[sum(Wc[a][p] * V_inv[p][q] for p in range(3))
                for q in range(3)] for a in range(6)]

        dot_t = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # Every Σ_t contraction runs on the MXU (lane reductions on the VPU
        # were measured to dominate the iteration — see docs/SCALING.md).
        # Rows are PARAM-MAJOR (row = a·V + v); the residual component axis k
        # concatenates along lanes so one Gram sums over both.
        sqw = jnp.sqrt(wgt)
        Zc = jnp.concatenate(
            [jnp.concatenate([Jc[k][a] * sqw for a in range(6)], axis=0)
             for k in range(2)], axis=1)  # (6V, 2·TILE)
        Zr = jnp.concatenate([r[0] * sqw, r[1] * sqw], axis=1)  # (V, 2·TILE)
        # Gram: the per-view diagonal blocks are U; cross-view entries mix
        # unrelated residuals and are discarded by the host wrapper.
        U_tile = dot_t(Zc, Zc)  # (6V, 6V)
        # g_full[a·V+v, u]: only the u == v diagonal is g_c (host extracts)
        g_tile = dot_t(Zc, Zr)  # (6V, V)

        g_p = [-jnp.sum(Jpw[0][q] * r[0] + Jpw[1][q] * r[1],
                        axis=0, keepdims=True) for q in range(3)]  # (1, T)

        # Schur cross term Σ_q (W V̂⁻¹)_q W_qᵀ and the reduced-RHS correction
        # Σ_q (W V̂⁻¹)_q · g_p_q share the stacked WVi rows
        WVi_rows = [jnp.concatenate([WVi[a][q] for a in range(6)], axis=0)
                    for q in range(3)]  # each (6V, TILE)
        S_tile = sum(
            dot_t(WVi_rows[q],
                  jnp.concatenate([Wc[a][q] for a in range(6)], axis=0))
            for q in range(3)
        )  # (6V, 6V)
        # Σ_q folded into the contraction (one matmul): Mosaic rejects a SUM
        # of single-column matmuls ("only constant accumulators supported").
        rhs2_tile = dot_t(jnp.concatenate(WVi_rows, axis=1),
                          jnp.concatenate(g_p, axis=1))  # (6V, 1)
        gr_tile = jnp.concatenate([g_tile, rhs2_tile], axis=1)  # (6V, V+1)

        @pl.when(i == 0)
        def _():
            S_ref[:] = S_tile
            U_ref[:] = U_tile
            g_ref[:] = gr_tile

        @pl.when(i > 0)
        def _():
            S_ref[:] = S_ref[:] + S_tile
            U_ref[:] = U_ref[:] + U_tile
            g_ref[:] = g_ref[:] + gr_tile

    return kernel


# ---------------------------------------------------------------------------
# Kernel B: point back-substitution + retraction + new-cost evaluation


def _make_update_kernel(kind, V, huber_delta, optimize_points):
    def kernel(lam_ref, p4_ref, obs_ref, m_ref, R9_ref, dS_ref, camp_ref,
               free_ref, dc_ref, R9n_ref, campn_ref, pnew_ref, cost_ref):
        i = pl.program_id(0)
        lam = lam_ref[0, 0]
        p4 = p4_ref[:]
        obs = obs_ref[:]
        m = m_ref[:]
        R9 = R9_ref[:]
        dS = dS_ref[:]
        camp = camp_ref[:]
        free = free_ref[:]
        dc = dc_ref[:]  # (V, 6)

        if optimize_points:
            r, wgt, Jc, Jp, B = _tile_blocks(kind, p4, obs, m, R9, dS, camp,
                                             free, huber_delta)
            Jpw, V_inv = _point_block_inv(Jp, wgt, lam, optimize_points)
            _, Wc = _couplings(Jc, Jp, wgt)
            g_p = [-jnp.sum(Jpw[0][q] * r[0] + Jpw[1][q] * r[1],
                            axis=0, keepdims=True) for q in range(3)]
            # δp = V̂⁻¹ (g_p − Wᵀ δc)
            tmp = [g_p[q] - jnp.sum(sum(Wc[a][q] * dc[:, a:a + 1]
                                        for a in range(6)),
                                    axis=0, keepdims=True)
                   for q in range(3)]
            dp = [sum(V_inv[q][p] * tmp[p] for p in range(3))
                  for q in range(3)]  # (1, TILE) each
            p4r = [p4[j:j + 1] for j in range(4)]
            pn = [p4r[j] + sum(B[j][q] * dp[q] for q in range(3))
                  for j in range(4)]
            nrm = jnp.sqrt(jnp.maximum(sum(v * v for v in pn), 1e-40))
            pn = [v / nrm for v in pn]
            p_new = jnp.concatenate(pn, axis=0)  # (4, TILE)
        else:
            p_new = p4

        # New robust cost at (retracted cameras, updated points)
        _, sw, p3n = _split_p4(p_new)
        pixn, _ = _project_rows(R9n_ref[:], campn_ref[:], p3n)
        rn = [(pixn[k] - obs[k * V:(k + 1) * V]) * m for k in range(2)]
        s2 = rn[0] * rn[0] + rn[1] * rn[1]
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
        pl.BlockSpec((V, 9), rep, memory_space=pltpu.VMEM),                      # R9
        pl.BlockSpec((V, 27), rep, memory_space=pltpu.VMEM),                     # dS
        pl.BlockSpec((V, 8), rep, memory_space=pltpu.VMEM),                      # camp
        pl.BlockSpec((V, 6), rep, memory_space=pltpu.VMEM),                      # free
    ]


def _kernel_operands(pT, obsT, maskT, R, dSt, camp, free, lam):
    """Reshape the ba.py-facing tensors into the kernels' 2-D forms."""
    V = obsT.shape[0]
    T = obsT.shape[2]
    obs2 = jnp.transpose(obsT, (1, 0, 2)).reshape(2 * V, T)  # x rows then y
    return (jnp.full((1, 1), lam, jnp.float32), pT, obs2, maskT,
            R.reshape(V, 9), dSt.reshape(V, 27), camp, free)


@functools.partial(jax.jit, static_argnames=("kind", "huber_delta",
                                             "optimize_points", "interpret"))
def normal_eq_schur(kind, pT, obsT, maskT, R, dSt, camp, free, lam,
                    huber_delta, optimize_points, interpret=False):
    """Fused normal equations + Schur reduction over all track tiles.

    pT (4, T), obsT (V, 2, T), maskT (V, T) float; T % TILE == 0.
    Returns (S' (6V, 6V) = blkdiag(U) − WV̂⁻¹Wᵀ in block-major (v·6+a) order,
    dU (6V,) raw U diagonal, rhs (6V,) = g_c − WV̂⁻¹g_p)."""
    V = obsT.shape[0]
    T = obsT.shape[2]
    n = V * 6
    grid = (T // TILE,)
    S_pm, U_pm, g_pm = pl.pallas_call(
        _make_ne_kernel(kind, V, float(huber_delta), bool(optimize_points)),
        grid=grid,
        in_specs=_common_specs(V),
        out_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, V + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, V + 1), jnp.float32),
        ],
        interpret=interpret,
    )(*_kernel_operands(pT, obsT, maskT, R, dSt, camp, free, lam))

    # Un-permute the Schur cross term from param-major (a·V+v) to block-major
    # (v·6+a), extract the per-view diagonal blocks of the camera Gram
    # (cross-view Gram entries mix unrelated residuals) and the per-view
    # gradient diagonal — tiny 96×96 XLA work.
    idx = jnp.arange(n)
    pm_of_bm = (idx % 6) * V + idx // 6
    S_red = S_pm[pm_of_bm][:, pm_of_bm]
    U = jnp.transpose(
        jnp.diagonal(U_pm.reshape(6, V, 6, V), axis1=1, axis2=3),
        (2, 0, 1))  # (V, 6, 6)
    g_c = -jnp.diagonal(g_pm[:, :V].reshape(6, V, V), axis1=1, axis2=2).T
    rhs2 = g_pm[pm_of_bm, V]
    ar = jnp.arange(V)
    S = jnp.zeros((V, 6, V, 6), S_red.dtype).at[ar, :, ar, :].set(U)
    S = S.reshape(n, n) - S_red
    dU = jnp.einsum("vaa->va", U).reshape(n)
    rhs = g_c.reshape(n) - rhs2
    return S, dU, rhs


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
        pl.BlockSpec((V, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),   # R9_new
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
    )(*_kernel_operands(pT, obsT, maskT, R, dSt, camp, free, lam),
      delta_c, R_new.reshape(V, 9), camp_new)
    return p_new, cost[0, 0]
