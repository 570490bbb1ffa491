"""Single-kernel fused LM bundle adjustment: the ENTIRE Levenberg–Marquardt
while-loop runs inside ONE Pallas TPU kernel.

Why: one kernel per BA *run* instead of several programs per *iteration*
keeps the whole solve loop — normal equations, Schur reduction, the dense
reduced camera solve, manifold retractions, point back-substitution,
robust-cost evaluation and the LM accept/reject/λ schedule — resident in
VMEM with zero per-iteration dispatch. Measured per-phase costs are in
docs/SCALING.md ("Round-4 fused-kernel ablation", produced by
scripts/ablate_ba_fused.py): ~102 µs marginal per LM iteration at
16 cams / 8192 tracks, vs ~141 µs for the two-kernel path
(ba_pallas.py) measured pipelined.

Fits-in-VMEM condition: fits() gates on an empirical footprint model —
~3 MB fixed + ~2.9 KB·(V/16)·T for the track-linear terms (compiler-reported
26.1 MB at V=16, T=8192) plus a 12·(6V)²·4 B quadratic term for the live
(6V, 6V) reduced-system arrays (Grams, Schur, Gauss-Jordan augmented matrix)
that dominate at large V. The budget is generation-aware (~80 MB on ≥v4
hardware where the pallas_call raises the scoped cap to 100 MB, ~12 MB on
v2/v3 with their 16 MB VMEM); ba.run additionally wraps fused compilation in
a runtime fallback to the two-kernel path in case the model under-estimates.

Design notes (Mosaic-proofing, same rules as ba_pallas.py):
  - every tensor is 2-D; small structural axes are Python-unrolled;
  - the track axis is processed in statically-unrolled TILE-wide slices
    (no dynamic slicing anywhere — value slices are compile-time constants);
  - the reduced camera system assembles and solves in PARAM-MAJOR row order
    (row = param·V + view) directly — the block-major permutation the
    two-kernel path does on the host is never needed because the solve is
    order-invariant and δc is consumed as per-param (V, 1) column slices;
  - the dense solve is Gauss-Jordan elimination on the augmented
    [S_scaled | rhs_scaled] matrix: each of the len(active)·V steps extracts
    the pivot row/column with one-hot matvecs (MXU) and applies a rank-1
    update (VPU) — no dynamic indexing, no transposes;
  - column→row transposes use the eye-mask-and-reduce trick
    (sum(eye·col, axis=0)) instead of jnp.transpose;
  - the LM loop is a static-bound lax.fori_loop with a cond-guarded body
    (converged iterations cost ~nothing) whose carry holds the full camera
    state and the (4, T) point buffer as *values*; tolerances are read from
    SMEM before the loop so the guard stays pure.

Camera-state math transcribed to (V, 1)-column form in-kernel:
  - quaternion → R (quaternions.to_matrix), exp-map retraction q ← exp(δ)⊗q
    (quaternions.exp_map/multiply; Ceres EigenQuaternionParameterization);
  - Euler S = Rz(φ)·Rx(θ+π/2)·Rz(ρ) and its analytic derivatives
    (∂φ: rows [−S₁; S₀; 0], ∂ρ: cols [S_:,1; −S_:,0; 0], ∂θ explicit),
    R = Cᵀ·S with C = COORD_TRANSFORM (cameras.spherical_matrix[_derivs],
    reference src/algorithms/orthographic/OrthographicCamera.cpp:78-95).

Equivalence with the XLA LM path is cross-checked per-iteration in
tests/test_ba_fused.py (interpret mode on CPU; compiled gate on real TPU).

Reference behavior covered: Ceres SPARSE_SCHUR robust LM solve
(src/bundle_adjustment/bundle_adjustment.cpp:49-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orthosfm_tpu.solvers import ba_pallas as bp

TILE = 1024  # tracks per statically-unrolled slice
MAX_TILES = 16  # fused-path ceiling: T ≤ TILE·MAX_TILES (VMEM + unroll budget)

INTERPRET = False  # flip for CPU interpreter-mode tests


# ---------------------------------------------------------------------------
# Camera-state helpers in (V, 1)-column form


def _col0(x, j):
    """Column j of x as a lane-offset-0 (rows, 1) value via a one-hot matvec.

    A plain lane slice x[:, j:j+1] keeps lane offset j in its Mosaic layout,
    and tpu.concatenate requires matching offsets on the non-concat
    dimension — sublane-concatenating lane slices of different columns fails
    to lower ("result/input offset mismatch on non-concat dimension")."""
    k = x.shape[1]
    e = (jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) == j).astype(x.dtype)
    return jax.lax.dot_general(x, e, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _quat_cols(rot):
    """Normalized quaternion columns [w, x, y, z], each (V, 1)."""
    q = [_col0(rot, i) for i in range(4)]
    inv_n = jax.lax.rsqrt(jnp.maximum(sum(c * c for c in q), 1e-30))
    return [c * inv_n for c in q]


def _r9_from_quat(q):
    """R9 (V, 9) with R9[:, b·3+a] = R[b, a] (quaternions.to_matrix layout)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]
    return jnp.concatenate([rows[b][a] for b in range(3) for a in range(3)],
                           axis=1)


def _euler_S(rot):
    """S[b][a] (V, 1) entries of Rz(φ)·Rx(θ+π/2)·Rz(ρ) plus the raw trig
    values (cph, sph, com, som, crl, srl)."""
    phi = _col0(rot, 0)
    theta = _col0(rot, 1)
    roll = _col0(rot, 2)
    omega = theta + 0.5 * jnp.pi
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    com, som = jnp.cos(omega), jnp.sin(omega)
    crl, srl = jnp.cos(roll), jnp.sin(roll)
    S = [
        [cph * crl - sph * com * srl, -cph * srl - sph * com * crl, sph * som],
        [sph * crl + cph * com * srl, -sph * srl + cph * com * crl, -cph * som],
        [som * srl, som * crl, com],
    ]
    return S, (cph, sph, com, som, crl, srl)


def _r9_ds27_from_euler(rot):
    """R9 (V, 9) and dS27 (V, 27) for Euler cameras.

    R = Cᵀ·S with C = [[1,0,0],[0,0,-1],[0,1,0]] → R rows [S₀; S₂; −S₁].
    dS27[:, a·9+k·3+b] = ∂S[b, a]/∂angleₖ (the ba_pallas dS layout).
    """
    S, (cph, sph, com, som, crl, srl) = _euler_S(rot)
    zero = jnp.zeros_like(cph)
    R = [S[0], S[2], [-S[1][a] for a in range(3)]]
    r9 = jnp.concatenate([R[b][a] for b in range(3) for a in range(3)], axis=1)

    # dS_phi: row0 = −S row1, row1 = S row0, row2 = 0
    dphi = [[-S[1][a] for a in range(3)], S[0], [zero] * 3]
    dtheta = [
        [sph * som * srl, sph * som * crl, sph * com],
        [-cph * som * srl, -cph * som * crl, -cph * com],
        [com * srl, com * crl, -som],
    ]
    # dS_roll: col0 = S col1, col1 = −S col0, col2 = 0
    droll = [[S[b][1], -S[b][0], zero] for b in range(3)]
    dS = [dphi, dtheta, droll]  # [k][b][a]
    ds27 = jnp.concatenate(
        [dS[k][b][a] for a in range(3) for k in range(3) for b in range(3)],
        axis=1)
    return r9, ds27


def _retract_quat(rot, dcol):
    """q ← normalize(exp_map(δθ) ⊗ q) in column form (cameras.retract)."""
    d = dcol[:3]
    a2 = sum(c * c for c in d)
    small = a2 < 1e-12
    safe = jnp.where(small, 1.0, a2)
    angle = jnp.sqrt(safe)
    k = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(0.5 * angle) / angle)
    aw = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(0.5 * angle))
    ax, ay, az = k * d[0], k * d[1], k * d[2]
    bw, bx, by, bz = (_col0(rot, 0), _col0(rot, 1), _col0(rot, 2),
                      _col0(rot, 3))
    q = [
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ]
    inv_n = jax.lax.rsqrt(jnp.maximum(sum(c * c for c in q), 1e-30))
    return jnp.concatenate([c * inv_n for c in q], axis=1)


def _retract_euler(rot, dcol):
    """angles += δ (IdentityParameterization); 4th column untouched."""
    zero = jnp.zeros_like(dcol[0])
    return rot + jnp.concatenate([dcol[0], dcol[1], dcol[2], zero], axis=1)


# ---------------------------------------------------------------------------
# The megakernel


def _row_of_col(col):
    """(n, 1) column → (1, n) row without jnp.transpose: Σ_i eye[i, j]·c[i]."""
    n = col.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (i == j).astype(col.dtype)
    return jnp.sum(eye * col, axis=0, keepdims=True)


def _gauss_jordan(A, n):
    """Solve the n×n system held in the augmented (n, n+1) matrix A via
    Gauss-Jordan elimination with one-hot pivot extraction (no dynamic
    indexing). Returns the (n, 1) solution column. A must be well-scaled
    (Jacobi-preconditioned SPD here) — no pivoting is performed."""
    dot_rr = functools.partial(jax.lax.dot_general,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dot_cc = functools.partial(jax.lax.dot_general,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (n + 1, 1), 0)

    def step(k, A):
        e_n = (rows_i == k).astype(A.dtype)        # (n, 1)
        e_n1 = (cols_i == k).astype(A.dtype)       # (n+1, 1)
        col_k = dot_cc(A, e_n1)                    # (n, 1) = A[:, k]
        row_k = dot_rr(e_n, A)                     # (1, n+1) = A[k, :]
        piv = dot_rr(e_n, col_k)                   # (1, 1)
        inv_piv = 1.0 / jnp.where(jnp.abs(piv) < 1e-30, 1e-30, piv)
        c = col_k - e_n                            # c[k] = piv − 1
        return A - c * (row_k * inv_piv)

    A = jax.lax.fori_loop(0, n, step, A)
    return jax.lax.dot_general(A, (cols_i == n).astype(A.dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _make_lm_kernel(kind, V, n_tiles, huber_delta, optimize_points,
                    max_iters, ablate=frozenset(),
                    active=(0, 1, 2, 3, 4, 5)):
    """ablate: profiling-only switch set (see scripts/ablate_ba_fused.py).

    Members strip phases from the compiled kernel so their cost can be
    measured by difference: "gj" (skip the dense solve), "pass1" (skip the
    normal-equation tile loop), "pass2_blocks" (skip the back-substitution
    block recompute), "pass2" (skip the whole second tile pass). Any
    non-empty set also forces accept=True/done=False so every iteration
    does full work — results are WRONG, only timings are meaningful.

    active: statically-free tangent param slots (cameras.active_param_slots).
    Slots whose free-mask base is False for EVERY camera (offsets/scale under
    the solver's dof map) are excluded from the reduced camera system — the
    analog of Ceres never adding constant parameter blocks to the Schur
    eliminated system. Shrinks the Grams, the Schur cross term and the
    Gauss-Jordan chain from 6V to len(active)·V rows.
    """
    P = len(active)
    n = V * P

    def cam_tensors(rot, camp):
        if kind == "quat":
            r9 = _r9_from_quat(_quat_cols(rot))
            ds27 = jnp.zeros((V, 27), rot.dtype)
        else:
            r9, ds27 = _r9_ds27_from_euler(rot)
        return r9, ds27

    def kernel(cfg_ref, p4_ref, obs_ref, m_ref, rot_ref, camp_ref, free_ref,
               rot_out, camp_out, p4_out, stats_out):
        obs = obs_ref[:]
        m = m_ref[:]
        free = free_ref[:]
        p4_0 = p4_ref[:]
        rot_0 = rot_ref[:]
        camp_0 = camp_ref[:]

        lam_0 = cfg_ref[0, 0]
        func_tol = cfg_ref[0, 2]
        lam_up = cfg_ref[0, 3]
        lam_down = cfg_ref[0, 4]
        min_lam = cfg_ref[0, 5]
        max_lam = cfg_ref[0, 6]

        d2 = huber_delta * huber_delta

        def tile(x, t):
            return x[:, t * TILE:(t + 1) * TILE]

        def cost_of(r9, camp, p4):
            """Robust cost at (cameras, points) — one pass over tiles."""
            total = jnp.zeros((1, 1), jnp.float32)
            for t in range(n_tiles):
                _, _, p3 = bp._split_p4(tile(p4, t))
                pix, _ = bp._project_rows(r9, camp, p3)
                mt = tile(m, t)
                rn = [(pix[k] - tile(obs, t)[k * V:(k + 1) * V]) * mt
                      for k in range(2)]
                s2 = rn[0] * rn[0] + rn[1] * rn[1]
                rho = jnp.where(
                    s2 <= d2, s2,
                    2.0 * huber_delta * jnp.sqrt(jnp.maximum(s2, 1e-20)) - d2)
                total = total + jnp.sum(mt * rho).reshape(1, 1)
            return 0.5 * total

        dot_t = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # Same-view masks for extracting blkdiag(U) / diag(g) from the
        # param-major Grams (rows i·V+v for i over `active`; cross-view Gram
        # entries mix unrelated residuals and are discarded).
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        same_view_nn = ((ri % V) == (ci % V)).astype(jnp.float32)
        eye_nn = (ri == ci).astype(jnp.float32)
        rg = jax.lax.broadcasted_iota(jnp.int32, (n, V), 0)
        cg = jax.lax.broadcasted_iota(jnp.int32, (n, V), 1)
        diag_nv = ((rg % V) == cg).astype(jnp.float32)

        # free mask in param-major column order (row = i·V + v); columns are
        # re-extracted at lane offset 0 (_col0) before the sublane concat
        fm = jnp.concatenate([_col0(free, a) for a in active], axis=0)

        # Selection matrices extracting per-param (V, 1) columns out of the
        # param-major (n, 1) solution: sel[i][v, r] = (r == i·V + v)
        rsel = jax.lax.broadcasted_iota(jnp.int32, (V, n), 1)
        vsel = jax.lax.broadcasted_iota(jnp.int32, (V, n), 0)
        sel = [(rsel == vsel + i * V).astype(jnp.float32) for i in range(P)]

        def lm_step(rot, camp, p4, lam):
            """One LM trial step: returns (rot', camp', p4', new_cost)."""
            r9, ds27 = cam_tensors(rot, camp)

            S_pm = jnp.zeros((n, n), jnp.float32)
            U_pm = jnp.zeros((n, n), jnp.float32)
            g_pm = jnp.zeros((n, V), jnp.float32)
            rhs2 = jnp.zeros((n, 1), jnp.float32)
            for t in range(0 if "pass1" in ablate else n_tiles):
                r, wgt, Jc, Jp, _ = bp._tile_blocks(
                    kind, tile(p4, t), tile(obs, t), tile(m, t), r9, ds27,
                    camp, free, huber_delta)
                Jpw, V_inv = bp._point_block_inv(Jp, wgt, lam,
                                                 optimize_points)
                # Couplings only for the statically-free param slots
                Jcw = [[Jc[k][a] * wgt for a in active] for k in range(2)]
                Wc = [[Jcw[0][i] * Jp[0][q] + Jcw[1][i] * Jp[1][q]
                       for q in range(3)] for i in range(P)]
                WVi = [[sum(Wc[i][p] * V_inv[p][q] for p in range(3))
                        for q in range(3)] for i in range(P)]
                sqw = jnp.sqrt(wgt)
                Zc = jnp.concatenate(
                    [jnp.concatenate([Jc[k][a] * sqw for a in active],
                                     axis=0) for k in range(2)], axis=1)
                Zr = jnp.concatenate([r[0] * sqw, r[1] * sqw], axis=1)
                U_pm = U_pm + dot_t(Zc, Zc)
                g_pm = g_pm + dot_t(Zc, Zr)
                g_p = [-jnp.sum(Jpw[0][q] * r[0] + Jpw[1][q] * r[1],
                                axis=0, keepdims=True) for q in range(3)]
                WVi_rows = [jnp.concatenate([WVi[i][q] for i in range(P)],
                                            axis=0) for q in range(3)]
                S_pm = S_pm + sum(
                    dot_t(WVi_rows[q],
                          jnp.concatenate([Wc[i][q] for i in range(P)],
                                          axis=0))
                    for q in range(3))
                # (n, 3·TILE)·(1, 3·TILE) row-vector contraction lowers to a
                # vector.multi_reduction whose accumulator Mosaic requires to
                # be constant — fused with the running rhs2 it is not. Do the
                # broadcasted multiply on the VPU and reduce via a true MXU
                # matmul against a constant ones column instead.
                prod = (jnp.concatenate(WVi_rows, axis=1) *
                        jnp.concatenate(g_p, axis=1))
                ones_col = jnp.ones((3 * TILE, 1), jnp.float32)
                rhs2 = rhs2 + jax.lax.dot_general(
                    prod, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            # Reduced camera system in param-major order
            dU = jnp.sum(U_pm * eye_nn, axis=1, keepdims=True)  # (n, 1)
            g_c = -jnp.sum(g_pm * diag_nv, axis=1, keepdims=True)
            rhs = g_c - rhs2
            S = U_pm * same_view_nn - S_pm
            S = S + eye_nn * (lam * jnp.maximum(dU, 1e-8))
            # Pin fixed params (identity rows/cols, zero rhs)
            fm_row = _row_of_col(fm)
            S = S * fm * fm_row + eye_nn * (1.0 - fm)
            rhs = rhs * fm
            # Jacobi preconditioning
            d = jnp.sqrt(jnp.maximum(
                jnp.abs(jnp.sum(S * eye_nn, axis=1, keepdims=True)), 1e-12))
            inv_d = 1.0 / d
            A = jnp.concatenate([S * inv_d * _row_of_col(inv_d),
                                 rhs * inv_d], axis=1)
            if "gj" in ablate:
                delta = rhs * inv_d * inv_d * fm  # Jacobi step (timing only)
            else:
                delta = _gauss_jordan(A, n) * inv_d * fm  # (n, 1) param-major

            # Per-param (V, 1) columns at lane offset 0 (selection matvecs —
            # sublane slices of delta would carry unconcatenatable offsets);
            # statically-fixed slots get a zero step.
            dot_nv = functools.partial(
                jax.lax.dot_general,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            zero_col = jnp.zeros((V, 1), jnp.float32)
            dcol = [dot_nv(sel[active.index(a)], delta) if a in active
                    else zero_col for a in range(6)]  # (V, 1) each

            # Retract cameras: camp layout is [scale, w, h, offx, offy, 0·3]
            rot_new = (_retract_quat(rot, dcol) if kind == "quat"
                       else _retract_euler(rot, dcol))
            zc = jnp.zeros_like(dcol[0])
            camp_new = camp + jnp.concatenate(
                [dcol[5], zc, zc, dcol[3], dcol[4], zc, zc, zc], axis=1)
            r9n, _ = cam_tensors(rot_new, camp_new)

            # Point back-substitution δp = V̂⁻¹(g_p − Wᵀδc), retraction, and
            # the new robust cost — one more pass over tiles.
            new_cost = jnp.zeros((1, 1), jnp.float32)
            p_tiles = []
            for t in range(0 if "pass2" in ablate else n_tiles):
                p4_t = tile(p4, t)
                mt = tile(m, t)
                obs_t = tile(obs, t)
                if optimize_points and "pass2_blocks" not in ablate:
                    r, wgt, Jc, Jp, B = bp._tile_blocks(
                        kind, p4_t, obs_t, mt, r9, ds27, camp, free,
                        huber_delta)
                    Jpw, V_inv = bp._point_block_inv(Jp, wgt, lam, True)
                    Wc = [[(Jc[0][a] * Jp[0][q] + Jc[1][a] * Jp[1][q]) * wgt
                           for q in range(3)] for a in active]
                    g_p = [-jnp.sum(Jpw[0][q] * r[0] + Jpw[1][q] * r[1],
                                    axis=0, keepdims=True) for q in range(3)]
                    tmp = [g_p[q] - jnp.sum(
                        sum(Wc[i][q] * dcol[a] for i, a in enumerate(active)),
                        axis=0, keepdims=True) for q in range(3)]
                    dp = [sum(V_inv[q][p] * tmp[p] for p in range(3))
                          for q in range(3)]
                    p4r = [p4_t[j:j + 1] for j in range(4)]
                    pn = [p4r[j] + sum(B[j][q] * dp[q] for q in range(3))
                          for j in range(4)]
                    nrm = jnp.sqrt(jnp.maximum(sum(v * v for v in pn), 1e-40))
                    p_new_t = jnp.concatenate([v / nrm for v in pn], axis=0)
                else:
                    p_new_t = p4_t
                p_tiles.append(p_new_t)
                _, _, p3n = bp._split_p4(p_new_t)
                pixn, _ = bp._project_rows(r9n, camp_new, p3n)
                rn = [(pixn[k] - obs_t[k * V:(k + 1) * V]) * mt
                      for k in range(2)]
                s2 = rn[0] * rn[0] + rn[1] * rn[1]
                rho = jnp.where(
                    s2 <= d2, s2,
                    2.0 * huber_delta * jnp.sqrt(jnp.maximum(s2, 1e-20)) - d2)
                new_cost = new_cost + jnp.sum(mt * rho).reshape(1, 1)
            p4_new = (jnp.concatenate(p_tiles, axis=1) if p_tiles else p4)
            return rot_new, camp_new, p4_new, 0.5 * new_cost

        r9_0, _ = cam_tensors(rot_0, camp_0)
        init_cost = cost_of(r9_0, camp_0, p4_0)[0, 0]

        # Static-bound fori with a cond-guarded body (converged iterations
        # cost ~nothing) — Mosaic's supported loop shape; a lax.while_loop
        # with a data-dependent cond hung on-device here.
        def step(state):
            rot, camp, p4, lam, cost, it, done = state
            rot_n, camp_n, p4_n, nc = lm_step(rot, camp, p4, lam)
            new_cost = nc[0, 0]
            accept = new_cost < cost
            if ablate:  # timing-only mode: always do full work every iter
                accept = jnp.asarray(True)
                new_cost = cost * 0.999
            rot = jnp.where(accept, rot_n, rot)
            camp = jnp.where(accept, camp_n, camp)
            p4 = jnp.where(accept, p4_n, p4)
            rel = (cost - new_cost) / jnp.maximum(cost, 1e-20)
            done_n = accept & (rel < func_tol)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * lam_down, min_lam),
                            jnp.minimum(lam * lam_up, max_lam))
            done_n = done_n | (jnp.logical_not(accept) & (lam >= max_lam))
            return (rot, camp, p4, lam, cost, it + 1.0, done_n)

        def body(_, state):
            return jax.lax.cond(state[6], lambda s: s, step, state)

        state = (rot_0, camp_0, p4_0, lam_0, init_cost,
                 jnp.zeros((), jnp.float32), jnp.zeros((), jnp.bool_))
        rot_f, camp_f, p4_f, _, cost_f, iters, _ = jax.lax.fori_loop(
            0, max_iters, body, state)

        rot_out[:] = rot_f
        camp_out[:] = camp_f
        p4_out[:] = p4_f
        stats_out[0, 0] = cost_f
        stats_out[0, 1] = init_cost
        stats_out[0, 2] = iters

    return kernel


def _vmem_budget_bytes() -> int:
    """Scoped-VMEM budget for fits(), by TPU generation. v2/v3 cores have
    16 MB VMEM (the 100 MB scoped cap the pallas_call requests is only valid
    on ≥v4 with 128 MB); unknown/virtual platforms get the conservative
    small budget."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 12 * 1024 * 1024
    if "v2" in kind or "v3" in kind:
        return 12 * 1024 * 1024
    return 80 * 1024 * 1024


def fits(V: int, T: int) -> bool:
    """Whether the fused single-kernel path handles this problem size
    (VMEM residency + static-unroll budget)."""
    if T % TILE != 0 or T // TILE > MAX_TILES:
        return False
    # Empirical scoped-VMEM footprint (compiler-reported): ~26.1 MB at
    # V=16, T=8192 ⇒ ≈ 3 MB fixed + ~2.9 KB·(V/16)·T, plus the live
    # (6V, 6V) reduced-camera-system arrays (~12 concurrently: Grams,
    # Schur, masks, Gauss-Jordan augmented matrix) which grow
    # quadratically in V and dominate for many-view problems.
    est = (3 * 1024 * 1024 + int(2.9 * 1024 * (V / 16.0) * T)
           + 12 * (6 * V) * (6 * V) * 4)
    return est < _vmem_budget_bytes()


@functools.partial(jax.jit, static_argnames=("kind", "huber_delta",
                                             "optimize_points", "max_iters",
                                             "interpret", "ablate", "active"))
def run_lm(kind, pT, obsT, maskT, rot, camp, free, cfg_row, huber_delta,
           optimize_points, max_iters=100, interpret=False,
           ablate=frozenset(), active=(0, 1, 2, 3, 4, 5)):
    """Run the whole LM loop in one fused kernel.

    pT (4, T) unit homogeneous points (T % TILE == 0); obsT (V, 2, T);
    maskT (V, T) float; rot (V, 4) quaternions or padded Euler angles;
    camp (V, 8) packed [scale, w, h, offx, offy, 0, 0, 0]; free (V, 6) float;
    cfg_row (1, 8) = [λ₀, unused, func_tol, λ_up, λ_down, λ_min, λ_max, 0];
    max_iters: static LM iteration bound (the in-kernel loop is a fori);
    active: statically-free tangent slots (cameras.active_param_slots) — the
    runtime `free` mask must be zero outside them.

    Returns (rot' (V, 4), camp' (V, 8), p4' (4, T), cost, init_cost, iters).
    """
    V = obsT.shape[0]
    T = obsT.shape[2]
    obs2 = jnp.transpose(obsT, (1, 0, 2)).reshape(2 * V, T)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    rot_f, camp_f, p4_f, stats = pl.pallas_call(
        _make_lm_kernel(kind, V, T // TILE, float(huber_delta),
                        bool(optimize_points), int(max_iters), ablate,
                        tuple(active)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [vmem() for _ in range(6)],
        out_specs=[vmem(), vmem(), vmem(),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((V, 4), jnp.float32),
            jax.ShapeDtypeStruct((V, 8), jnp.float32),
            jax.ShapeDtypeStruct((4, T), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        # The whole-solve working set is scoped-stack-resident; the default
        # 16 MB scoped-VMEM cap rejects ≥8k-track problems (26 MB observed
        # at V=16, T=8192). ≥v4 hardware has 128 MB VMEM — raise the cap
        # there and let fits() be the real gate; on 16 MB generations keep
        # the default cap (fits() already restricts to a 12 MB budget).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 * 1024 * 1024
                              if _vmem_budget_bytes() >= 80 * 1024 * 1024
                              else 16 * 1024 * 1024)),
        interpret=interpret,
    )(cfg_row, pT, obs2, maskT, rot, camp, free)
    return (rot_f, camp_f, p4_f, stats[0, 0], stats[0, 1],
            stats[0, 2].astype(jnp.int32))
