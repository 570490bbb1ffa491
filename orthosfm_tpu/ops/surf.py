"""SURF feature detection in JAX (64-d descriptors).

Replacement for MVE's SURF (src/mve/sfm/surf.{h,cc}), part of the reference's
FEATURE_ALL default (matching_mve.cpp:333). Algorithm follows MVE exactly:
integral-image box-filter Hessian responses with filter sizes 3·fs for
fs ∈ kernel_sizes[octave][sample] (surf.cc:28-34), det(H) = Dxx·Dyy − 0.912·Dxy²
(surf.cc:160-213), strict 3×3×3 non-maximum suppression on the two middle
samples (surf.cc:310-375), single-step 3×3×3 quadratic localization with
|offset| ≤ 0.5 and contrast ≥ 500 (surf.cc:356-475), sliding-window Haar
orientation (surf.cc:519-617) and the 4×4 × (Σdx, Σdy, Σ|dx|, Σ|dy|)
descriptor with σ = 3.3s weighting (surf.cc:663-733).

TPU design notes: the summed-area table is int32 (exact for ≤8 MP byte
images — the reference caps at 6 MP); response maps are shifted-slice
differences of the SAT (no scatter/loops); keypoints are fixed-capacity
top-k; orientation/descriptor stages are vmapped SAT gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

KERNEL_SIZES = np.array([
    [3, 5, 7, 9],
    [5, 9, 13, 17],
    [9, 17, 25, 33],
    [17, 33, 49, 65],
])
CONTRAST_THRESHOLD = 500.0
HESSIAN_WEIGHT = 0.912
N_OCTAVES = 4


class SurfFeatures(NamedTuple):
    xy: jnp.ndarray  # (K, 2) input-image pixels
    scale: jnp.ndarray  # (K,)
    orientation: jnp.ndarray  # (K,)
    desc: jnp.ndarray  # (K, 64)
    valid: jnp.ndarray  # (K,)


def integral_image(gray01):
    """int32 SAT of the byte-scaled image: S[y, x] = Σ_{j≤y, i≤x} img255."""
    img = jnp.round(gray01 * 255.0).astype(jnp.int32)
    return jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)


def _shift(S, dy, dx, step: int = 1):
    """S[y·step+dy, x·step+dx] over the strided output grid, zero-padded out of
    range (valid pixels are interior anyway thanks to the border handling).
    Computing directly on the stride-decimated grid avoids 4^octave wasted
    work in the higher octaves."""
    H, W = S.shape
    oh = (H + step - 1) // step
    ow = (W + step - 1) // step
    pad = jnp.pad(S, ((abs(dy), abs(dy) + step), (abs(dx), abs(dx) + step)))
    return jax.lax.slice(pad, (abs(dy) + dy, abs(dx) + dx),
                         (abs(dy) + dy + (oh - 1) * step + 1,
                          abs(dx) + dx + (ow - 1) * step + 1),
                         (step, step))


def _response_map(S, fs: int, step: int):
    """det(H) response map at one (octave, sample): exact transcription of
    filter_dxx/dyy/dxy (surf.cc:218-305) as shifted-slice arithmetic."""
    fs2 = fs // 2
    H, W = S.shape

    def at(dy, dx):
        return _shift(S, dy, dx, step)

    # filter_dxx: rows y−fs, y+fs−1; cols x−fs−fs2−1 + {0, fs, 2fs, 3fs}
    c0 = -fs - fs2 - 1
    v0 = at(-fs, c0); v1 = at(-fs, c0 + fs); v2 = at(-fs, c0 + 2 * fs); v3 = at(-fs, c0 + 3 * fs)
    r2 = fs - 1
    v4 = at(r2, c0); v5 = at(r2, c0 + fs); v6 = at(r2, c0 + 2 * fs); v7 = at(r2, c0 + 3 * fs)
    dxx = (v5 + v0 - v4 - v1) - 2 * (v6 + v1 - v5 - v2) + (v7 + v2 - v6 - v3)

    # filter_dyy (transposed pattern): rows y−fs−fs2−1 + {0, fs, 2fs, 3fs};
    # cols x−fs, x+fs−1
    r0 = -fs - fs2 - 1
    w0 = at(r0, -fs); w1 = at(r0 + fs, -fs); w2 = at(r0 + 2 * fs, -fs); w3 = at(r0 + 3 * fs, -fs)
    cc = fs - 1
    w4 = at(r0, cc); w5 = at(r0 + fs, cc); w6 = at(r0 + 2 * fs, cc); w7 = at(r0 + 3 * fs, cc)
    dyy = (w5 + w0 - w1 - w4) - 2 * (w6 + w1 - w2 - w5) + (w7 + w2 - w3 - w6)

    # filter_dxy: four signed fs×fs boxes around the center
    def box(y0, x0, y1, x1):
        return at(y1, x1) + at(y0, x0) - at(y0, x1) - at(y1, x0)

    a = -fs - 1
    dxy = (box(a, a, a + fs, a + fs)
           - box(a, 0, a + fs, fs)
           - box(0, a, fs, a + fs)
           + box(0, 0, fs, fs))

    inv_karea = 1.0 / (fs * (2 * fs - 1))
    dxx_t = dxx.astype(jnp.float32) * inv_karea
    dyy_t = dyy.astype(jnp.float32) * inv_karea
    dxy_t = dxy.astype(jnp.float32) * inv_karea
    resp = dxx_t * dyy_t - HESSIAN_WEIGHT * dxy_t * dxy_t

    # Zero the border (surf.cc:191-199); coordinates are full-res x = step·i
    border = fs + fs2 + 1
    yy = jnp.arange(resp.shape[0])[:, None] * step
    xx = jnp.arange(resp.shape[1])[None, :] * step
    ok = (xx >= border) & (xx + border < W) & (yy >= border) & (yy + border < H)
    return jnp.where(ok, resp, 0.0)


def _octave_responses(S, o: int):
    step = 2**o
    return jnp.stack([_response_map(S, int(KERNEL_SIZES[o][k]), step)
                      for k in range(4)])


def _detect_octave(resp, cap: int):
    """Strict NMS over the two middle samples (surf.cc:310-343). resp: (4, h, w)."""
    h, w = resp.shape[1:]
    results = []
    for s in (1, 2):
        center = resp[s]
        ok = jnp.ones((h, w), bool)
        for l in (s - 1, s, s + 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if l == s and dy == 0 and dx == 0:
                        continue
                    ok = ok & (jnp.roll(resp[l], (-dy, -dx), (0, 1)) < center)
        interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
        results.append(ok & interior)
    mask = jnp.stack(results)  # (2, h, w)
    vals = jnp.stack([resp[1], resp[2]])
    score = jnp.where(mask, vals, -jnp.inf).reshape(-1)
    k = min(cap, score.shape[0])
    top, idx = jax.lax.top_k(score, k)
    if k < cap:
        top = jnp.pad(top, (0, cap - k), constant_values=-jnp.inf)
        idx = jnp.pad(idx, (0, cap - k))
    valid = jnp.isfinite(top) & (top > 0)
    s_idx = idx // (h * w) + 1
    rem = idx % (h * w)
    return s_idx, rem // w, rem % w, valid


def _localize_octave(resp, s, y, x, valid, o: int):
    """Single-iteration 3×3×3 quadratic localization (surf.cc:356-475)."""
    S4, h, w = resp.shape

    def one(s0, iy, ix, ok):
        nb = jax.lax.dynamic_slice(
            resp, (s0 - 1, jnp.clip(iy - 1, 0, h - 3), jnp.clip(ix - 1, 0, w - 3)),
            (3, 3, 3))
        b = -jnp.array([
            0.5 * (nb[1, 1, 2] - nb[1, 1, 0]),
            0.5 * (nb[1, 2, 1] - nb[1, 0, 1]),
            0.5 * (nb[2, 1, 1] - nb[0, 1, 1]),
        ])
        Axx = nb[1, 1, 0] - 2 * nb[1, 1, 1] + nb[1, 1, 2]
        Ayy = nb[1, 0, 1] - 2 * nb[1, 1, 1] + nb[1, 2, 1]
        Ass = nb[0, 1, 1] - 2 * nb[1, 1, 1] + nb[2, 1, 1]
        Axy = 0.25 * (nb[1, 2, 2] - nb[1, 2, 0] - nb[1, 0, 2] + nb[1, 0, 0])
        Axs = 0.25 * (nb[2, 1, 2] - nb[2, 1, 0] - nb[0, 1, 2] + nb[0, 1, 0])
        Ays = 0.25 * (nb[2, 2, 1] - nb[2, 0, 1] - nb[0, 2, 1] + nb[0, 0, 1])
        A = jnp.array([[Axx, Axy, Axs], [Axy, Ayy, Ays], [Axs, Ays, Ass]])
        det = jnp.linalg.det(A)
        singular = jnp.abs(det) < 1e-5
        sol = jnp.linalg.solve(jnp.where(singular, jnp.eye(3), A), b)
        off_ok = (jnp.max(jnp.abs(sol)) <= 0.5) & ~singular
        # MVE: dog_value = N9[1][4] - 0.5 * vec_b.dot(vec_x) with vec_b = -g
        value = nb[1, 1, 1] - 0.5 * jnp.dot(b, sol)
        contrast_ok = value >= CONTRAST_THRESHOLD
        sampling = 2.0**o
        fx = (ix.astype(jnp.float32) + sol[0]) * sampling
        fy = (iy.astype(jnp.float32) + sol[1]) * sampling
        fsamp = s0.astype(jnp.float32) + sol[2]
        return fx, fy, fsamp, ok & off_ok & contrast_ok

    return jax.vmap(one)(s, y, x, valid)


# Precomputed circular offsets for the orientation window (surf.cc:558-576)
_ORI_OFFSETS = np.array([(rx, ry) for ry in range(-5, 6) for rx in range(-5, 6)
                         if rx * rx + ry * ry < 36])
_ORI_GAUSS = np.exp(-(_ORI_OFFSETS[:, 0] ** 2 + _ORI_OFFSETS[:, 1] ** 2)
                    / (2.0 * 2.5**2))


def _sat_at(S, y, x):
    H, W = S.shape
    yc = jnp.clip(y, 0, H - 1)
    xc = jnp.clip(x, 0, W - 1)
    return S[yc, xc]


def _haar_dx_dy(S, x, y, fs):
    """Haar wavelet responses (surf.cc:623-659); x, y, fs traced ints."""
    w = 1  # lookups are explicit 2-D indices here
    x1 = _sat_at(S, y - fs - 1, x - fs - 1)
    x2 = _sat_at(S, y - fs - 1, x - 1)
    x3 = _sat_at(S, y - fs - 1, x)
    x4 = _sat_at(S, y - fs - 1, x + fs)
    x5 = _sat_at(S, y + fs, x - fs - 1)
    x6 = _sat_at(S, y + fs, x - 1)
    x7 = _sat_at(S, y + fs, x)
    x8 = _sat_at(S, y + fs, x + fs)
    y1 = _sat_at(S, y - 1, x - fs - 1)
    y2 = _sat_at(S, y - 1, x + fs)
    y3 = _sat_at(S, y, x - fs - 1)
    y4 = _sat_at(S, y, x + fs)
    norm = ((2 * fs + 1) * fs * (fs + 1)).astype(jnp.float32)
    dx = ((x8 + x2 - x4 - x6) - (x7 + x1 - x3 - x5)).astype(jnp.float32) / norm
    dy = ((x8 + y1 - x5 - y2) - (y4 + x1 - y3 - x4)).astype(jnp.float32) / norm
    return dx, dy


def _orientation(S, kx, ky, scale, ok):
    """Dominant orientation via π/3 sliding windows (surf.cc:519-617)."""
    H, W = S.shape
    ix = jnp.floor(kx + 0.5).astype(jnp.int32)
    iy = jnp.floor(ky + 0.5).astype(jnp.int32)
    s = scale.astype(jnp.int32)
    spacing = 8 * s + 1
    in_bounds = (ix >= spacing) & (iy >= spacing) & (ix + spacing < W) & (iy + spacing < H)

    offs = jnp.asarray(_ORI_OFFSETS, jnp.int32)
    gauss = jnp.asarray(_ORI_GAUSS, jnp.float32)
    px = ix + offs[:, 0] * s
    py = iy + offs[:, 1] * s
    dx, dy = jax.vmap(lambda a, b: _haar_dx_dy(S, a, b, 2 * s))(px, py)
    dx = dx * gauss
    dy = dy * gauss
    ang = jnp.arctan2(dy, dx)

    centers = jnp.arange(-np.pi, np.pi, np.pi / 8.0)

    def window(c):
        lo, hi = c - np.pi / 6.0, c + np.pi / 6.0
        inside = (((ang > lo) & (ang < hi))
                  | ((ang + 2 * np.pi > lo) & (ang + 2 * np.pi < hi))
                  | ((ang - 2 * np.pi > lo) & (ang - 2 * np.pi < hi)))
        sx = jnp.sum(jnp.where(inside, dx, 0.0))
        sy = jnp.sum(jnp.where(inside, dy, 0.0))
        return sx * sx + sy * sy, sx, sy

    lengths, sxs, sys = jax.vmap(window)(centers)
    best = jnp.argmax(lengths)
    return jnp.arctan2(sys[best], sxs[best]), ok & in_bounds


def _descriptor(S, kx, ky, scale, ori, ok):
    """64-d SURF descriptor (surf.cc:663-733)."""
    H, W = S.shape
    s = scale.astype(jnp.int32)
    spacing = (15 * s + 1).astype(jnp.float32)
    in_bounds = ((kx >= spacing) & (ky >= spacing)
                 & (kx + spacing < W) & (ky + spacing <= H))
    sino, coso = jnp.sin(ori), jnp.cos(ori)

    grid = jnp.arange(-10, 10)
    gx, gy = jnp.meshgrid(grid, grid, indexing="xy")  # (20, 20)
    gxf = gx.astype(jnp.float32) + 0.5
    gyf = gy.astype(jnp.float32) + 0.5
    rot_x = jnp.floor(kx + (coso * gxf - sino * gyf) * s + 0.5).astype(jnp.int32)
    rot_y = jnp.floor(ky + (sino * gxf + coso * gyf) * s + 0.5).astype(jnp.int32)

    dx, dy = jax.vmap(jax.vmap(lambda a, b: _haar_dx_dy(S, a, b, s)))(rot_x, rot_y)
    odx = coso * dx + sino * dy
    ody = -sino * dx + coso * dy
    weight = jnp.exp(-(gx.astype(jnp.float32) ** 2 + gy.astype(jnp.float32) ** 2)
                     / (2.0 * 3.3) ** 2)
    stats = jnp.stack([weight * odx, weight * ody,
                       weight * jnp.abs(odx), weight * jnp.abs(ody)], -1)  # (20,20,4)
    blocks = stats.reshape(4, 5, 4, 5, 4).sum(axis=(1, 3))  # (yb, xb, 4)
    d = blocks.reshape(64)
    norm2 = jnp.sum(d * d)
    nonzero = norm2 > 1e-8
    d = d / jnp.sqrt(jnp.maximum(norm2, 1e-12))
    return d, ok & in_bounds & nonzero


def _extract_body(gray01, per_octave_cap: int = 1024) -> SurfFeatures:
    """Full SURF extraction on a grayscale [0,1] image."""
    S = integral_image(gray01)
    all_x, all_y, all_scale, all_valid = [], [], [], []
    for o in range(N_OCTAVES):
        resp = _octave_responses(S, o)
        s_idx, yy, xx, valid = _detect_octave(resp, per_octave_cap)
        fx, fy, fsamp, valid = _localize_octave(resp, s_idx, yy, xx, valid, o)
        samp_round = jnp.clip(jnp.floor(fsamp + 0.5).astype(jnp.int32), 0, 3)
        fs_tab = jnp.asarray(KERNEL_SIZES[o], jnp.float32)
        scale = 3.0 * fs_tab[samp_round] * 1.2 / 9.0
        all_x.append(fx)
        all_y.append(fy)
        all_scale.append(scale)
        all_valid.append(valid)

    kx = jnp.concatenate(all_x)
    ky = jnp.concatenate(all_y)
    scale = jnp.concatenate(all_scale)
    valid = jnp.concatenate(all_valid)

    ori, valid = jax.vmap(lambda a, b, c, d: _orientation(S, a, b, c, d))(
        kx, ky, scale, valid)
    desc, valid = jax.vmap(lambda a, b, c, d, e: _descriptor(S, a, b, c, d, e))(
        kx, ky, scale, ori, valid)
    return SurfFeatures(xy=jnp.stack([kx, ky], -1), scale=scale,
                        orientation=ori, desc=desc, valid=valid)


extract = functools.partial(jax.jit, static_argnames=("per_octave_cap",))(
    _extract_body)


@functools.partial(jax.jit, static_argnames=("per_octave_cap",))
def extract_batch(grays, per_octave_cap: int = 1024) -> SurfFeatures:
    """Batched SURF over a (V, H, W) same-shape stack; fields carry a
    leading V axis (see sift.extract_batch for the rationale)."""
    return jax.vmap(lambda g: _extract_body(g, per_octave_cap))(grays)
