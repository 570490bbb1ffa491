"""SIFT feature detection in JAX — TPU-native replacement for the reference's
CPU/GPU detectors (MVE: src/mve/sfm/sift.{h,cc}; CudaSift: src/cuda_sift/).

Algorithm and every threshold follow the MVE implementation (the reference's
de-facto matching engine, SURVEY.md §1): Gaussian scale space with S+3 images
per octave (sift.cc:212-261), strict 26-neighbour DoG extrema (sift.cc:284-331),
5-step Taylor localization with contrast/edge/offset filters (sift.cc:339-484),
36-bin orientation histograms smoothed 6× with 80%-peak multi-orientation
(sift.cc:598-667), and 4×4×8 trilinear descriptors with 0.2 clamping
(sift.cc:669-843).

Redesign for TPU: keypoints live in fixed-capacity arrays with validity masks;
per-pixel loops become convolutions/reductions; per-keypoint work is vmapped
patch gathers (dynamic_slice) over stacked per-octave gradient images. Each
octave shape compiles once; capacities bound memory.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# MVE defaults (sift.h:48-90, sift.cc:226-236)
SAMPLES = 3  # num_samples_per_octave
BASE_BLUR = 1.6
INHERENT_BLUR = 0.5
MAX_OCTAVE = 4
CONTRAST_THRESHOLD = 0.02 / SAMPLES
EDGE_RATIO = 10.0
N_ORI_BINS = 36
MAX_ORIENTATIONS = 4  # peaks kept per keypoint
ORI_PATCH = 37  # covers win = int(4.5 * sigma_max) = 18
DESC_PATCH = 85  # covers win = int(sqrt(2) * 3 * sigma_max * 2.5) = 42

K_FACTOR = 2.0 ** (1.0 / SAMPLES)


def _odd(n: int) -> int:
    return n if n % 2 == 1 else n - 1


class OctaveFeatures(NamedTuple):
    x: jnp.ndarray  # (K,) octave-relative
    y: jnp.ndarray
    sample: jnp.ndarray  # (K,) refined scale sample
    orientation: jnp.ndarray  # (K,)
    desc: jnp.ndarray  # (K, 128)
    valid: jnp.ndarray  # (K,)


class Features(NamedTuple):
    """Per-image features in input-image pixel coordinates."""

    xy: jnp.ndarray  # (K, 2)
    scale: jnp.ndarray  # (K,) absolute scale
    orientation: jnp.ndarray  # (K,)
    desc: jnp.ndarray  # (K, 128)
    valid: jnp.ndarray  # (K,)


# ---------------------------------------------------------------------------
# Image pyramid


def grayscale(rgb):
    """uint8 RGB -> float gray via channel average (MVE DESATURATE_AVERAGE)."""
    return jnp.mean(rgb.astype(jnp.float32), axis=-1) / 255.0


def _gauss_kernel(sigma: float):
    # MVE blur_gaussian kernel radius: ceil(sigma * 2.884) (image_tools.h)
    r = max(int(math.ceil(sigma * 2.884)), 1)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return jnp.asarray(k / k.sum(), jnp.float32)


def gaussian_blur(img, sigma: float):
    """Separable Gaussian blur with edge-replicate padding."""
    k = _gauss_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    img = jax.lax.conv_general_dilated(
        p[None, None], k[None, None, :, None], (1, 1), "VALID")[0, 0]
    p = jnp.pad(img, ((0, 0), (r, r)), mode="edge")
    return jax.lax.conv_general_dilated(
        p[None, None], k[None, None, None, :], (1, 1), "VALID")[0, 0]


def half_size_gaussian(img):
    """Gaussian-weighted 2× downsample, σ=0.866 over the 4×4 support
    (MVE rescale_half_size_gaussian, image_tools.h:619-693)."""
    sigma = 0.866025403784439
    w1 = math.exp(-0.5 / (2.0 * sigma**2))
    w2 = math.exp(-2.5 / (2.0 * sigma**2))
    w3 = math.exp(-4.5 / (2.0 * sigma**2))
    kernel = np.array(
        [[w3, w2, w2, w3], [w2, w1, w1, w2], [w2, w1, w1, w2], [w3, w2, w2, w3]],
        np.float32,
    )
    kernel /= kernel.sum()
    h, w = img.shape
    # Output (x,y) reads input rows/cols (2y-1 .. 2y+2) with edge clamping
    p = jnp.pad(img, ((1, 2), (1, 2)), mode="edge")
    out = jax.lax.conv_general_dilated(
        p[None, None], jnp.asarray(kernel)[None, None], (2, 2), "VALID")[0, 0]
    return out[: (h + 1) // 2, : (w + 1) // 2]


def build_octave(base, has_sigma: float):
    """(S+3) blurred images + (S+2) DoGs for one octave (sift.cc:212-261)."""
    target = BASE_BLUR
    if target > has_sigma:
        base = gaussian_blur(base, math.sqrt(target**2 - has_sigma**2))
    imgs = [base]
    sigma = target
    dogs = []
    for _ in range(1, SAMPLES + 3):
        sigmak = sigma * K_FACTOR
        blur = math.sqrt(sigmak**2 - sigma**2)
        nxt = gaussian_blur(imgs[-1], blur)
        imgs.append(nxt)
        dogs.append(nxt - imgs[-2])
        sigma = sigmak
    return jnp.stack(imgs), jnp.stack(dogs)


# ---------------------------------------------------------------------------
# Extrema detection + localization (per octave)


def _neighborhood_max_min(dogs):
    """For every DoG triplet (s, s+1, s+2): strict 26-neighbour extremum mask
    of the middle image (sift.cc:284-331). dogs: (S+2, H, W) →
    (S, H, W) bool extremum masks (borders excluded)."""
    S2, H, W = dogs.shape
    masks = []
    for s in range(S2 - 2):
        tri = dogs[s : s + 3]  # (3, H, W)
        center = tri[1]
        larger = jnp.ones_like(center, bool)
        smaller = jnp.ones_like(center, bool)
        for l in range(3):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if l == 1 and dy == 0 and dx == 0:
                        continue
                    n = jnp.roll(tri[l], (-dy, -dx), axis=(0, 1))
                    larger = larger & (n < center)
                    smaller = smaller & (n > center)
        m = larger | smaller
        border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
        masks.append(m & border)
    return jnp.stack(masks)


def detect_extrema(dogs, cap: int):
    """Top-`cap` extrema by |DoG| response. Returns (s, y, x, valid)."""
    masks = _neighborhood_max_min(dogs)  # (S, H, W)
    S, H, W = masks.shape
    vals = jnp.abs(dogs[1 : 1 + S])  # center image of each triplet
    score = jnp.where(masks, vals, -1.0).reshape(-1)
    k = min(cap, score.shape[0])
    top, idx = jax.lax.top_k(score, k)
    if k < cap:  # tiny octave: pad result slots up to the static capacity
        top = jnp.pad(top, (0, cap - k), constant_values=-1.0)
        idx = jnp.pad(idx, (0, cap - k))
    valid = top > 0.0
    s = idx // (H * W)
    rem = idx % (H * W)
    return s, rem // W, rem % W, valid


def localize_keypoints(dogs, s, y, x, valid):
    """Taylor localization with up to 5 re-centering iterations + stability
    filters (sift.cc:339-484). Returns refined (x, y, sample, valid)."""
    S2, H, W = dogs.shape

    def one(s0, iy0, ix0, ok):
        def deriv(ix, iy):
            # 3×3×3 neighbourhood of (s0+1 center scale handled via slices)
            nb = jax.lax.dynamic_slice(dogs, (s0, iy - 1, ix - 1), (3, 3, 3))
            Dx = 0.5 * (nb[1, 1, 2] - nb[1, 1, 0])
            Dy = 0.5 * (nb[1, 2, 1] - nb[1, 0, 1])
            Ds = 0.5 * (nb[2, 1, 1] - nb[0, 1, 1])
            Dxx = nb[1, 1, 2] + nb[1, 1, 0] - 2 * nb[1, 1, 1]
            Dyy = nb[1, 2, 1] + nb[1, 0, 1] - 2 * nb[1, 1, 1]
            Dss = nb[2, 1, 1] + nb[0, 1, 1] - 2 * nb[1, 1, 1]
            Dxy = 0.25 * (nb[1, 2, 2] + nb[1, 0, 0] - nb[1, 0, 2] - nb[1, 2, 0])
            Dxs = 0.25 * (nb[2, 1, 2] + nb[0, 1, 0] - nb[2, 1, 0] - nb[0, 1, 2])
            Dys = 0.25 * (nb[2, 2, 1] + nb[0, 0, 1] - nb[2, 0, 1] - nb[0, 2, 1])
            return nb[1, 1, 1], jnp.array([Dx, Dy, Ds]), jnp.array(
                [[Dxx, Dxy, Dxs], [Dxy, Dyy, Dys], [Dxs, Dys, Dss]])

        def body(_, carry):
            ix, iy, fx, fy, fs, g, A = carry
            center, g, A = deriv(ix, iy)
            detA = jnp.linalg.det(A)
            singular = jnp.abs(detA) < 1e-15
            sol = jnp.linalg.solve(
                jnp.where(singular, jnp.eye(3, dtype=A.dtype), A), -g)
            sol = jnp.where(singular, jnp.zeros(3, A.dtype), sol)
            fx, fy, fs = sol[0], sol[1], sol[2]
            dx = jnp.where((fx > 0.6) & (ix < W - 2), 1, 0) + jnp.where(
                (fx < -0.6) & (ix > 1), -1, 0)
            dy = jnp.where((fy > 0.6) & (iy < H - 2), 1, 0) + jnp.where(
                (fy < -0.6) & (iy > 1), -1, 0)
            return (ix + dx, iy + dy, fx, fy, fs, g, A)

        init = (ix0, iy0, 0.0, 0.0, 0.0, jnp.zeros(3), jnp.eye(3))
        ix, iy, fx, fy, fs, g, A = jax.lax.fori_loop(0, 5, body, init)
        center, g, A = deriv(ix, iy)
        val = center + 0.5 * (g[0] * fx + g[1] * fy + g[2] * fs)
        Dxx, Dyy, Dxy = A[0, 0], A[1, 1], A[0, 1]
        h_trace = Dxx + Dyy
        h_det = Dxx * Dyy - Dxy * Dxy
        h_score = h_trace * h_trace / jnp.where(jnp.abs(h_det) < 1e-20, 1e-20, h_det)
        score_thres = (EDGE_RATIO + 1.0) ** 2 / EDGE_RATIO

        kx = ix.astype(jnp.float32) + fx
        ky = iy.astype(jnp.float32) + fy
        ks = s0.astype(jnp.float32) + fs
        ok = (ok
              & (jnp.abs(val) >= CONTRAST_THRESHOLD)
              & (h_score >= 0.0) & (h_score <= score_thres)
              & (jnp.abs(fx) <= 1.5) & (jnp.abs(fy) <= 1.5) & (jnp.abs(fs) <= 1.0)
              & (ks >= -1.0) & (ks <= float(SAMPLES))
              & (kx >= 0.0) & (kx <= float(W - 1))
              & (ky >= 0.0) & (ky <= float(H - 1)))
        return kx, ky, ks, ok

    # Clamp starting points so dynamic_slice stays in range even for invalid slots
    s_c = jnp.clip(s, 0, S2 - 3)
    y_c = jnp.clip(y, 1, H - 2)
    x_c = jnp.clip(x, 1, W - 2)
    return jax.vmap(one)(s_c, y_c, x_c, valid)


# ---------------------------------------------------------------------------
# Gradients, orientations, descriptors (per octave)


def grad_ori_images(imgs):
    """Gradient magnitude + orientation ∈ [0, 2π) per sample image
    (sift.cc:556-594). Border pixels carry zeros like MVE's uninitialized=0."""
    dx = 0.5 * (jnp.roll(imgs, -1, axis=2) - jnp.roll(imgs, 1, axis=2))
    dy = 0.5 * (jnp.roll(imgs, -1, axis=1) - jnp.roll(imgs, 1, axis=1))
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx)
    ori = jnp.where(ori < 0.0, ori + 2.0 * jnp.pi, ori)
    border = jnp.zeros(imgs.shape[1:], bool).at[1:-1, 1:-1].set(True)
    return mag * border[None], ori * border[None]


def _rel_scale(sample):
    return BASE_BLUR * 2.0 ** ((sample + 1.0) / SAMPLES)


def _gather_patch(stack, is_, cy, cx, size):
    """(S+3, H, W) stack → (size, size) patch of image is_ centered at (cy, cx),
    clamped to bounds (validity handled by caller's window checks)."""
    S3, H, W = stack.shape
    r = size // 2
    y0 = jnp.clip(cy - r, 0, H - size)
    x0 = jnp.clip(cx - r, 0, W - size)
    patch = jax.lax.dynamic_slice(stack, (jnp.clip(is_, 0, S3 - 1), y0, x0),
                                  (1, size, size))[0]
    return patch, y0, x0


def assign_orientations(kp_x, kp_y, kp_s, valid, grads, oris,
                        patch: int = ORI_PATCH):
    """36-bin histogram orientation assignment (sift.cc:598-667).

    Returns (orientations (K, MAX_ORIENTATIONS), ori_valid (K, MAX_ORIENTATIONS)).
    """
    S3, H, W = grads.shape

    def one(kx, ky, ks, ok):
        ix = jnp.floor(kx + 0.5).astype(jnp.int32)
        iy = jnp.floor(ky + 0.5).astype(jnp.int32)
        is_ = jnp.round(ks).astype(jnp.int32) + 1
        sigma = _rel_scale(ks)
        win = (sigma * 1.5 * 3.0).astype(jnp.int32)
        in_bounds = ((ix >= win) & (ix + win < W) & (iy >= win) & (iy + win < H)
                     & (win <= patch // 2))

        gpatch, y0, x0 = _gather_patch(grads, is_, iy, ix, patch)
        opatch, _, _ = _gather_patch(oris, is_, iy, ix, patch)
        dy = (jnp.arange(patch) + y0 - iy)[:, None]
        dx = (jnp.arange(patch) + x0 - ix)[None, :]
        dxf = kx - ix.astype(jnp.float32)
        dyf = ky - iy.astype(jnp.float32)
        dist = (dx - dxf) ** 2 + (dy - dyf) ** 2
        maxdist = (win * win).astype(jnp.float32) + 0.5
        inside = (dist <= maxdist) & (jnp.abs(dx) <= win) & (jnp.abs(dy) <= win)
        sig15 = sigma * 1.5
        weight = jnp.exp(-dist / (2.0 * sig15 * sig15))
        contrib = jnp.where(inside, gpatch * weight, 0.0)
        bins = jnp.clip((N_ORI_BINS * opatch / (2.0 * jnp.pi)).astype(jnp.int32),
                        0, N_ORI_BINS - 1)
        hist = jnp.zeros((N_ORI_BINS,)).at[bins.reshape(-1)].add(contrib.reshape(-1))

        # Smooth 6× with the reference's sequential in-place kernel
        def smooth(h):
            # MVE updates in place: hist[j] uses already-smoothed hist[j-1]'s
            # ORIGINAL value via 'prev'; equivalent to circular [1,1,1]/3 on
            # the ORIGINAL values. (sift.cc:641-653)
            return (jnp.roll(h, 1) + h + jnp.roll(h, -1)) / 3.0

        for _ in range(6):
            hist = smooth(hist)

        maxh = jnp.max(hist)
        h0 = jnp.roll(hist, 1)
        h2 = jnp.roll(hist, -1)
        is_peak = (hist > 0.8 * maxh) & (hist > h0) & (hist > h2)
        denom = h0 - 2.0 * hist + h2
        xoff = -0.5 * (h2 - h0) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        angles = 2.0 * jnp.pi * (xoff + jnp.arange(N_ORI_BINS) + 0.5) / N_ORI_BINS

        peak_score = jnp.where(is_peak, hist, -1.0)
        top_vals, top_idx = jax.lax.top_k(peak_score, MAX_ORIENTATIONS)
        ori_out = angles[top_idx]
        ori_ok = (top_vals > 0.0) & ok & in_bounds
        return ori_out, ori_ok

    return jax.vmap(one)(kp_x, kp_y, kp_s, valid)


def compute_descriptors(kp_x, kp_y, kp_s, orientation, valid, grads, oris,
                        patch: int = DESC_PATCH):
    """4×4×8 trilinear SIFT descriptors (sift.cc:669-843).

    All inputs flat per (keypoint, orientation) pair. Returns (desc (K, 128),
    valid (K,)).
    """
    S3, H, W = grads.shape
    PXB, OHB = 4, 8

    def one(kx, ky, ks, ori_angle, ok):
        ix = jnp.floor(kx + 0.5).astype(jnp.int32)
        iy = jnp.floor(ky + 0.5).astype(jnp.int32)
        is_ = jnp.round(ks).astype(jnp.int32) + 1
        dxf = kx - ix.astype(jnp.float32)
        dyf = ky - iy.astype(jnp.float32)
        sigma = _rel_scale(ks)
        binsize = 3.0 * sigma
        win = (jnp.sqrt(2.0) * binsize * (PXB + 1) * 0.5).astype(jnp.int32)
        in_bounds = ((ix >= win) & (ix + win < W) & (iy >= win) & (iy + win < H)
                     & (win <= patch // 2))

        gpatch, y0, x0 = _gather_patch(grads, is_, iy, ix, patch)
        opatch, _, _ = _gather_patch(oris, is_, iy, ix, patch)
        dy = (jnp.arange(patch) + y0 - iy)[:, None] * jnp.ones((1, patch))
        dx = (jnp.arange(patch) + x0 - ix)[None, :] * jnp.ones((patch, 1))
        window = (jnp.abs(dx) <= win) & (jnp.abs(dy) <= win)

        theta = opatch - ori_angle
        theta = jnp.where(theta < 0.0, theta + 2.0 * jnp.pi, theta)
        winx = dx - dxf
        winy = dy - dyf
        sino, coso = jnp.sin(ori_angle), jnp.cos(ori_angle)
        binoff = (PXB - 1) / 2.0
        binx = (coso * winx + sino * winy) / binsize + binoff
        biny = (-sino * winx + coso * winy) / binsize + binoff
        bint = theta * OHB / (2.0 * jnp.pi) - 0.5

        gsigma = 0.5 * PXB
        gweight = jnp.exp(-((binx - binoff) ** 2 + (biny - binoff) ** 2)
                          / (2.0 * gsigma * gsigma))
        contrib = jnp.where(window, gpatch * gweight, 0.0)

        bx0 = jnp.floor(binx).astype(jnp.int32)
        by0 = jnp.floor(biny).astype(jnp.int32)
        bt0 = jnp.floor(bint).astype(jnp.int32)
        wx1 = binx - bx0.astype(jnp.float32)
        wy1 = biny - by0.astype(jnp.float32)
        wt1 = bint - bt0.astype(jnp.float32)

        desc = jnp.zeros((129,))
        for xo in (0, 1):
            for yo in (0, 1):
                for to in (0, 1):
                    bx = bx0 + xo
                    by = by0 + yo
                    bt = (bt0 + to) % OHB
                    wx = wx1 if xo else (1.0 - wx1)
                    wy = wy1 if yo else (1.0 - wy1)
                    wt = wt1 if to else (1.0 - wt1)
                    w = contrib * wx * wy * wt
                    okbin = (bx >= 0) & (bx < PXB) & (by >= 0) & (by < PXB)
                    idx = jnp.where(okbin, bt + bx * OHB + by * OHB * PXB, 128)
                    desc = desc.at[idx.reshape(-1)].add(
                        jnp.where(okbin, w, 0.0).reshape(-1))
        d = desc[:128]
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
        d = jnp.minimum(d, 0.2)
        d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
        return d, ok & in_bounds

    chunks = _chunk((kp_x, kp_y, kp_s, orientation, valid), 128)
    return jax.lax.map(lambda args: jax.vmap(one)(*args), chunks)


def _chunk(arrs, size):
    """Reshape flat arrays to (n_chunks, size, ...) padding with zeros."""
    n = arrs[0].shape[0]
    n_pad = ((n + size - 1) // size) * size
    out = []
    for a in arrs:
        pad = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad).reshape((n_pad // size, size) + a.shape[1:]))
    return tuple(out)


def _extract_octave_body(base, has_sigma: float, cap: int):
    """Full per-octave feature extraction. base: (H, W) float image.

    Returns OctaveFeatures with capacity cap * MAX_ORIENTATIONS.
    """
    imgs, dogs = build_octave(base, has_sigma)
    H, W = base.shape
    ori_patch = min(ORI_PATCH, _odd(H), _odd(W))
    desc_patch = min(DESC_PATCH, _odd(H), _odd(W))
    s, y, x, valid = detect_extrema(dogs, cap)
    kx, ky, ks, valid = localize_keypoints(dogs, s, y, x, valid)
    grads, oris = grad_ori_images(imgs)
    ori_angles, ori_valid = assign_orientations(kx, ky, ks, valid, grads, oris,
                                                patch=ori_patch)

    # Flatten (keypoint, orientation) pairs
    K = kx.shape[0]
    M = MAX_ORIENTATIONS
    fx = jnp.repeat(kx, M)
    fy = jnp.repeat(ky, M)
    fs = jnp.repeat(ks, M)
    fo = ori_angles.reshape(-1)
    fv = ori_valid.reshape(-1)

    desc, dvalid = compute_descriptors(fx, fy, fs, fo, fv, grads, oris,
                                       patch=desc_patch)
    desc = desc.reshape(-1, 128)[: K * M]
    dvalid = dvalid.reshape(-1)[: K * M]
    return OctaveFeatures(x=fx, y=fy, sample=fs, orientation=fo,
                          desc=desc, valid=fv & dvalid)


extract_octave = functools.partial(jax.jit, static_argnames=("has_sigma", "cap"))(
    _extract_octave_body)


@functools.partial(jax.jit, static_argnames=("has_sigma", "cap"))
def extract_octave_batch(bases, has_sigma: float, cap: int):
    """vmapped per-octave extraction over a (V, H, W) view stack — one
    compiled program detects/describes every view's octave at once (the
    per-view host loop costs one full dispatch chain per view otherwise)."""
    return jax.vmap(lambda b: _extract_octave_body(b, has_sigma, cap))(bases)


def double_size_supersample(img):
    """2× upscale by 4-tap supersampling with edge clamping — bit-matches
    MVE's rescale_double_size_supersample (mve/mve/image_tools.h:790-826):
    out[y,x] averages in[y>>1, x>>1], in[y>>1,(x+1)>>1], in[(y+1)>>1, x>>1]
    and in[(y+1)>>1,(x+1)>>1]."""
    a = img
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    diag = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    H, W = img.shape
    top = jnp.stack([a, 0.5 * (a + right)], -1).reshape(H, 2 * W)
    bot = jnp.stack([0.5 * (a + down), 0.25 * (a + right + down + diag)],
                    -1).reshape(H, 2 * W)
    return jnp.stack([top, bot], 1).reshape(2 * H, 2 * W)


def extract(image_gray, per_octave_cap: int = 2048, max_octave: int = MAX_OCTAVE,
            min_octave: int = 0):
    """Multi-octave SIFT on a grayscale float image → Features in input-image
    pixel coordinates (x_img = 2^o·(x+0.5)−0.5, sift.cc:545-547).

    min_octave = −1 prepends the 2× upscale octave: the doubled image carries
    inherent blur 2·0.5 = 1.0 (sift.cc:178-184; the CudaSift path always runs
    with this upscale, cudaSiftH.cu:114-129 / matching.cpp:47-52)."""
    assert min_octave >= -1, "octaves below -1 are not defined"
    all_feats = []
    img = image_gray
    has_sigma = INHERENT_BLUR
    for o in range(min_octave, max_octave + 1):
        if o == -1:
            img = double_size_supersample(image_gray)
            has_sigma = INHERENT_BLUR * 2.0
        elif o == 0:
            # Octave 0 always starts from the original image (sift.cc:195-199)
            img = image_gray
            has_sigma = INHERENT_BLUR
        h, w = img.shape
        if min(h, w) < 16:
            break
        of = extract_octave(img, has_sigma, per_octave_cap)
        sf = 2.0**o
        xy = jnp.stack([sf * (of.x + 0.5) - 0.5, sf * (of.y + 0.5) - 0.5], -1)
        scale = BASE_BLUR * 2.0 ** (o + (of.sample + 1.0) / SAMPLES)
        all_feats.append(Features(xy=xy, scale=scale, orientation=of.orientation,
                                  desc=of.desc, valid=of.valid))
        if o >= 0:
            img = half_size_gaussian(img)
            has_sigma = BASE_BLUR
    return Features(
        xy=jnp.concatenate([f.xy for f in all_feats]),
        scale=jnp.concatenate([f.scale for f in all_feats]),
        orientation=jnp.concatenate([f.orientation for f in all_feats]),
        desc=jnp.concatenate([f.desc for f in all_feats]),
        valid=jnp.concatenate([f.valid for f in all_feats]),
    )


def extract_batch(images, per_octave_cap: int = 2048,
                  max_octave: int = MAX_OCTAVE, min_octave: int = 0):
    """Batched multi-octave SIFT over a (V, H, W) stack of same-shape images.

    Identical per-view semantics to extract(); all returned Features fields
    carry a leading V axis. One compiled program per octave serves every
    view — the TPU-first replacement for MVE's per-view omp loop
    (bundler_features.cc:40)."""
    assert min_octave >= -1, "octaves below -1 are not defined"
    all_feats = []
    img = images
    has_sigma = INHERENT_BLUR
    for o in range(min_octave, max_octave + 1):
        if o == -1:
            img = jax.vmap(double_size_supersample)(images)
            has_sigma = INHERENT_BLUR * 2.0
        elif o == 0:
            img = images
            has_sigma = INHERENT_BLUR
        h, w = img.shape[1:]
        if min(h, w) < 16:
            break
        of = extract_octave_batch(img, has_sigma, per_octave_cap)
        sf = 2.0**o
        xy = jnp.stack([sf * (of.x + 0.5) - 0.5, sf * (of.y + 0.5) - 0.5], -1)
        scale = BASE_BLUR * 2.0 ** (o + (of.sample + 1.0) / SAMPLES)
        all_feats.append(Features(xy=xy, scale=scale,
                                  orientation=of.orientation,
                                  desc=of.desc, valid=of.valid))
        if o >= 0:
            img = jax.vmap(half_size_gaussian)(img)
            has_sigma = BASE_BLUR
    return Features(
        xy=jnp.concatenate([f.xy for f in all_feats], axis=1),
        scale=jnp.concatenate([f.scale for f in all_feats], axis=1),
        orientation=jnp.concatenate([f.orientation for f in all_feats], axis=1),
        desc=jnp.concatenate([f.desc for f in all_feats], axis=1),
        valid=jnp.concatenate([f.valid for f in all_feats], axis=1),
    )
