"""Synthetic image rendering for full-pipeline tests.

The reference's full-pipeline tests rely on external image datasets
(README.md:24-27, not in the repo). To exercise the image→features→matching→
tracks→poses path hermetically, we render orthographic views of a procedurally
textured sphere: each pixel's ray (orthographic, along the camera look
direction) is intersected with the sphere and the 3D hit point is shaded with
a band-limited random-Fourier 3D texture. Texture is rigid on the surface, so
local appearance is repeatable across moderate viewpoint changes — the same
regime as the reference's real/synthetic object datasets.
"""

from __future__ import annotations

from typing import List

import numpy as np

from orthosfm_tpu.core import cameras as cam_mod


class FourierTexture3D:
    """Smooth random 3D texture f(p) = Σ a_k cos(w_k·p + φ_k), values ≈ [0,1]."""

    def __init__(self, n_components: int = 80, max_freq: float = 40.0, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.w = rng.uniform(-max_freq, max_freq, (n_components, 3))
        self.phase = rng.uniform(0, 2 * np.pi, n_components)
        self.amp = rng.uniform(0.5, 1.0, n_components) / np.sqrt(n_components)

    def __call__(self, pts: np.ndarray) -> np.ndarray:
        v = np.cos(pts @ self.w.T + self.phase) @ self.amp
        return 0.5 + 0.35 * np.tanh(1.5 * v)


def render_sphere_views(gt_cams: cam_mod.CameraSet, width: int, height: int,
                        radius: float = 0.75, texture: FourierTexture3D | None = None,
                        ) -> List[np.ndarray]:
    """Render each camera's orthographic view of the textured sphere."""
    import jax.numpy as jnp

    texture = texture or FourierTexture3D()
    R_all = np.asarray(cam_mod.basis(gt_cams), np.float64)  # (V, 3, 3)
    o_all = np.einsum("vij,j->vi", R_all, [0.0, 0.0, -cam_mod.CAMERA_DISTANCE])
    scales = np.asarray(gt_cams.scale, np.float64)
    offsets = np.asarray(gt_cams.offset, np.float64)

    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    px, py = np.meshgrid(xs, ys)  # (H, W)

    images = []
    for v in range(len(gt_cams)):
        R = R_all[v]
        # Pixel → point on camera plane (reference: OrthographicCamera.cpp:187-193)
        xn = -2.0 * (px / width - 0.5) + offsets[v, 0]
        yn = -2.0 * (py / height - 0.5) + offsets[v, 1]
        origin = (o_all[v][None, None]
                  + scales[v] * (xn[..., None] * R[:, 0] + yn[..., None] * R[:, 1]))
        d = R[:, 2]  # look direction (unit)
        # Ray-sphere: |o + t d|² = r² with unit d
        b = origin @ d
        c = np.sum(origin * origin, axis=-1) - radius * radius
        disc = b * b - c
        hit = disc > 0.0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        p_hit = origin + t[..., None] * d
        shade = np.full((height, width), 0.55)
        # Slight lambert-style modulation for silhouette stability
        normal = p_hit / radius
        lam = 0.75 + 0.25 * np.clip(-(normal @ d), 0.0, 1.0)
        tex = texture(p_hit[hit])
        shade[hit] = tex * lam[hit]
        g = (np.clip(shade, 0, 1) * 255).astype(np.uint8)
        images.append(np.stack([g, g, g], axis=-1))
    return images


def make_image_dataset(folder: str, num_views: int = 8, width: int = 256,
                       height: int = 256, seed: int = 0,
                       theta_range: float = 10.0, roll_range: float = 6.0,
                       ring_degrees: float = 360.0, radius: float = 0.75):
    """Write a synthetic textured-sphere image dataset; returns GT cameras."""
    import os

    from PIL import Image

    rng = np.random.default_rng(seed)
    phis = np.deg2rad(np.linspace(0.0, ring_degrees, num_views, endpoint=False))
    thetas = np.deg2rad(rng.uniform(-theta_range, theta_range, num_views))
    rolls = np.deg2rad(rng.uniform(-roll_range, roll_range, num_views))
    thetas[0] = rolls[0] = 0.0
    angles = np.stack([phis, thetas, rolls], -1).astype(np.float32)
    gt = cam_mod.make_euler(np.arange(num_views), width, height, angles=angles)

    texture = FourierTexture3D(seed=seed + 17)
    images = render_sphere_views(gt, width, height, radius=radius, texture=texture)
    os.makedirs(folder, exist_ok=True)
    for i, img in enumerate(images):
        Image.fromarray(img).save(os.path.join(folder, f"view_{i:02d}.png"))
    return gt
