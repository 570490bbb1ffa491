"""Direct SURF correctness tests against a straightforward NumPy
reimplementation of the reference algorithm (mve/sfm/surf.cc:160-475,
:519-733): integral image, box-filter Hessian responses with the 0.912
weight, strict NMS, quadratic localization with the contrast-500 gate,
Haar responses, sliding-window orientation and the 64-d descriptor.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from orthosfm_tpu.ops import surf

rng = np.random.default_rng(42)


def _np_sat(gray01):
    img = np.round(gray01 * 255.0).astype(np.int64)
    return img.cumsum(0).cumsum(1)


def _np_filter_dxx(S, fs, x, y):
    fs2 = fs // 2
    c0 = x - fs - fs2 - 1
    r1, r2 = y - fs, y + fs - 1
    v = [S[r1, c0], S[r1, c0 + fs], S[r1, c0 + 2 * fs], S[r1, c0 + 3 * fs],
         S[r2, c0], S[r2, c0 + fs], S[r2, c0 + 2 * fs], S[r2, c0 + 3 * fs]]
    return ((v[5] + v[0] - v[4] - v[1]) - 2 * (v[6] + v[1] - v[5] - v[2])
            + (v[7] + v[2] - v[6] - v[3]))


def _np_filter_dyy(S, fs, x, y):
    fs2 = fs // 2
    r0 = y - fs - fs2 - 1
    c1, c2 = x - fs, x + fs - 1
    v = [S[r0, c1], S[r0 + fs, c1], S[r0 + 2 * fs, c1], S[r0 + 3 * fs, c1],
         S[r0, c2], S[r0 + fs, c2], S[r0 + 2 * fs, c2], S[r0 + 3 * fs, c2]]
    return ((v[5] + v[0] - v[1] - v[4]) - 2 * (v[6] + v[1] - v[2] - v[5])
            + (v[7] + v[2] - v[3] - v[6]))


def _np_filter_dxy(S, fs, x, y):
    def box(y0, x0, y1, x1):
        return S[y + y1, x + x1] + S[y + y0, x + x0] - S[y + y0, x + x1] - S[y + y1, x + x0]

    a = -fs - 1
    return (box(a, a, a + fs, a + fs) - box(a, 0, a + fs, fs)
            - box(0, a, fs, a + fs) + box(0, 0, fs, fs))


def _np_response(S, fs, step):
    """Reference response map (surf.cc:159-216), double loop."""
    H, W = S.shape
    border = fs + fs // 2 + 1
    oh = (H + step - 1) // step
    ow = (W + step - 1) // step
    out = np.zeros((oh, ow), np.float32)
    inv_karea = 1.0 / (fs * (2 * fs - 1))
    for yi, y in enumerate(range(0, H, step)):
        for xi, x in enumerate(range(0, W, step)):
            if x < border or x + border >= W or y < border or y + border >= H:
                continue
            dxx = _np_filter_dxx(S, fs, x, y) * inv_karea
            dyy = _np_filter_dyy(S, fs, x, y) * inv_karea
            dxy = _np_filter_dxy(S, fs, x, y) * inv_karea
            out[yi, xi] = dxx * dyy - 0.912 * dxy * dxy
    return out


def _np_haar(S, x, y, fs):
    x1 = S[y - fs - 1, x - fs - 1]
    x2 = S[y - fs - 1, x - 1]
    x3 = S[y - fs - 1, x]
    x4 = S[y - fs - 1, x + fs]
    x5 = S[y + fs, x - fs - 1]
    x6 = S[y + fs, x - 1]
    x7 = S[y + fs, x]
    x8 = S[y + fs, x + fs]
    y1 = S[y - 1, x - fs - 1]
    y2 = S[y - 1, x + fs]
    y3 = S[y, x - fs - 1]
    y4 = S[y, x + fs]
    norm = float((2 * fs + 1) * fs * (fs + 1))
    dx = float((x8 + x2 - x4 - x6) - (x7 + x1 - x3 - x5)) / norm
    dy = float((x8 + y1 - x5 - y2) - (y4 + x1 - y3 - x4)) / norm
    return dx, dy


def _texture(H=96, W=96, seed=0):
    r = np.random.default_rng(seed)
    base = r.random((H // 8, W // 8))
    img = np.kron(base, np.ones((8, 8))) * 0.7 + r.random((H, W)) * 0.3
    return np.clip(img, 0, 1).astype(np.float32)


def test_integral_image_matches_numpy():
    img = _texture()
    S = np.asarray(surf.integral_image(jnp.asarray(img)))
    np.testing.assert_array_equal(S, _np_sat(img))


@pytest.mark.slow
def test_response_map_matches_numpy_reference():
    """det(H) = Dxx·Dyy − 0.912·Dxy² with the exact MVE box filters and the
    per-(octave, sample) border zeroing (surf.cc:159-305)."""
    img = _texture(seed=1)
    S_j = surf.integral_image(jnp.asarray(img))
    S = _np_sat(img)
    for o, k in [(0, 0), (0, 2), (1, 1)]:
        fs = int(surf.KERNEL_SIZES[o][k])
        step = 2 ** o
        ours = np.asarray(surf._response_map(S_j, fs, step))
        ref = _np_response(S, fs, step)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_nms_detection_matches_numpy_reference():
    """Strict 3×3×3 maximum suppression on the two middle samples
    (surf.cc:310-343): detected (s, y, x) sets must be identical."""
    img = _texture(seed=2)
    S_j = surf.integral_image(jnp.asarray(img))
    resp = np.asarray(surf._octave_responses(S_j, 0))
    s_idx, yy, xx, valid = (np.asarray(a) for a in
                            surf._detect_octave(jnp.asarray(resp), 512))
    ours = {(int(s), int(y), int(x)) for s, y, x, v in
            zip(s_idx, yy, xx, valid) if v}

    ref = set()
    h, w = resp.shape[1:]
    for s in (1, 2):
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                val = resp[s, y, x]
                if val <= 0:
                    continue
                nb = resp[s - 1:s + 2, y - 1:y + 2, x - 1:x + 2]
                if (nb < val).sum() == 26 and (nb >= val).sum() == 1:
                    ref.add((s, y, x))
    assert ours == ref and len(ref) > 5


def test_localization_contrast_gate_and_offsets():
    """Quadratic localization: solve A·x = −g on the 3×3×3 neighbourhood,
    reject |offset| > 0.5 or contrast < 500 (surf.cc:396-475)."""
    # Build a synthetic response stack with a known quadratic peak
    h = w = 32
    resp = np.zeros((4, h, w), np.float32)
    cy, cx, cs = 15.0 + 0.3, 16.0 - 0.2, 1.0 + 0.25
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for s in range(4):
        resp[s] = 2000.0 - 30.0 * ((yy - cy) ** 2 + (xx - cx) ** 2
                                   + 4.0 * (s - cs) ** 2)
    fx, fy, fsamp, ok = (np.asarray(a) for a in surf._localize_octave(
        jnp.asarray(resp), jnp.array([1]), jnp.array([15]), jnp.array([16]),
        jnp.array([True]), 0))
    assert bool(ok[0])
    np.testing.assert_allclose(fx[0], cx, atol=1e-3)
    np.testing.assert_allclose(fy[0], cy, atol=1e-3)
    np.testing.assert_allclose(fsamp[0], cs, atol=1e-3)

    # Contrast gate: same shape scaled below 500 must be rejected
    _, _, _, ok_low = (np.asarray(a) for a in surf._localize_octave(
        jnp.asarray(resp * 0.1), jnp.array([1]), jnp.array([15]),
        jnp.array([16]), jnp.array([True]), 0))
    assert not bool(ok_low[0])

    # Offset gate: start two pixels off the true peak → |offset| > 0.5
    _, _, _, ok_off = (np.asarray(a) for a in surf._localize_octave(
        jnp.asarray(resp), jnp.array([1]), jnp.array([15]), jnp.array([20]),
        jnp.array([True]), 0))
    assert not bool(ok_off[0])


def test_haar_responses_match_numpy_reference():
    img = _texture(seed=3)
    S_j = surf.integral_image(jnp.asarray(img))
    S = _np_sat(img)
    for (x, y, fs) in [(30, 40, 2), (50, 20, 4), (48, 48, 6)]:
        dx_j, dy_j = surf._haar_dx_dy(S_j, jnp.asarray(x), jnp.asarray(y),
                                      jnp.asarray(fs))
        dx_n, dy_n = _np_haar(S, x, y, fs)
        np.testing.assert_allclose(float(dx_j), dx_n, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(dy_j), dy_n, rtol=1e-5, atol=1e-7)


def test_descriptor_matches_numpy_reference():
    """Full 64-d descriptor vs a literal double-loop transcription of
    descriptor_computation (surf.cc:663-733)."""
    img = _texture(seed=4, H=128, W=128)
    S_j = surf.integral_image(jnp.asarray(img))
    S = _np_sat(img)
    kx, ky, scale, ori = 64.0, 62.0, 2.0, 0.7

    d_j, ok = surf._descriptor(S_j, jnp.asarray(kx), jnp.asarray(ky),
                               jnp.asarray(scale), jnp.asarray(ori),
                               jnp.asarray(True))
    assert bool(ok)

    s = int(scale)
    sin_o, cos_o = np.sin(ori), np.cos(ori)
    data = np.zeros((4, 4, 4), np.float64)
    for y in range(-10, 10):
        for x in range(-10, 10):
            rot_x = int(np.floor(kx + (cos_o * (x + 0.5) - sin_o * (y + 0.5)) * s + 0.5))
            rot_y = int(np.floor(ky + (sin_o * (x + 0.5) + cos_o * (y + 0.5)) * s + 0.5))
            dx, dy = _np_haar(S, rot_x, rot_y, s)
            odx = cos_o * dx + sin_o * dy
            ody = -sin_o * dx + cos_o * dy
            wgt = np.exp(-(x * x + y * y) / (2.0 * 3.3) ** 2)
            by, bx = (y + 10) // 5, (x + 10) // 5
            data[by, bx] += wgt * np.array([odx, ody, abs(odx), abs(ody)])
    ref = data.reshape(64)
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(np.asarray(d_j), ref, rtol=1e-4, atol=1e-5)


def test_orientation_recovers_gradient_direction():
    """A linear ramp has a single dominant gradient direction; the
    sliding-window orientation (surf.cc:519-617) must recover it."""
    H = W = 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for angle in (0.0, np.pi / 2, np.pi / 4, -2.1):
        ramp = (np.cos(angle) * xx + np.sin(angle) * yy)
        ramp = (ramp - ramp.min()) / (ramp.max() - ramp.min())
        S_j = surf.integral_image(jnp.asarray(ramp.astype(np.float32)))
        ori, ok = surf._orientation(S_j, jnp.asarray(48.0), jnp.asarray(48.0),
                                    jnp.asarray(2.0), jnp.asarray(True))
        assert bool(ok)
        diff = np.angle(np.exp(1j * (float(ori) - angle)))
        assert abs(diff) < np.pi / 8, (angle, float(ori))


def test_surf_adds_matches_over_sift_only():
    """SIFT+SURF must find at least as many features and strictly more total
    descriptors than SIFT alone on a textured image (FEATURE_ALL default,
    matching_mve.cpp:333)."""
    from orthosfm_tpu.config import ReconstructionConfig
    from orthosfm_tpu.data.views import View
    from orthosfm_tpu.pipeline import matching as pm
    import dataclasses

    img = (_texture(seed=5, H=160, W=160) * 255).astype(np.uint8)
    view = View(view_id=0, image_path="mem.png", width=160, height=160,
                pixels=np.stack([img] * 3, -1))
    cfg_both = ReconstructionConfig()
    cfg_sift = dataclasses.replace(
        cfg_both, matching=dataclasses.replace(cfg_both.matching,
                                               use_surf=False))
    f_both = pm.extract_view_features(view, cfg_both)
    f_sift = pm.extract_view_features(view, cfg_sift)
    assert f_both.n_sift == f_sift.count
    n_surf = f_both.count - f_both.n_sift
    assert n_surf > 0
    assert f_both.count > f_sift.count
