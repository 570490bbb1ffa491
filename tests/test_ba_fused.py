"""Fused single-kernel LM solver coverage (solvers/ba_fused.py): interpret-
mode equivalence with the XLA LM path on CPU, plus a compiled on-device gate
whenever a real TPU is attached (same pattern as test_ba_pallas.py).

Reference solve being replaced: Ceres SPARSE_SCHUR robust LM
(src/bundle_adjustment/bundle_adjustment.cpp:49-161)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from orthosfm_tpu.config import BundleAdjustConfig
from orthosfm_tpu.core import cameras as cam_mod
from orthosfm_tpu.solvers import ba, ba_fused
from tests.test_ba_pallas import _problem


def _fused_inputs(cams, points4, obs, mask):
    """Padded T-minor tensors at ba_fused.TILE granularity."""
    T = obs.shape[0]
    T_pad = -(-T // ba_fused.TILE) * ba_fused.TILE
    p_hat = points4 / jnp.maximum(
        jnp.linalg.norm(points4, axis=-1, keepdims=True), 1e-20)
    track_valid = jnp.any(mask, axis=1)
    mask = mask & track_valid[:, None]
    safe = jnp.array([0.0, 0.0, 0.0, 1.0], obs.dtype)
    p_hat = jnp.where(track_valid[:, None], p_hat, safe)
    obsT = jnp.pad(jnp.transpose(obs, (1, 2, 0)),
                   ((0, 0), (0, 0), (0, T_pad - T)))
    maskT = jnp.pad(mask.T, ((0, 0), (0, T_pad - T)))
    pT = jnp.concatenate(
        [p_hat.T, jnp.broadcast_to(safe[:, None], (4, T_pad - T))], axis=1)
    return pT, obsT, maskT


def _run_both(kind, optimize_points, max_iterations, n_points=1024):
    cams, points, obs, mask = _problem(kind, num_views=8, n_points=n_points)
    cfg = BundleAdjustConfig(max_iterations=max_iterations,
                             function_tolerance=0.0, min_lambda=1e-12,
                             use_pallas=False)
    rx = ba.run(cams, points, obs, mask, optimize_points=optimize_points,
                config=cfg)
    pT, obsT, maskT = _fused_inputs(cams, points, obs, mask)
    rf = ba._run_fused(cams, pT, obsT, maskT, cam_mod.free_mask(cams),
                       optimize_points, cfg, n_tracks=obs.shape[0],
                       interpret=True)
    return rx, rf


@pytest.mark.parametrize("kind", ["quat", "euler"])
@pytest.mark.parametrize("optimize_points", [True, False])
def test_single_step_matches_xla(kind, optimize_points):
    """One LM iteration: initial cost, post-step cost, and the retracted
    camera state must match the XLA path — this pins the in-kernel Jacobians,
    Schur assembly, Gauss-Jordan solve, and both retractions."""
    rx, rf = _run_both(kind, optimize_points, max_iterations=1)
    np.testing.assert_allclose(float(rf.initial_cost), float(rx.initial_cost),
                               rtol=1e-5)
    # the post-step states agree to ~1e-5 relative; the cost sits in a sharp
    # valley (25539 → 17.9 in one step) so its tolerance is looser
    np.testing.assert_allclose(float(rf.cost), float(rx.cost), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rf.cams.rot),
                               np.asarray(rx.cams.rot), rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(rf.cams.offset),
                               np.asarray(rx.cams.offset), atol=1e-5)
    if optimize_points:
        np.testing.assert_allclose(np.asarray(rf.points),
                                   np.asarray(rx.points), rtol=1e-3,
                                   atol=1e-5)


@pytest.mark.parametrize("kind", ["quat", "euler"])
def test_full_lm_converges_like_xla(kind):
    """A full 15-iteration LM run must reach the same convergence quality as
    the XLA path (costs drift slightly once f32 rounding picks different
    accept/reject sequences, so compare reduction ratios)."""
    rx, rf = _run_both(kind, True, max_iterations=15)
    assert float(rf.cost) < float(rf.initial_cost) * 1e-2, kind
    assert float(rf.cost) < float(rx.cost) * 1.5 + 1e-6
    assert int(rf.iterations) >= 1


def test_fits_gate():
    assert ba_fused.fits(16, 8192)
    assert ba_fused.fits(3, 1024)
    assert not ba_fused.fits(16, 8192 + 1)  # not TILE-aligned
    assert not ba_fused.fits(16, ba_fused.TILE * ba_fused.MAX_TILES * 2)
    assert not ba_fused.fits(64, 16384)  # VMEM blow-up


def test_fixed_cameras_stay_fixed():
    """free-mask pinning inside the kernel: a fully-fixed camera must come
    back bit-identical."""
    cams, points, obs, mask = _problem("quat", num_views=8, n_points=1024)
    fixed = jnp.zeros(8, bool).at[0].set(True).at[3].set(True)
    cams = cams.replace(fixed=fixed)
    cfg = BundleAdjustConfig(max_iterations=3, function_tolerance=0.0,
                             use_pallas=False)
    pT, obsT, maskT = _fused_inputs(cams, points, obs, mask)
    rf = ba._run_fused(cams, pT, obsT, maskT, cam_mod.free_mask(cams),
                       True, cfg, n_tracks=obs.shape[0], interpret=True)
    np.testing.assert_array_equal(np.asarray(rf.cams.rot[0]),
                                  np.asarray(cams.rot[0]))
    np.testing.assert_array_equal(np.asarray(rf.cams.rot[3]),
                                  np.asarray(cams.rot[3]))
    np.testing.assert_array_equal(np.asarray(rf.cams.offset[3]),
                                  np.asarray(cams.offset[3]))


# ---------------------------------------------------------------------------
# Compiled on-device gate (subprocess with the CPU pin stripped; skips when
# no TPU is attached) — the Mosaic-lowering regression gate for ba_fused.

_TPU_CHECK = r"""
import sys
import numpy as np
import jax

try:
    devs = jax.devices()
except RuntimeError:
    sys.exit(42)
if not any(d.platform in ("tpu", "axon") for d in devs):
    sys.exit(42)

from tests.test_ba_pallas import _problem
from orthosfm_tpu.config import BundleAdjustConfig
from orthosfm_tpu.solvers import ba, ba_fused

cfg = BundleAdjustConfig(max_iterations=15, function_tolerance=0.0,
                         min_lambda=1e-12, use_pallas=True)
for kind in ("quat", "euler"):
    cams, points, obs, mask = _problem(kind, num_views=8, n_points=1024)
    assert ba_fused.fits(8, 1024)
    r = ba.run(cams, points, obs, mask, optimize_points=True, config=cfg)
    assert float(r.cost) < float(r.initial_cost) * 1e-2, kind
    assert int(r.iterations) >= 1
print("FUSED_TPU_OK")
"""


@pytest.mark.slow
def test_fused_kernel_on_tpu():
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", _TPU_CHECK], env=env,
                          cwd=root, capture_output=True, text=True,
                          timeout=900)
    if proc.returncode == 42:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "FUSED_TPU_OK" in proc.stdout
