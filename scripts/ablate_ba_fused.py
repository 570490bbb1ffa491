"""Per-phase ablation of the fused LM megakernel (ba_fused.run_lm).

Times the full kernel and stripped variants (phases removed via the
`ablate` static switch) on the standard 16cam/8192trk bench problem, then
reports per-iteration cost by difference. Results feed docs/SCALING.md's
"round-4 ablation" section. Run on a real TPU:

    python scripts/ablate_ba_fused.py [--iters 50] [--repeats 3]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from bench import make_problem
    from orthosfm_tpu.config import BundleAdjustConfig
    from orthosfm_tpu.core import cameras as cam_mod
    from orthosfm_tpu.solvers import ba, ba_fused

    cams, points, obs, mask = make_problem()
    cfg = BundleAdjustConfig()

    # Build run_lm operands the way ba._run_jit / ba._run_fused do
    free_c = cam_mod.free_mask(cams)
    p_hat = points / jnp.maximum(
        jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-20)
    obsT = jnp.transpose(obs, (1, 2, 0)).astype(jnp.float32)
    maskT = mask.T.astype(jnp.float32)
    pT = p_hat.T.astype(jnp.float32)
    rot = cams.rot.astype(jnp.float32)
    _, _, camp = ba._camera_tensors(cams)
    free = free_c.astype(jnp.float32)
    cfg_row = jnp.asarray([[cfg.initial_lambda, 0.0, 0.0, cfg.lambda_up,
                            cfg.lambda_down, cfg.min_lambda, cfg.max_lambda,
                            0.0]], jnp.float32)

    variants = [
        ("full", frozenset({"timing"})),
        ("no_gj", frozenset({"gj"})),
        ("no_pass2_blocks", frozenset({"pass2_blocks"})),
        ("no_pass2", frozenset({"pass2"})),
        ("no_pass1", frozenset({"pass1"})),
        ("shell", frozenset({"pass1", "gj", "pass2"})),
    ]

    times = {}
    for name, ab in variants:
        active = cam_mod.active_param_slots(cams)

        def run():
            out = ba_fused.run_lm(cams.kind, pT, obsT, maskT, rot, camp,
                                  free, cfg_row, cfg.huber_delta, True,
                                  max_iters=args.iters, ablate=ab,
                                  active=active)
            jax.block_until_ready(out[0])
            return out

        run()  # compile + warmup
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        per_iter_us = best / args.iters * 1e6
        times[name] = per_iter_us
        print(f"{name:18s} {per_iter_us:9.1f} us/iter  "
              f"({args.iters / best:8.1f} it/s)", file=sys.stderr)

    full = times["full"]
    report = {
        "per_iter_us": {k: round(v, 1) for k, v in times.items()},
        "phase_cost_us": {
            "gauss_jordan": round(full - times["no_gj"], 1),
            "pass2_blocks": round(full - times["no_pass2_blocks"], 1),
            "pass2_total": round(full - times["no_pass2"], 1),
            "pass1_normal_eq": round(full - times["no_pass1"], 1),
            "shell_overhead": round(times["shell"], 1),
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
