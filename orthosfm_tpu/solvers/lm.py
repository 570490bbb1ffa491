"""Generic small dense Levenberg–Marquardt solver.

Replaces Ceres DENSE_QR for tiny problems — in particular the Tomasi-Kanade
metric upgrade (15 residuals × 9 params; reference: src/algorithms/
tomasi_kanade.cpp:62-75). Fixed iteration count, fully jit/vmap-compatible so
hundreds of RANSAC hypotheses solve as one batched program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve(residual_fn, x0, *, iters: int = 40, init_lambda: float = 1e-3,
          lambda_up: float = 10.0, lambda_down: float = 0.1):
    """Minimize ½‖residual_fn(x)‖² from x0 (n,) with damped Gauss-Newton.

    Returns (x, final_cost). Uses jacfwd (residual dims are tiny) and a
    classic multiplicative damping schedule with accept/reject steps.
    """

    def cost(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def body(state, _):
        x, lam, c = state
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)  # (m, n)
        H = J.T @ J
        g = J.T @ r
        n = x.shape[0]
        # Marquardt scaling: damp by diagonal (with floor), keeps the step
        # well-scaled when parameters have different magnitudes.
        d = jnp.maximum(jnp.diag(H), 1e-8)
        step = jnp.linalg.solve(H + lam * jnp.diag(d), -g)
        x_new = x + step
        c_new = cost(x_new)
        accept = c_new < c
        x = jnp.where(accept, x_new, x)
        c = jnp.where(accept, c_new, c)
        lam = jnp.where(accept, jnp.maximum(lam * lambda_down, 1e-12),
                        jnp.minimum(lam * lambda_up, 1e10))
        return (x, lam, c), None

    x0 = jnp.asarray(x0)
    (x, _, c), _ = jax.lax.scan(body, (x0, jnp.asarray(init_lambda, x0.dtype), cost(x0)),
                                None, length=iters)
    return x, c
