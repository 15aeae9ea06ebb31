"""Batched robust Levenberg-Marquardt / Gauss-Newton, pure jnp.

One nonlinear-least-squares engine serves every solver role in the framework
(the reference uses two separate C++ libraries for these):

- SfT camera+mesh optimization  <- g2o SparseOptimizer w/ LM
  (``Modules/Tracking/DefOptimizer.cc:251-578``, 50 iterations)
- Schwarp warp refinement       <- Ceres sparse normal Cholesky
  (``Modules/Mapping/SchwarpDatabase.cc:199-222``, 3 iterations)
- per-point normal polynomials  <- Ceres dense, one solve per map point in a
  serial loop (``Modules/Mapping/NormalEstimator.cc:115-159``).  Here the
  same routine is simply vmapped: thousands of independent 2-parameter
  problems become one batched device computation.
- Sim3 Horn refinement          <- g2o (``DefOptimizer.cc:840-922``)

Design: problems here are small-and-dense (tens..hundreds of unknowns) or
tiny-and-massively-batched, so we always form the dense Jacobian with forward-
mode autodiff and solve damped normal equations with Cholesky — an MXU-shaped
workload.  Control flow is a `lax.fori_loop` with branchless accept/reject
(jnp.where), so one compilation serves every frame.

Robustness: IRLS with a Huber weight per residual *block* (a block = one
2D reprojection error), matching g2o's RobustKernelHuber semantics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


class LMResult(NamedTuple):
    x: jnp.ndarray  # final parameters (N,)
    cost: jnp.ndarray  # final robust cost (scalar)
    cost0: jnp.ndarray  # initial cost
    lam: jnp.ndarray  # final damping
    JtJ: jnp.ndarray  # final (undamped) normal matrix at x — covariance
    #                   of the estimate is inv(JtJ) (NormalEstimator.cc:159)


def huber_block_weights(
    r: jnp.ndarray, block: int, delta: float, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """IRLS weights: residuals grouped in consecutive blocks of size ``block``;
    each block gets weight min(1, delta / ||r_block||)  (Huber).
    mask: optional (R/block,) validity; invalid blocks get weight 0."""
    rb = r.reshape(-1, block)
    norm = jnp.sqrt(jnp.sum(rb * rb, axis=-1) + 1e-12)
    w = jnp.minimum(1.0, delta / norm)
    if mask is not None:
        w = w * mask.astype(w.dtype)
    return jnp.repeat(w, block)


def lm_solve(
    residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    num_iters: int,
    weight_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    lam0: float = 1e-4,
    lam_up: float = 4.0,
    lam_down: float = 0.5,
    lam_min: float = 1e-10,
    lam_max: float = 1e8,
    retract: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    use_jacrev: bool = False,
    rtol: float = 1e-6,
    unroll: int = 0,
) -> LMResult:
    """Dense damped LM, up to `num_iters` iterations with early termination
    when an accepted step improves the cost by less than `rtol` relative
    (jit/vmap-safe; lax.while_loop).  The reference burns a fixed 50
    iterations per frame (DefOptimizer.cc:509-513) — converged solves here
    exit in a fraction of that.

    residual_fn: x (N,) -> r (R,).  weight_fn: r -> per-residual IRLS weight
    (R,) (fold masks in here).  retract: manifold update (default x + dx).
    """
    if retract is None:
        retract = lambda x, dx: x + dx  # noqa: E731
    jac = jax.jacrev(residual_fn) if use_jacrev else jax.jacfwd(residual_fn)

    def cost_of(r, w):
        return 0.5 * jnp.sum(w * r * r)

    def weights(r):
        return (
            jnp.ones_like(r) if weight_fn is None else weight_fn(jax.lax.stop_gradient(r))
        )

    r0 = residual_fn(x0)
    w0 = weights(r0)
    c0 = cost_of(r0, w0)

    def cond(carry):
        x, r, w, lam, cost, i, done = carry
        return (i < num_iters) & ~done

    def body(carry):
        # residuals/weights at x are CARRIED from the previous accept test
        # (one residual evaluation per iteration instead of two)
        x, r, w, lam, cost, i, _ = carry
        J = jac(x)  # (R, N)
        H = jnp.einsum("ri,r,rj->ij", J, w, J, precision=_HP)
        g = jnp.einsum("ri,r->i", J, w * r, precision=_HP)
        # Marquardt scaling: damp by lam * diag(H) (+ tiny absolute floor)
        D = jnp.diag(jnp.diag(H) + 1e-9)
        A = H + lam * D
        L = jnp.linalg.cholesky(A)
        dx = -jax.scipy.linalg.cho_solve((L, True), g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x_new = retract(x, dx)
        r_new = residual_fn(x_new)
        w_new = weights(r_new)
        c_new = cost_of(r_new, w_new)
        accept = (c_new < cost) & jnp.isfinite(c_new)
        converged = accept & (cost - c_new <= rtol * (cost + 1e-30))
        x = jnp.where(accept, x_new, x)
        r = jnp.where(accept, r_new, r)
        w = jnp.where(accept, w_new, w)
        cost = jnp.where(accept, c_new, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * lam_down, lam * lam_up), lam_min, lam_max
        )
        return (x, r, w, lam, cost, i + 1, converged | (lam >= lam_max))

    # zero-cost problems (fully masked / padding lanes) are done before
    # they start: under vmap the while_loop runs until EVERY lane's cond
    # is false, so idle lanes must not keep the batch spinning
    init = (x0, r0, w0, jnp.asarray(lam0, x0.dtype), c0, jnp.asarray(0),
            c0 <= 0.0)
    if unroll > 0:
        # fixed-trip scan with partial unrolling: identical math to the
        # while_loop (converged lanes freeze via the done flag), but under
        # a large vmap SOME lane virtually always runs the full budget so
        # the data-dependent early exit buys nothing — the scan drops the
        # per-iteration cond round trip and lets XLA fuse across unrolled
        # bodies (the keyframe-chain normal solver's latency lever).
        def scan_body(carry, _):
            done_prev = carry[6]
            new = body(carry)
            merged = tuple(
                jnp.where(done_prev, o, n) for o, n in zip(carry, new)
            )
            return merged, None

        (x, _, _, lam, cost, _, _), _ = jax.lax.scan(
            scan_body, init, None, length=num_iters,
            unroll=min(unroll, num_iters),
        )
    else:
        x, _, _, lam, cost, _, _ = jax.lax.while_loop(cond, body, init)
    # final normal matrix for covariance consumers
    rF = residual_fn(x)
    wF = weights(rF)
    JF = jac(x)
    JtJ = jnp.einsum("ri,r,rj->ij", JF, wF, JF, precision=_HP)
    return LMResult(x=x, cost=cost, cost0=c0, lam=lam, JtJ=JtJ)
