"""Shared numerics helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 inputs; the geometry/solver paths need true f32.
# Use this on every precision-critical einsum / matmul / solve input.
HIGHEST = jax.lax.Precision.HIGHEST


def psd_solve(A: jnp.ndarray, b: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve A x = b for symmetric positive (semi)definite A via Cholesky.

    All normal-equation solves in the framework (LM steps, ridge spline fits,
    shape-from-normals) go through here so the factorization strategy lives in
    one place.
    """
    n = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), b)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1e-9)


def masked_median(x: jnp.ndarray, mask: jnp.ndarray):
    """Median of x over mask==True (static shapes: masked-out entries are
    pushed to +inf and the median index is computed from the true count)."""
    big = jnp.where(mask, x, jnp.inf)
    sorted_x = jnp.sort(big)
    cnt = jnp.sum(mask.astype(jnp.int32))
    # odd cnt: both indices coincide; even: average the two middles
    idx = jnp.maximum(cnt - 1, 0) // 2
    idx2 = jnp.minimum(cnt // 2, x.shape[0] - 1)
    med = 0.5 * (sorted_x[idx] + sorted_x[idx2])
    return jnp.where(cnt > 0, med, 0.0)
