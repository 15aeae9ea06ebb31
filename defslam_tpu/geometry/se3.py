"""SE(3) / SO(3) / Sim(3) Lie-group operations, pure jnp.

Replaces the reference's g2o ``SE3Quat``/``Sim3`` types and
``Converter.cc`` conversions with tangent-space parameterizations that are
autodiff-friendly: solvers optimize a 6-vector (or 7-vector for Sim3)
increment applied on the left, ``T <- exp(delta) * T``.

Poses are stored as 4x4 homogeneous float32 matrices (the "array of structs"
is fine here: they're tiny and XLA fuses the 3x3 matmuls).  All functions
broadcast over leading batch dimensions via vmap at call sites.

Small-angle branches use jnp.where on Taylor expansions (branchless, safe
under jit and reverse-mode AD).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat map: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), with
    Taylor fallbacks near zero.  theta2 = t^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm SO(3) -> so(3): (..., 3, 3) -> (..., 3).

    Valid away from theta = pi (SLAM increments are always small).

    Autodiff-safe at theta = 0: theta comes from atan2(||v||, trace-1) with
    the sqrt input guarded away from zero in the small branch (the safe-where
    pattern), so forward/reverse derivatives of near-identity rotations are
    finite — the naive arccos((trace-1)/2) form produces NaN Jacobians there
    even under jnp.where (essential-graph edges between consecutive keyframes
    are near-identity in the common case).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # vee of the antisymmetric part: v = 2 sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    v2 = jnp.sum(v * v, axis=-1)  # = 4 sin^2(theta)
    small = v2 < 1e-12
    v2_safe = jnp.where(small, 1.0, v2)  # guard the sqrt for autodiff
    vnorm = jnp.sqrt(v2_safe)
    theta = jnp.arctan2(vnorm, trace - 1.0)  # atan2(2 sin t, 2 cos t)
    # w = theta * axis = (theta / ||v||) * v; small-angle: theta ~ ||v||/2
    scale = jnp.where(small, 0.5 + v2 / 48.0, theta / vnorm)
    return scale[..., None] * v


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).

    xi = (..., 6) ordered [rho(3), phi(3)] (translation part first, like
    g2o's SE3Quat::exp ordering reversed — we document ours: rho then phi).
    Returns (..., 4, 4).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)
    a, b, c = _sinc_coeffs(theta2)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return _rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Logarithm SE(3) -> se(3), inverse of :func:`se3_exp`."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_coeffs(theta2)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/t^2)(1 - a/(2b)) W^2
    small = theta2 < 1e-8
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * jnp.maximum(b, _EPS))) / jnp.maximum(theta2, _EPS),
    )
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def _rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def orthonormalize(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (Newton polar iteration,
    quadratic convergence for near-orthonormal R — 3 steps reach float32
    noise from ~25% drift).  SE3 poses composed repeatedly (motion-model
    prediction, long tracking runs) accumulate off-manifold error that the
    transpose-inverse then AMPLIFIES geometrically; this is the per-frame
    renormalization that keeps the loop stable."""
    R = T[..., :3, :3]
    for _ in range(3):
        R = 0.5 * (R + jnp.linalg.inv(jnp.swapaxes(R, -1, -2)))
    return _rt_to_mat(R, T[..., :3, 3])


def transform(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    if p.ndim >= 2 and p.shape[-2] != 3:
        return jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, p) + t


def retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative update T <- exp(xi) * T (the solver's step)."""
    return se3_exp(xi) @ T


# ---------------------------------------------------------------- Sim(3) ----


def sim3_apply(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, p: jnp.ndarray):
    """p' = s * R @ p + t for points (..., N, 3)."""
    return s[..., None, None] * jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]


def sim3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """sim(3) tangent (..., 7) = [rho(3), phi(3), sigma] -> (s, R, t).

    Uses the simple retraction s = exp(sigma), R = exp(phi), t = rho (a valid
    chart near identity; the solver only needs local updates, matching the
    reference's use of g2o Sim3 purely for small Horn refinements,
    DefOptimizer.cc:840-922).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    return jnp.exp(sigma), so3_exp(phi), rho


def horn_alignment(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray):
    """Closed-form weighted Sim(3) alignment (Horn/Umeyama): find (s, R, t)
    minimizing sum_i w_i || s R src_i + t - dst_i ||^2.

    The reference solves this iteratively with g2o (OptimizeHorn,
    DefOptimizer.cc:840-922); the closed form is exact for the quadratic
    objective, batched and differentiable.  src, dst: (N, 3); w: (N,) mask
    or weights.  Returns (s, R, t).
    """
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    wn = w / wsum
    mu_s = jnp.sum(wn[:, None] * src, axis=0)
    mu_d = jnp.sum(wn[:, None] * dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    # covariance (3x3) and source variance
    cov = jnp.einsum("n,ni,nj->ij", wn, xd, xs)
    var_s = jnp.sum(wn * jnp.sum(xs * xs, axis=-1))
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=src.dtype)).at[2, 2].set(
        jnp.sign(det)
    )
    R = U @ S @ Vt
    s = jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_s, _EPS)
    t = mu_d - s * R @ mu_s
    return s, R, t
