"""Pinhole camera model, pure jnp.

Replaces the reference's scattered cv::projectPoints / manual fx*x/z+cx code
(Frame.cc isInFrustum, DefOptimizer.cc edge projections, sft_types.h:120-135)
with one batched module.  Projection is pure pinhole; lens distortion is
applied to KEYPOINT coordinates only, exactly like the reference
(Frame::UndistortKeyPoints on raw-lens mono sequences; the stereo app
instead rectifies images host-side, Apps/stereo_groundtruth.cc:56-94) —
see :func:`undistort_points`, wired into the feature frontend.
"""

from __future__ import annotations

import jax.numpy as jnp


def project(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2)."""
    z = pts_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = K[0, 0] * pts_cam[..., 0] / zsafe + K[0, 2]
    v = K[1, 1] * pts_cam[..., 1] / zsafe + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def backproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def to_retina(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Normalized retina coordinates K^{-1} [u v 1] (z=1 plane).

    Reference: DefKeyFrame::NormaliseKeypoints (DefKeyFrame.cc:94-133).
    """
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def from_retina(K: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def distort_points(K: jnp.ndarray, dist, uv: jnp.ndarray) -> jnp.ndarray:
    """Forward OpenCV radial-tangential model: ideal pixels -> observed
    pixels.  dist = (k1, k2, p1, p2, k3)."""
    k1, k2, p1, p2, k3 = dist
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack(
        [K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], axis=-1
    )


def undistort_points(
    K: jnp.ndarray, dist, uv: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Invert the radial-tangential distortion on keypoint coordinates —
    the reference's Frame::UndistortKeyPoints (cv::undistortPoints with
    Camera.k1..k3/p1/p2, Frame.cc).  Same fixed-point iteration OpenCV
    uses, branchless and batched; exact identity when all coefficients are
    zero.  dist = (k1, k2, p1, p2, k3)."""
    k1, k2, p1, p2, k3 = dist
    xd = (uv[..., 0] - K[0, 2]) / K[0, 0]
    yd = (uv[..., 1] - K[1, 2]) / K[1, 1]
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack(
        [K[0, 0] * x + K[0, 2], K[1, 1] * y + K[1, 2]], axis=-1
    )


def in_image(uv: jnp.ndarray, width: int, height: int, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )


def retina_domain(K: jnp.ndarray, width: int, height: int, margin: float = 0.10):
    """Retina-plane bounding box of the image with a relative margin.

    Reference: DefKeyFrame.cc:94-133 builds [umin,umax]x[vmin,vmax] with a
    0.10 margin; this is the domain of every per-keyframe B-spline.
    Returns (umin, umax, vmin, vmax) as a 4-vector.
    """
    corners = jnp.array(
        [[0.0, 0.0], [width - 1.0, 0.0], [0.0, height - 1.0], [width - 1.0, height - 1.0]],
        dtype=jnp.float32,
    )
    xy = to_retina(K, corners)
    umin, vmin = xy[:, 0].min(), xy[:, 1].min()
    umax, vmax = xy[:, 0].max(), xy[:, 1].max()
    du, dv = umax - umin, vmax - vmin
    return jnp.stack(
        [umin - margin * du, umax + margin * du, vmin - margin * dv, vmax + margin * dv]
    )
