"""Oriented-BRIEF (ORB) descriptors, pure jnp gathers + bit packing.

Replaces the reference's ``ORBextractor`` orientation + descriptor stages
(``ORBextractor.cc:472+`` intensity-centroid orientation,
``computeDescriptors`` 1038-1118, 256-pair rBRIEF).  TPU re-design:

- No per-keypoint loops: all K keypoints' moments and all 512 pattern
  samples are gathered in one batched indexing op per pyramid level.
- The sampling pattern is *generated*, not copied: 256 coordinate pairs
  drawn from the classic BRIEF recipe (isotropic Gaussian, sigma = patch/5,
  clipped to the patch) with a fixed seed, giving the same statistical
  behavior (bit variance / correlation, Hamming-threshold semantics
  TH_LOW=50 / TH_HIGH=75 of ORBmatcher.h) as the OpenCV learned pattern.
  Descriptors are therefore NOT interoperable with OpenCV's bit-for-bit —
  this framework matches its own descriptors end to end, which is all the
  pipeline needs.
- Descriptors are packed into (K, 8) uint32 words so Hamming distance is
  XOR + popcount on the VPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius, reference ORBextractor.cc
PATTERN_CLIP = 13  # BRIEF sample coordinate range (rotations stay in patch)


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) int32: 256 point pairs (x, y) in [-13, 13]."""
    rng = np.random.default_rng(20240817)
    pts = rng.normal(0.0, (2 * PATTERN_CLIP + 1) / 5.0, size=(256, 2, 2))
    return np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)


@functools.lru_cache(maxsize=1)
def _circle_offsets():
    """Offsets and coords of the radius-15 orientation disc."""
    r = HALF_PATCH
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (dx * dx + dy * dy) <= r * r
    return (
        dy.astype(np.int32),
        dx.astype(np.int32),
        mask.astype(np.float32),
    )


def orientations(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle (radians) per keypoint.

    img: (H, W) f32 level image.  xy: (K, 2) f32 level-coords.
    theta = atan2(m01, m10) over the radius-15 disc (IC-angle of ORB).
    """
    h, w = img.shape
    dy, dx, mask = _circle_offsets()
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    yy = jnp.clip(cy[:, None, None] + dy[None], 0, h - 1)
    xx = jnp.clip(cx[:, None, None] + dx[None], 0, w - 1)
    patch = img[yy, xx] * mask[None]  # (K, 31, 31)
    m10 = jnp.sum(patch * dx[None], axis=(1, 2))
    m01 = jnp.sum(patch * dy[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def describe(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Steered-BRIEF descriptors.

    img_blur: (H, W) f32 — blurred level image (sigma=2, like the reference).
    xy: (K, 2) level coords; angle: (K,) radians.
    Returns (K, 8) uint32 (256 bits).
    """
    h, w = img_blur.shape
    pat = jnp.asarray(brief_pattern(), jnp.float32)  # (256, 2, 2) as (x, y)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    px, py = pat[..., 0], pat[..., 1]  # (256, 2)
    # rotate pattern by keypoint angle: (K, 256, 2)
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    gx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    vals = img_blur[gy, gx]  # (K, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
    k = xy.shape[0]
    words = bits.reshape(k, 8, 32) << jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words, axis=-1, dtype=jnp.uint32)  # (K, 8)
