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


PATCH_R = 19  # covers the orientation disc (15) and the rotated BRIEF
PATCH = 2 * PATCH_R + 1  # reach (ceil(13*sqrt(2)) = 19)


def orient_describe_stack(
    raw: jnp.ndarray,  # (L, H, W) f32 padded pyramid canvas
    blur: jnp.ndarray,  # (L, H, W) f32 blurred canvas
    lv: jnp.ndarray,  # (N,) int32 pyramid level per keypoint
    xy: jnp.ndarray,  # (N, 2) f32 integer-valued level coords
    level_hw: jnp.ndarray,  # (L, 2) int32 true (h, w) of each level
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched orientation + descriptors for keypoints of ALL pyramid
    levels in one pass — the hot-path replacement for per-level
    :func:`orientations` + :func:`describe` (same clip-to-level-edge
    sampling semantics).

    TPU re-design: per-keypoint 39x39 patches are extracted with one
    contiguous ROW gather from the level canvas followed by a column
    one-hot matmul (MXU), and the rotated BRIEF samples are read from the
    patch with two more one-hot matmuls — no scalar gathers anywhere.
    Scalar-gather ops dominated the round-1 frontend (orientations 11.3 ms
    + describe 7.5 ms of a 23 ms extraction at 1200 kps / 6 levels); this
    path is bounded by ~0.3 GB of regular HBM traffic instead.

    Returns (angle (N,), desc (N, 8) uint32).
    """
    L, H, W = raw.shape
    n = xy.shape[0]
    cx = jnp.round(xy[:, 0]).astype(jnp.int32)
    cy = jnp.round(xy[:, 1]).astype(jnp.int32)
    h_l = level_hw[lv, 0]
    w_l = level_hw[lv, 1]
    dr = jnp.arange(-PATCH_R, PATCH_R + 1)

    # --- patch extraction: row gather (contiguous W-slices) + column onehot
    rows_idx = jnp.clip(cy[:, None] + dr[None], 0, (h_l - 1)[:, None])
    stack2 = jnp.stack([raw, blur], axis=2)  # (L, H, 2, W)
    rows = stack2[lv[:, None], rows_idx]  # (N, P, 2, W)
    cols = jnp.clip(cx[:, None] + dr[None], 0, (w_l - 1)[:, None])  # (N, P)
    oh_col = (
        cols[:, None, :] == jnp.arange(W)[None, :, None]
    ).astype(jnp.float32)  # (N, W, P)
    patch = jnp.einsum("npcw,nwj->ncpj", rows, oh_col)  # (N, 2, P, P)

    # --- intensity-centroid orientation from the raw patch (disc radius 15)
    dy31, dx31, mask31 = _circle_offsets()
    s = PATCH_R - HALF_PATCH
    raw31 = patch[:, 0, s : s + 31, s : s + 31]
    m10 = jnp.einsum("nij,ij->n", raw31, jnp.asarray(dx31 * mask31, jnp.float32))
    m01 = jnp.einsum("nij,ij->n", raw31, jnp.asarray(dy31 * mask31, jnp.float32))
    angle = jnp.arctan2(m01, m10)

    # --- steered BRIEF from the blurred patch via two one-hot matmuls.
    # In-patch index = round(xy + r) - (c - R): identical rounding/clipping
    # to describe()'s clip(round(xy + r), 0, wh-1) because patch row/col j
    # maps to image coord clip(c - R + j, 0, wh-1).
    pat = jnp.asarray(brief_pattern(), jnp.float32)  # (256, 2, 2) as (x, y)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    px = pat[..., 0].reshape(-1)  # (512,)
    py = pat[..., 1].reshape(-1)
    rx = ca[:, None] * px[None] - sa[:, None] * py[None]  # (N, 512)
    ry = sa[:, None] * px[None] + ca[:, None] * py[None]
    jx = jnp.clip(
        jnp.round(xy[:, 0, None] + rx).astype(jnp.int32) - (cx - PATCH_R)[:, None],
        0, PATCH - 1,
    )
    jy = jnp.clip(
        jnp.round(xy[:, 1, None] + ry).astype(jnp.int32) - (cy - PATCH_R)[:, None],
        0, PATCH - 1,
    )
    ar = jnp.arange(PATCH)
    oh_y = (jy[:, :, None] == ar[None, None, :]).astype(jnp.float32)  # (N,512,P)
    oh_x = (jx[:, :, None] == ar[None, None, :]).astype(jnp.float32)
    t = jnp.einsum("nsp,npj->nsj", oh_y, patch[:, 1])  # (N, 512, P)
    vals = jnp.einsum("nsj,nsj->ns", t, oh_x)  # (N, 512)
    vp = vals.reshape(n, 256, 2)
    bits = (vp[..., 0] < vp[..., 1]).astype(jnp.uint32)
    words = bits.reshape(n, 8, 32) << jnp.arange(32, dtype=jnp.uint32)[None, None]
    return angle, jnp.sum(words, axis=-1, dtype=jnp.uint32)


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
