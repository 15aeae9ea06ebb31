"""FAST-9/16 corner detection, pure jnp (VPU-shaped elementwise ops).

Replaces the reference's per-pixel C++ FAST + octree keypoint distribution
(``ORBextractor.cc:765-857`` ``ComputeKeyPointsOctTree``).  Re-designed for
TPU: instead of data-dependent pixel loops and a recursive octree, the score
of *every* pixel is computed dense (16 shifted image planes + a log-depth
windowed-min reduction), NMS is a 3x3 max-pool, and spatial distribution is
per-grid-cell argmax + global top-k — fully static shapes.

Score semantics match OpenCV/reference FAST: the score of a pixel is the
largest threshold t for which it would still be detected, i.e.
``max over the 16 contiguous 9-arcs of (min over the arc of |p_i - c|)``
computed separately for brighter and darker arcs.  Detection at threshold t
is then simply ``score > t`` — one formulation gives both the reference's
two-threshold retry logic (ini_th=20, min_th=7: we detect at min_th and rank
by score, which dominates the retry behavior) and the NMS ranking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 — the classic FAST-16 ring, clockwise from
# 12 o'clock, offsets as (row, col).
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC = 9  # contiguous arc length (FAST-9)
BORDER = 3


def score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST score for every pixel of (H, W) f32 image.

    Returns (H, W) f32; border pixels score 0.
    """
    h, w = img.shape
    # 16 ring planes via static rolls (XLA turns these into slices)
    ring = jnp.stack(
        [jnp.roll(img, (-dr, -dc), axis=(0, 1)) for dr, dc in _CIRCLE], axis=0
    )  # (16, H, W): ring[j][y,x] = img[y + dr, x + dc]
    d = ring - img[None]  # brighter: d > t ; darker: d < -t

    def arc_score(delta):
        # max over 16 arc starts of (min over ARC consecutive ring deltas)
        circ = jnp.concatenate([delta, delta[: ARC - 1]], axis=0)  # (24, H, W)
        # log-depth windowed min: window 9 = min(win8[k], x[k+8])
        m = circ
        for shift in (1, 2, 4):  # builds windowed min of length 8
            m = jnp.minimum(m[: m.shape[0] - shift], m[shift:])
        m = jnp.minimum(m[:16], circ[8:24])  # length-9 windows, 16 starts
        return jnp.max(m, axis=0)

    score = jnp.maximum(arc_score(d), arc_score(-d))
    score = jnp.maximum(score, 0.0)
    # zero the border (ring reads wrap around otherwise)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = (
        (yy >= BORDER) & (yy < h - BORDER) & (xx >= BORDER) & (xx < w - BORDER)
    )
    return jnp.where(inside, score, 0.0)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep strict local maxima."""
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= pooled, score, 0.0)


def select_grid_topk(
    score: jnp.ndarray,
    threshold: float,
    cell: int,
    k: int,
    ini_threshold: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Spatially-distributed keypoint selection with static output shape.

    Splits the score map into ``cell x cell`` tiles, takes each tile's top-2
    pixels through the reference's TWO-THRESHOLD admission rule
    (``ORBextractor.cc:765-857``: detect at iniTh=20 per cell, retry the
    cell at minTh=7 only when it produced nothing), then the global
    top-``k`` candidates by score:

    - a tile's best pixel is admitted when its score > ``threshold``
      (min_th) — if it only clears min_th it IS the reference's retry
      detection (the tile had nothing above ini_th);
    - a tile's second pixel is admitted when it clears ``ini_threshold``
      (the cell's iniTh detection found several corners) or when the tile's
      best itself is below ini_th and the second clears min_th (the retry
      pass returns every corner above minTh).

    Returns (xy (k, 2) f32 in pixel coords, score (k,) f32); entries with
    score 0 are invalid.

    This is the TPU-native stand-in for the reference's octree distribution:
    same goal (budgeted, spread-out corners), branchless implementation.
    """
    h, w = score.shape
    if ini_threshold is None:
        ini_threshold = threshold
    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    s = jnp.pad(score, ((0, ph), (0, pw)))
    gh, gw = s.shape[0] // cell, s.shape[1] // cell
    tiles = s.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, -1)
    top2_score, top2_idx = jax.lax.top_k(tiles, 2)  # (T, 2)
    s1, s2 = top2_score[:, 0], top2_score[:, 1]
    ok1 = s1 > threshold
    ok2 = (s2 > ini_threshold) | ((s1 <= ini_threshold) & (s2 > threshold))
    cand_score = jnp.concatenate(
        [jnp.where(ok1, s1, 0.0), jnp.where(ok2, s2, 0.0)]
    )
    cand_idx = jnp.concatenate([top2_idx[:, 0], top2_idx[:, 1]])
    n_cand = cand_score.shape[0]
    top_score, top_c = jax.lax.top_k(cand_score, min(k, n_cand))
    tile_id = top_c % (gh * gw)
    in_tile = cand_idx[top_c]
    y = (tile_id // gw) * cell + in_tile // cell
    x = (tile_id % gw) * cell + in_tile % cell
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    valid_score = top_score
    if k > n_cand:  # pad to the static budget
        pad = k - n_cand
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), jnp.float32)])
        valid_score = jnp.concatenate([valid_score, jnp.zeros(pad, jnp.float32)])
    return xy, valid_score
