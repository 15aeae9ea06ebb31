"""Feature-extraction frontend: image -> fixed-capacity keypoint arrays.

The TPU-native equivalent of the reference's ``ORBextractor::operator()``
(``Thirdparty/ORBSLAM_2/src/ORBextractor.cc:1047-1118``): 8-level pyramid,
dense FAST scores, grid-distributed top-k selection, intensity-centroid
orientation and steered-BRIEF descriptors — all inside one jit, producing
statically-shaped, mask-validated arrays.

Per-level feature budgets follow the reference's geometric distribution
(ORBextractor.cc ctor: n_lv proportional to (1/scale)^lv, normalized to the
total budget).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from defslam_tpu.config import Config
from defslam_tpu.ops import fast, orb, pyramid


class Features(NamedTuple):
    """Per-frame keypoints, padded to a static capacity K.

    xy      (K, 2) f32  : level-0 pixel coordinates
    response(K,)   f32  : FAST score
    level   (K,)   i32  : pyramid level
    angle   (K,)   f32  : orientation (radians)
    desc    (K, 8) u32  : 256-bit rBRIEF
    valid   (K,)   bool : capacity mask
    """

    xy: jnp.ndarray
    response: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def level_budgets(n_features: int, n_levels: int, scale_factor: float):
    """Geometric per-level keypoint budgets (reference ORBextractor ctor)."""
    f = 1.0 / scale_factor
    raw = np.array([f**lv for lv in range(n_levels)])
    raw = raw / raw.sum() * n_features
    out = [int(round(x)) for x in raw]
    out[0] += n_features - sum(out)
    return out


def _level_quotas(avail: list[int], k: int) -> list[int]:
    """Largest-remainder proportional quotas: split budget ``k`` over levels
    with ``avail[i]`` candidates each, never exceeding a level's count."""
    total = sum(avail)
    raw = [k * a / total for a in avail]
    q = [min(int(x), a) for x, a in zip(raw, avail)]
    # hand leftover slots to the levels with spare candidates, largest
    # fractional remainder first
    rest = k - sum(q)
    order = sorted(range(len(avail)), key=lambda i: raw[i] - int(raw[i]),
                   reverse=True)
    while rest > 0:
        gave = False
        for i in order:
            if rest == 0:
                break
            if q[i] < avail[i]:
                q[i] += 1
                rest -= 1
                gave = True
        if not gave:
            break
    return q


def _cell_size(h: int, w: int, budget: int) -> int:
    """Tile size giving ~2x budget candidate cells (>= 8 px)."""
    import math

    c = int(math.sqrt(h * w / max(2 * budget, 1)))
    return max(8, c)


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features(img: jnp.ndarray, cfg: Config) -> Features:
    """(H, W) image (uint8 or f32) -> Features with capacity
    cfg.orb.max_keypoints.

    Detection/selection run per level (cheap dense VPU ops); orientation,
    blur and descriptors — the gather-heavy stages — run BATCHED across all
    levels on a zero-padded (L, H, W) canvas stack via
    ``orb.orient_describe_stack`` (row gathers + one-hot matmuls, no scalar
    gathers).  Sampling semantics (edge clipping, rounding) are identical
    to the per-level path."""
    img = img.astype(jnp.float32)
    oc = cfg.orb
    levels = pyramid.build_pyramid(img, oc.n_levels, oc.scale_factor)
    budgets = level_budgets(oc.n_features, oc.n_levels, oc.scale_factor)
    scales = pyramid.scale_factors(oc.n_levels, oc.scale_factor)
    h0, w0 = levels[0].shape

    xs, resps, lvs, scs = [], [], [], []
    used = [lv for lv, b in enumerate(budgets) if b > 0]
    for lv in used:
        img_lv, budget = levels[lv], budgets[lv]
        score = fast.nms3(fast.score_map(img_lv))
        cell = _cell_size(*img_lv.shape, budget)
        xy, resp = fast.select_grid_topk(
            score, float(oc.min_th_fast), cell, budget,
            ini_threshold=float(oc.ini_th_fast),
        )
        xs.append(xy)
        resps.append(resp)
        lvs.append(jnp.full(xy.shape[0], lv, jnp.int32))
        scs.append(jnp.full(xy.shape[0], scales[lv], jnp.float32))
    xy_lv = jnp.concatenate(xs, axis=0)  # level coords, all keypoints
    resp = jnp.concatenate(resps, axis=0)
    lv_all = jnp.concatenate(lvs, axis=0)
    sc_all = jnp.concatenate(scs, axis=0)
    lv_compact = jnp.searchsorted(
        jnp.asarray(used, jnp.int32), lv_all
    ).astype(jnp.int32)

    # canvas stacks: every used level zero-padded to the level-0 shape
    raw = jnp.stack(
        [
            jnp.pad(levels[lv], ((0, h0 - levels[lv].shape[0]),
                                 (0, w0 - levels[lv].shape[1])))
            for lv in used
        ]
    )
    blur = pyramid.gaussian_blur_batched(raw, sigma=2.0, radius=3)
    level_hw = jnp.asarray(
        [[levels[lv].shape[0], levels[lv].shape[1]] for lv in used],
        jnp.int32,
    )
    ang, desc = orb.orient_describe_stack(raw, blur, lv_compact, xy_lv, level_hw)

    cat = Features(
        xy=xy_lv * sc_all[:, None],
        response=resp,
        level=lv_all,
        angle=ang,
        desc=desc,
        valid=resp > 0,
    )
    if cfg.camera.has_distortion:
        # undistort keypoint coordinates (Frame::UndistortKeyPoints) —
        # trace-time branch: distortion-free configs compile no extra ops
        from defslam_tpu.geometry import camera as cammod

        K = jnp.asarray(cfg.camera.K)
        cat = cat._replace(
            xy=cammod.undistort_points(K, cfg.camera.dist, cat.xy)
        )
    k = cfg.orb.max_keypoints
    n = cat.xy.shape[0]
    if n > k:
        # LEVEL-AWARE truncation: shrink each level's keypoint quota
        # proportionally to its reference budget instead of a global
        # response top-k (which starves coarse pyramid levels on
        # texture-dense images — the reference's per-level budgets are
        # fixed, ORBextractor.cc ctor + ComputeKeyPointsOctTree).  The
        # quota is applied against each level's VALID detections (rank
        # among valid entries), and unused quota backfills with the
        # next-best valid candidates across levels by response — so a
        # weakly-textured level never wastes capacity on padding slots.
        used_budgets = [budgets[lv] for lv in used]
        quotas = _level_quotas(used_budgets, k)
        starts = np.concatenate([[0], np.cumsum(used_budgets)])
        ranks, quota_of = [], []
        for i, q in enumerate(quotas):
            seg_valid = cat.valid[starts[i]:starts[i + 1]]
            ranks.append(jnp.cumsum(seg_valid.astype(jnp.int32)) - 1)
            quota_of.append(jnp.full(seg_valid.shape[0], q, jnp.int32))
        rank = jnp.concatenate(ranks)
        in_quota = cat.valid & (rank < jnp.concatenate(quota_of))
        key = jnp.where(
            cat.valid,
            jnp.where(in_quota, 1e9, 0.0) + cat.response,
            -1.0,
        )
        _, order = jax.lax.top_k(key, k)
        cat = jax.tree.map(lambda a: a[order], cat)
    elif n < k:
        pad = k - n
        cat = Features(
            xy=jnp.concatenate([cat.xy, jnp.zeros((pad, 2), jnp.float32)]),
            response=jnp.concatenate([cat.response, jnp.zeros(pad, jnp.float32)]),
            level=jnp.concatenate([cat.level, jnp.zeros(pad, jnp.int32)]),
            angle=jnp.concatenate([cat.angle, jnp.zeros(pad, jnp.float32)]),
            desc=jnp.concatenate([cat.desc, jnp.zeros((pad, 8), jnp.uint32)]),
            valid=jnp.concatenate([cat.valid, jnp.zeros(pad, bool)]),
        )
    return cat
