"""Per-frame deformable tracking kernels (jitted building blocks).

The TPU re-design of ``DefTracking`` (``Modules/Tracking/DefTracking.cc``):
``TrackWithMotionModel``'s projection search (342-408, via
``DefORBmatcher::SearchByProjection`` 296-450 — restricted to
template-embedded points) and ``TrackLocalMap``'s SfT optimization (234-339)
become two jitted batched ops; the state machine lives in
``defslam_tpu.system``.

The reference's 64x48 frame grid for windowed candidate lookup is replaced
by a dense masked Hamming matrix (ops.matching) — at <=1536 keypoints the
full matrix is cheaper on TPU than gather-based grid queries.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.frontend import Features
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.mapstore.state import PointStore
from defslam_tpu.ops import matching
from defslam_tpu.template import mesh as meshmod
from defslam_tpu.tracking import sft


class FrameMatches(NamedTuple):
    kp_of_point: jnp.ndarray  # (P,) int32 — frame keypoint for each map point
    dist: jnp.ndarray  # (P,) int32
    n_matches: jnp.ndarray  # () int32
    n_dropped: jnp.ndarray  # () int32 — candidates past match_capacity
    visible: jnp.ndarray  # (P,) bool — point was a frustum candidate
    #   (MapPoint::IncreaseVisible semantics, Tracking::SearchLocalPoints)


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_points_to_frame(
    points: PointStore,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    feats: Features,
    cfg: Config,
    window: float | None = None,
) -> FrameMatches:
    """Project map points with the pose prior and match to frame keypoints
    within a pixel window (SearchByProjection semantics: only points embedded
    in the template, DefORBmatcher.cc:331-332; window scales with pyramid
    level like the reference's th*scaleFactor^level).

    The candidate point set is COMPACTED before the (P, K) pair tensors:
    only valid + template-embedded + in-frustum points can match, so gather
    them into `tracking.match_capacity` slots first — the Hamming matrix and
    window tensor then scale with the live candidate count, not the point
    store capacity (2x HBM traffic cut at the shipped 4096/2048 sizes).
    Overflow past the capacity is counted in `n_dropped` (never silent)."""
    w = cfg.tracking.projection_window if window is None else window
    pc = se3.transform(pose, points.xyz)
    uv = cam.project(K, pc)
    in_front = pc[..., 2] > 1e-6
    in_img = cam.in_image(uv, cfg.camera.width, cfg.camera.height)
    ok_p = points.valid & (points.facet >= 0) & in_front & in_img

    p_cap = points.capacity
    n_c = min(cfg.tracking.match_capacity, p_cap)
    sel, ok_c, n_dropped = matching.compact_select(ok_p, n_c)
    uv_c = uv[sel]
    desc_c = points.desc[sel]
    angle_c = points.angle[sel]

    # per-keypoint window scaled by its pyramid level
    scale = cfg.orb.scale_factor ** feats.level.astype(jnp.float32)
    d = jnp.abs(uv_c[:, None, :] - feats.xy[None, :, :])  # (Pc, K, 2)
    inside = jnp.max(d, axis=-1) <= w * scale[None, :]
    dist = matching.masked_hamming(
        desc_c, feats.desc, ok_c, feats.valid, pair_mask=inside
    )
    m = matching.best_match(
        dist,
        max_dist=cfg.tracking.match_th_high,
        nn_ratio=cfg.tracking.nn_ratio,
        mutual=True,
    )
    # rotation-consistency histogram: point angle = the matched keypoint's
    # angle from the previous frame (LastFrame semantics of
    # DefORBmatcher::SearchByProjection + ComputeThreeMaxima,
    # DefORBmatcher.cc:304-443)
    m = matching.rotation_consistency(angle_c, feats.angle, m)
    # scatter back to the full point axis
    idx_ok = jnp.where(ok_c, m.idx, -1)
    kp_full = jnp.full(p_cap, -1, jnp.int32).at[sel].set(idx_ok)
    dist_full = jnp.full(p_cap, matching.INVALID).at[sel].set(m.dist)
    return FrameMatches(
        kp_of_point=kp_full,
        dist=dist_full,
        n_matches=jnp.sum(idx_ok >= 0),
        n_dropped=n_dropped,
        visible=ok_p,
    )


def _sft_data_from_matches(
    points: PointStore,
    matches: FrameMatches,
    feats: Features,
    tmpl: meshmod.Template,
    pose0: jnp.ndarray,
    K: jnp.ndarray,
    cfg: Config,
):
    """Compacted SfT problem from point->keypoint matches.

    Observation rows are COMPACTED from the P map-point slots down to the
    frame keypoint capacity: mutual best-matching makes point->keypoint
    matches injective, so at most K (<= max_keypoints) slots can be matched
    — gathering them first shrinks every per-observation array in the LM
    loop by P/K (2.7x at the shipped capacities) for identical results.
    Per-observation information is the pyramid-level invSigma2
    (1/1.2^(2 lv)) like g2o's setInformation, normalized by the frame's
    keypoint count (DefOptimizer.cc:276, 340).

    Returns (data, sel (N,), sel_mask (N,)); the caller decides whether the
    compaction scatter-back applies via ``max_keypoints < capacity``."""
    p_cap = points.capacity
    mask_full = (matches.kp_of_point >= 0) & points.valid & (points.facet >= 0)
    n_obs = min(cfg.orb.max_keypoints, p_cap)
    if n_obs < p_cap:
        # matched slots first (top_k of the mask is stable: equal values
        # keep ascending index order), then gather the observation arrays
        _, sel = jax.lax.top_k(mask_full.astype(jnp.int32), n_obs)
        sel_mask = mask_full[sel]
    else:
        sel = jnp.arange(p_cap)
        sel_mask = mask_full
    kp = jnp.clip(matches.kp_of_point[sel], 0, feats.capacity - 1)
    obs_uv = feats.xy[kp]
    lv = feats.level[kp].astype(jnp.float32)
    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** (2.0 * lv))
    data = sft.data_from_template(
        tmpl, K, pose0,
        obs_uv=obs_uv,
        obs_face=points.facet[sel],
        obs_bary=points.bary[sel],
        obs_invsigma2=inv_sigma2,
        obs_mask=sel_mask,
        n_kp=jnp.sum(feats.valid).astype(jnp.float32),
    )
    return data, sel, sel_mask


# module-level jitted entry (a per-call jax.jit wrapper would retrace the
# compaction graph every frame on the multi-chip path)
_sft_data_jit = jax.jit(_sft_data_from_matches, static_argnames=("cfg",))


def _scatter_sft_result(res: sft.SfTResult, sel, sel_mask, p_cap: int):
    """Scatter compacted per-observation outputs back to the P point slots."""
    inlier = jnp.zeros(p_cap, bool).at[sel].set(res.inlier & sel_mask)
    chi2 = jnp.full(p_cap, jnp.inf, res.chi2.dtype).at[sel].set(res.chi2)
    return sft.SfTResult(
        T=res.T, nodes=res.nodes, inlier=inlier, chi2=chi2, cost=res.cost
    )


@functools.partial(jax.jit, static_argnames=("cfg", "reg_temp"))
def sft_track(
    points: PointStore,
    matches: FrameMatches,
    feats: Features,
    tmpl: meshmod.Template,
    pose0: jnp.ndarray,
    K: jnp.ndarray,
    cfg: Config,
    reg_temp: float | None = None,
) -> sft.SfTResult:
    """Assemble the SfT problem from point->keypoint matches and solve
    (see _sft_data_from_matches for the compaction scheme)."""
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    data, sel, sel_mask = _sft_data_from_matches(
        points, matches, feats, tmpl, pose0, K, cfg
    )
    res = sft.solve(data, topo, cfg, reg_temp=reg_temp)
    if min(cfg.orb.max_keypoints, points.capacity) == points.capacity:
        return res
    return _scatter_sft_result(res, sel, sel_mask, points.capacity)


def sft_track_sharded(
    mesh,
    points: PointStore,
    matches: FrameMatches,
    feats: Features,
    tmpl: meshmod.Template,
    pose0: jnp.ndarray,
    K: jnp.ndarray,
    cfg: Config,
    reg_temp: float | None = None,
) -> sft.SfTResult:
    """sft_track with the solve sharded over the mesh's "dp" axis
    (parallel.sharded.sft_solve_sharded): the production multi-chip frame
    solver used when Config.parallel.enabled."""
    from defslam_tpu.parallel import sharded

    n_obs = min(cfg.orb.max_keypoints, points.capacity)
    assert n_obs % mesh.devices.size == 0, (
        "the sharded observation axis min(max_keypoints, max_map_points) "
        "must divide over the mesh"
    )
    data, sel, sel_mask = _sft_data_jit(
        points, matches, feats, tmpl, pose0, K, cfg
    )
    res = sharded.sft_solve_sharded(mesh, data, cfg, reg_temp=reg_temp)
    if min(cfg.orb.max_keypoints, points.capacity) == points.capacity:
        return res
    return _scatter_sft_result(res, sel, sel_mask, points.capacity)


def motion_model_prediction(
    pose: jnp.ndarray, prev_pose: jnp.ndarray
) -> jnp.ndarray:
    """Constant-velocity pose prediction (TrackWithMotionModel's
    ``mVelocity * mLastFrame.mTcw`` seed, DefTracking.cc:342-408 /
    Tracking.cc:1018+): velocity = T_t o T_{t-1}^{-1}, prediction for the
    next frame = velocity o T_t.  With prev_pose == pose the prediction is
    the current pose (empty-velocity fallback).  Without this seed a
    translating camera's motion is partially absorbed by the mesh — camera
    translation and a rigid surface translation are SfT-indistinguishable
    up to the (weak) temporal term, so the solver must START near the true
    camera pose for the split to come out right.

    Both inputs are re-orthonormalized first: float32 drift off SO(3) is
    amplified geometrically by the transpose-inverse in the velocity
    composition (observed: 1e-4 -> 0.77 orthonormality error in 10 frames
    without this), and the prediction feeds back into the next pose."""
    pose = se3.orthonormalize(pose)
    vel = pose @ se3.inverse(se3.orthonormalize(prev_pose))
    return vel @ pose


@functools.partial(jax.jit, static_argnames=("cfg", "window_scale"))
def track_frame(
    img: jnp.ndarray,
    points: PointStore,
    pose: jnp.ndarray,
    prev_pose: jnp.ndarray,
    tmpl: meshmod.Template,
    K: jnp.ndarray,
    cfg: Config,
    window_scale: float = 1.0,
):
    """The fused per-frame hot path: extract + project-match + SfT + point
    reposing in ONE compiled computation.

    One dispatch and one small host readback per frame — essential because
    per-op dispatch latency (especially over a TPU tunnel) would otherwise
    dominate the frame budget.  Returns
    (feats, matches, sft_result, new_points, stats[n_matches, n_inliers]).
    """
    from defslam_tpu.frontend import extract_features

    pred = motion_model_prediction(pose, prev_pose)
    feats = extract_features(img, cfg)
    matches = match_points_to_frame(
        points, pred, K, feats, cfg,
        window=window_scale * cfg.tracking.projection_window,
    )
    res = sft_track(points, matches, feats, tmpl, pred, K, cfg)
    new_points = _reposition(points, res.nodes, cfg)
    # refresh per-point angles from the matched frame keypoints so the next
    # frame's rotation histogram compares against THIS frame (LastFrame);
    # bump the visible/found lifecycle counters (MapPoint::IncreaseVisible /
    # IncreaseFound) feeding the mapping step's found-ratio culling
    kp = jnp.clip(matches.kp_of_point, 0, feats.capacity - 1)
    new_points = new_points._replace(
        angle=jnp.where(
            matches.kp_of_point >= 0, feats.angle[kp], new_points.angle
        ),
        n_visible=new_points.n_visible + matches.visible.astype(jnp.int32),
        n_found=new_points.n_found
        + (res.inlier & (matches.kp_of_point >= 0)).astype(jnp.int32),
    )
    stats = _frame_stats(matches, res)
    return feats, matches, res, new_points, stats


def _frame_stats(matches: FrameMatches, res) -> jnp.ndarray:
    """[n_matches, n_inliers, n_local_candidates, n_match_dropped] —
    n_local mirrors the reference's numberLocalMapPoints column of
    Matches.txt (Tracking.cc:1277)."""
    return jnp.stack(
        [
            matches.n_matches,
            jnp.sum(res.inlier).astype(jnp.int32),
            jnp.sum(matches.visible).astype(jnp.int32),
            matches.n_dropped,
        ]
    )


def track_frame_parallel(
    mesh,
    img: jnp.ndarray,
    points: PointStore,
    pose: jnp.ndarray,
    prev_pose: jnp.ndarray,
    tmpl: meshmod.Template,
    K: jnp.ndarray,
    cfg: Config,
    window_scale: float = 1.0,
):
    """track_frame with the SfT solve sharded over the device mesh — the
    multi-chip frame path (Config.parallel.enabled).  Extraction and
    matching run replicated-by-default (they are a small fraction of the
    frame); the LM solve's normal-equation blocks are psum'd over ICI.
    Same outputs as :func:`track_frame`."""
    from defslam_tpu.frontend import extract_features

    pred = motion_model_prediction(pose, prev_pose)
    feats = extract_features(img, cfg)
    matches = match_points_to_frame(
        points, pred, K, feats, cfg,
        window=window_scale * cfg.tracking.projection_window,
    )
    res = sft_track_sharded(mesh, points, matches, feats, tmpl, pred, K, cfg)
    new_points = reposition_points(points, res.nodes, cfg)
    kp = jnp.clip(matches.kp_of_point, 0, feats.capacity - 1)
    new_points = new_points._replace(
        angle=jnp.where(
            matches.kp_of_point >= 0, feats.angle[kp], new_points.angle
        ),
        n_visible=new_points.n_visible + matches.visible.astype(jnp.int32),
        n_found=new_points.n_found
        + (res.inlier & (matches.kp_of_point >= 0)).astype(jnp.int32),
    )
    stats = _frame_stats(matches, res)
    return feats, matches, res, new_points, stats


def _reposition(points: PointStore, nodes: jnp.ndarray, cfg: Config) -> PointStore:
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    new_xyz = meshmod.facet_positions(nodes, topo, points.facet, points.bary)
    keep = points.valid & (points.facet >= 0)
    return points._replace(xyz=jnp.where(keep[:, None], new_xyz, points.xyz))


@functools.partial(jax.jit, static_argnames=("cfg",))
def reposition_points(
    points: PointStore, nodes: jnp.ndarray, cfg: Config
) -> PointStore:
    """Recompute every embedded point from its barycentric embedding after a
    mesh update (DefOptimizer.cc:568-577 -> DefMapPoint::RecalculatePosition)."""
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    new_xyz = meshmod.facet_positions(nodes, topo, points.facet, points.bary)
    keep = points.valid & (points.facet >= 0)
    return points._replace(
        xyz=jnp.where(keep[:, None], new_xyz, points.xyz)
    )
