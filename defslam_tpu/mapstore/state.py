"""Fixed-capacity structure-of-arrays map state.

Replaces the reference's pointer-graph data model — ``Map``/``KeyFrame``/
``MapPoint`` with per-object mutexes (``Thirdparty/ORBSLAM_2``), plus the
``Def*`` subclasses (``Modules/Common/Def{Map,KeyFrame,MapPoint}.{h,cc}``) —
with padded, mask-validated arrays so every pipeline stage is a static-shape
batched device op.  Host code treats these as immutable values and swaps
whole stores (functional updates); there is no locking anywhere.

Capacities come from ``CapacityConfig``; K = keypoints/frame, P = map
points, F = keyframes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from defslam_tpu.config import Config
from defslam_tpu.frontend import Features
from defslam_tpu.geometry import camera


class KeyframeStore(NamedTuple):
    """All keyframes, SoA.  Equivalent of KeyFrame + DefKeyFrame state:
    pose, keypoints (pixel + normalized retina, DefKeyFrame.cc:94-133),
    descriptors, per-keypoint map-point association (mvpMapPoints), and the
    per-KF NRSfM surface (Surface.{h,cc})."""

    pose: jnp.ndarray  # (F, 4, 4) world->camera
    xy: jnp.ndarray  # (F, K, 2) pixel coords
    retina: jnp.ndarray  # (F, K, 2) normalized coords
    desc: jnp.ndarray  # (F, K, 8) uint32
    level: jnp.ndarray  # (F, K) int32
    angle: jnp.ndarray  # (F, K)
    kp_valid: jnp.ndarray  # (F, K) bool
    point_id: jnp.ndarray  # (F, K) int32 — map point seen at this kp, -1
    # world position of the matched point AT KEYFRAME INSERTION — the
    # reference's DefMapPoint::PosesKeyframes registration (DefKeyFrame.cc:
    # 59-74), consumed by Sim3 surface registration instead of the current
    # (re-posed) position (SurfaceRegistration.cc:69-77)
    kp_xyz: jnp.ndarray  # (F, K, 3)
    kp_xyz_valid: jnp.ndarray  # (F, K) bool
    frame_id: jnp.ndarray  # (F,) int32 source frame
    valid: jnp.ndarray  # (F,) bool
    # NRSfM per-keyframe surface (depth spline + per-kp normals)
    surf_ctrl: jnp.ndarray  # (F, nu, nv) control depths
    surf_valid: jnp.ndarray  # (F,) bool — surface estimated
    # retina domain the surface spline is parameterized over — the
    # camera-wide domain, or the KF's keypoint bbox when
    # mapping.per_kf_domain is on (DefKeyFrame.cc:94-133)
    surf_dom: jnp.ndarray  # (F, 4) [umin, umax, vmin, vmax]
    norm_k: jnp.ndarray  # (F, K, 2) per-keypoint (k1, k2)
    norm_valid: jnp.ndarray  # (F, K) bool

    @property
    def capacity(self) -> int:
        return self.pose.shape[0]


class PointStore(NamedTuple):
    """All map points, SoA.  Equivalent of MapPoint + DefMapPoint: position,
    distinctive descriptor, template embedding (facet + barycentric,
    DefMapPoint.cc:97-147), reference keyframe/keypoint."""

    xyz: jnp.ndarray  # (P, 3) world
    desc: jnp.ndarray  # (P, 8) uint32 distinctive descriptor
    facet: jnp.ndarray  # (P,) int32 template facet (-1 if unembedded)
    bary: jnp.ndarray  # (P, 3)
    ref_kf: jnp.ndarray  # (P,) int32
    ref_kp: jnp.ndarray  # (P,) int32 keypoint index in ref KF
    angle: jnp.ndarray  # (P,) f32 — orientation of the last matched
    #   keypoint (LastFrame angle for the rotation-consistency histogram,
    #   ORBmatcher.cc:35-37 + SearchByProjection rotHist)
    valid: jnp.ndarray  # (P,) bool
    n_obs: jnp.ndarray  # (P,) int32 — observation count (for culling)
    # MapPoint lifecycle counters (MapPoint.cc IncreaseVisible/IncreaseFound,
    # consumed by the found-ratio culling of LocalMapping.cc:173-199 which
    # the reference runs inside the deformable pipeline too,
    # DefLocalMapping.cc:115-130)
    n_visible: jnp.ndarray  # (P,) int32 — frames where point was a candidate
    n_found: jnp.ndarray  # (P,) int32 — frames where matched as an inlier
    first_kf: jnp.ndarray  # (P,) int32 — keyframe counter at creation
    # warm start for the per-point normal solver (the reference re-estimates
    # from the previous solution on repeated estimations)
    norm_k0: jnp.ndarray  # (P, 2)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


def empty_keyframes(cfg: Config) -> KeyframeStore:
    f = cfg.capacity.max_keyframes
    k = cfg.orb.max_keypoints
    nu, nv = cfg.mapping.sfn_ctrl_u, cfg.mapping.sfn_ctrl_v
    return KeyframeStore(
        pose=jnp.tile(jnp.eye(4)[None], (f, 1, 1)),
        xy=jnp.zeros((f, k, 2)),
        retina=jnp.zeros((f, k, 2)),
        desc=jnp.zeros((f, k, 8), jnp.uint32),
        level=jnp.zeros((f, k), jnp.int32),
        angle=jnp.zeros((f, k)),
        kp_valid=jnp.zeros((f, k), bool),
        point_id=jnp.full((f, k), -1, jnp.int32),
        kp_xyz=jnp.zeros((f, k, 3)),
        kp_xyz_valid=jnp.zeros((f, k), bool),
        frame_id=jnp.full((f,), -1, jnp.int32),
        valid=jnp.zeros((f,), bool),
        surf_ctrl=jnp.ones((f, nu, nv)),
        surf_valid=jnp.zeros((f,), bool),
        surf_dom=jnp.tile(
            camera.retina_domain(
                jnp.asarray(cfg.camera.K),
                cfg.camera.width, cfg.camera.height,
            ).astype(jnp.float32)[None],
            (f, 1),
        ),
        norm_k=jnp.zeros((f, k, 2)),
        norm_valid=jnp.zeros((f, k), bool),
    )


def empty_points(cfg: Config) -> PointStore:
    p = cfg.capacity.max_map_points
    return PointStore(
        xyz=jnp.zeros((p, 3)),
        desc=jnp.zeros((p, 8), jnp.uint32),
        facet=jnp.full((p,), -1, jnp.int32),
        bary=jnp.zeros((p, 3)),
        ref_kf=jnp.full((p,), -1, jnp.int32),
        ref_kp=jnp.full((p,), -1, jnp.int32),
        angle=jnp.zeros((p,)),
        valid=jnp.zeros((p,), bool),
        n_obs=jnp.zeros((p,), jnp.int32),
        n_visible=jnp.zeros((p,), jnp.int32),
        n_found=jnp.zeros((p,), jnp.int32),
        first_kf=jnp.zeros((p,), jnp.int32),
        norm_k0=jnp.zeros((p, 2)),
    )


import functools

import jax


def _add_keyframe_impl(
    kfs: KeyframeStore,
    slot,
    pose: jnp.ndarray,
    feats: Features,
    retina: jnp.ndarray,
    point_id: jnp.ndarray,
    frame_id,
    kp_xyz: jnp.ndarray | None = None,
    kp_xyz_valid: jnp.ndarray | None = None,
) -> KeyframeStore:
    """Functionally insert a keyframe at `slot` (host picks the slot —
    lowest invalid index, or recycles the oldest)."""
    k = feats.capacity
    if kp_xyz is None:
        kp_xyz = jnp.zeros((k, 3))
    if kp_xyz_valid is None:
        kp_xyz_valid = jnp.zeros((k,), bool)
    return kfs._replace(
        pose=kfs.pose.at[slot].set(pose),
        xy=kfs.xy.at[slot].set(feats.xy),
        retina=kfs.retina.at[slot].set(retina),
        desc=kfs.desc.at[slot].set(feats.desc),
        level=kfs.level.at[slot].set(feats.level),
        angle=kfs.angle.at[slot].set(feats.angle),
        kp_valid=kfs.kp_valid.at[slot].set(feats.valid),
        point_id=kfs.point_id.at[slot].set(point_id),
        kp_xyz=kfs.kp_xyz.at[slot].set(kp_xyz),
        kp_xyz_valid=kfs.kp_xyz_valid.at[slot].set(kp_xyz_valid),
        frame_id=kfs.frame_id.at[slot].set(frame_id),
        valid=kfs.valid.at[slot].set(True),
        surf_valid=kfs.surf_valid.at[slot].set(False),
        norm_valid=kfs.norm_valid.at[slot].set(jnp.zeros_like(kfs.norm_valid[slot])),
    )


# jitted public entry (one fused dispatch for the dozen sub-updates)
add_keyframe = jax.jit(_add_keyframe_impl, donate_argnums=(0,))


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_keyframe_from_matches(
    kfs: KeyframeStore,
    n_obs: jnp.ndarray,  # (P,)
    slot,  # () int32
    pose: jnp.ndarray,
    feats: Features,
    kp_of_point: jnp.ndarray,  # (P,) frame keypoint matched to each point
    inlier: jnp.ndarray,  # (P,) bool
    K: jnp.ndarray,
    frame_id,
    points_xyz: jnp.ndarray | None = None,  # (P, 3) current positions
):
    """One fused device op: invert point->kp matches into the keyframe's
    kp->point table, normalize keypoints to retina coords
    (DefKeyFrame::NormaliseKeypoints), register the matched points' current
    world positions for later Sim3 registration (DefKeyFrame.cc:59-74),
    insert the keyframe, and bump the matched points' observation counts."""
    from defslam_tpu.geometry import camera as cammod

    p_cap = kp_of_point.shape[0]
    k_cap = feats.capacity
    good = (kp_of_point >= 0) & inlier
    tgt = jnp.where(good, jnp.clip(kp_of_point, 0, k_cap - 1), k_cap)
    pid_of_kp = (
        jnp.full((k_cap,), -1, jnp.int32)
        .at[tgt]
        .set(jnp.arange(p_cap, dtype=jnp.int32), mode="drop")
    )
    retina = cammod.to_retina(K, feats.xy)
    if points_xyz is not None:
        kp_xyz = (
            jnp.zeros((k_cap, 3)).at[tgt].set(points_xyz, mode="drop")
        )
        kp_xyz_valid = pid_of_kp >= 0
    else:
        kp_xyz, kp_xyz_valid = None, None
    kfs = _add_keyframe_impl(
        kfs, slot, pose, feats, retina, pid_of_kp, frame_id,
        kp_xyz, kp_xyz_valid,
    )
    return kfs, n_obs + good.astype(jnp.int32)


def covisibility(kfs: KeyframeStore, slot_a: int, slot_b) -> jnp.ndarray:
    """Number of shared map points between two keyframes (covisibility
    graph weight, KeyFrame.cc UpdateConnections equivalent)."""
    ida = kfs.point_id[slot_a]
    idb = kfs.point_id[slot_b]
    va = ida >= 0
    shared = va[:, None] & (idb[None, :] >= 0) & (ida[:, None] == idb[None, :])
    return jnp.sum(shared.any(axis=1))
