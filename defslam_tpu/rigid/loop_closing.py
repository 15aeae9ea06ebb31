"""Loop detection + Sim3 computation + loop correction (rigid mode).

TPU re-design of ``Thirdparty/ORBSLAM_2/src/LoopClosing.cc`` (DetectLoop
101-226, ComputeSim3 228-396, CorrectLoop 398-616) and the covisibility /
essential-graph plumbing it drives.  The reference detects loops with a
DBoW2 inverted index and per-candidate consistency groups; at this
framework's keyframe capacity (tens of keyframes, SoA stores) the same
signal is one dense batched Hamming voting pass — keyframe pairs that share
many independently-matched descriptors ARE the loop candidates, with the
covisible neighborhood and recent keyframes excluded exactly like the
reference's minimum-score / group filtering.

Pipeline (``close_loop`` orchestrates all three):

1. :func:`detect_loop` — descriptor voting against every stored keyframe,
   excluding covisible keyframes (shared map points) and temporal
   neighbors (LoopClosing.cc:116-133 uses the covisibility graph the same
   way).
2. :func:`compute_sim3` — 3D-3D correspondences through the two keyframes'
   observation tables -> closed-form Horn Sim3 -> ``ba.optimize_sim3``
   bidirectional-reprojection refinement with the reference's th2=10 gate
   (LoopClosing.cc:228-396, Optimizer.cc OptimizeSim3).
3. :func:`correct_loop` — essential-graph optimization over keyframe Sim3
   poses (odometry chain + the measured loop edge, loop keyframe fixed,
   Optimizer::OptimizeEssentialGraph semantics) and map-point correction
   through each point's reference keyframe (LoopClosing.cc:450-556:
   points are moved with their reference keyframe's corrected pose).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.geometry import se3
from defslam_tpu.mapstore.state import KeyframeStore, PointStore
from defslam_tpu.ops import matching
from defslam_tpu.rigid import ba


class LoopCandidate(NamedTuple):
    found: jnp.ndarray  # () bool
    kf: jnp.ndarray  # () int32 — candidate keyframe slot
    votes: jnp.ndarray  # () int32 — descriptor votes
    match_idx: jnp.ndarray  # (K,) current-KF kp -> candidate kp (-1 none)


@functools.partial(jax.jit, static_argnames=("cfg", "min_votes", "min_gap"))
def detect_loop(
    kfs: KeyframeStore,
    slot,
    K_cam: jnp.ndarray,
    cfg: Config,
    min_votes: int = 40,
    min_gap: int = 3,
) -> LoopCandidate:
    """Find the best loop-candidate keyframe for `slot`.

    Votes = mutual best descriptor matches below TH_LOW (the BoW similarity
    score's role).  Excluded: invalid slots, `slot` itself, keyframes within
    `min_gap` keyframe insertions (mnId < mpCurrentKF->mnId - 10 in spirit,
    LoopClosing.cc:110), and covisible keyframes (>= min_shared_points
    shared map points — the reference drops the candidate set connected to
    the current KF, LoopClosing.cc:116-133)."""
    f_cap, k_cap = kfs.point_id.shape
    desc_q = kfs.desc[slot]
    valid_q = kfs.kp_valid[slot]
    pid_q = kfs.point_id[slot]

    def score_kf(other):
        d = matching.masked_hamming(
            desc_q, kfs.desc[other], valid_q, kfs.kp_valid[other],
        )
        m = matching.best_match(
            d, max_dist=cfg.tracking.match_th_low, nn_ratio=0.75, mutual=True
        )
        m = matching.rotation_consistency(
            kfs.angle[slot], kfs.angle[other], m
        )
        votes = jnp.sum(m.idx >= 0)
        # covisibility: shared map points between the two observation tables
        pid_o = kfs.point_id[other]
        shared = jnp.sum(
            (pid_q[:, None] >= 0)
            & (pid_q[:, None] == pid_o[None, :])
        )
        return votes.astype(jnp.int32), shared.astype(jnp.int32), m.idx

    votes, shared, match_idx = jax.lax.map(score_kf, jnp.arange(f_cap))
    recency = jnp.abs(kfs.frame_id - kfs.frame_id[slot])
    gap_frames = min_gap * cfg.tracking.keyframe_period
    eligible = (
        kfs.valid
        & (jnp.arange(f_cap) != slot)
        & (shared < cfg.mapping.min_shared_points)
        & (recency > gap_frames)
    )
    votes = jnp.where(eligible, votes, -1)
    best = jnp.argmax(votes)
    found = votes[best] >= min_votes
    return LoopCandidate(
        found=found, kf=best.astype(jnp.int32), votes=votes[best],
        match_idx=match_idx[best],
    )


class Sim3Estimate(NamedTuple):
    ok: jnp.ndarray  # () bool
    s: jnp.ndarray  # () scale, candidate-cam -> current-cam
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    n_inliers: jnp.ndarray  # ()


@functools.partial(jax.jit, static_argnames=("cfg", "min_inliers"))
def compute_sim3(
    kfs: KeyframeStore,
    points: PointStore,
    slot,
    cand,
    match_idx: jnp.ndarray,  # (K,) from detect_loop
    K_cam: jnp.ndarray,
    cfg: Config,
    min_inliers: int = 20,
) -> Sim3Estimate:
    """Relative Sim3 S_cur_cand from 3D-3D correspondences: each descriptor
    match whose keypoints are both bound to map points gives a pair of the
    SAME physical point expressed in both camera frames (LoopClosing.cc:
    263-281 builds exactly these vpMapPointMatches).  Closed-form Horn
    initialization + robust bidirectional-reprojection refinement."""
    k_cap = kfs.point_id.shape[1]
    p_cap = points.capacity
    j = jnp.clip(match_idx, 0, k_cap - 1)
    pid1 = kfs.point_id[slot]  # points seen by current KF keypoints
    pid2 = kfs.point_id[cand][j]  # points at the matched candidate kps
    ok = (
        (match_idx >= 0)
        & (pid1 >= 0)
        & (pid2 >= 0)
        & points.valid[jnp.clip(pid1, 0, p_cap - 1)]
        & points.valid[jnp.clip(pid2, 0, p_cap - 1)]
    )
    x1w = points.xyz[jnp.clip(pid1, 0, p_cap - 1)]
    x2w = points.xyz[jnp.clip(pid2, 0, p_cap - 1)]
    T1 = kfs.pose[slot]
    T2 = kfs.pose[cand]
    x1 = se3.transform(T1, x1w)  # in current camera
    x2 = se3.transform(T2, x2w)  # in candidate camera
    w = ok.astype(jnp.float32)
    s0, R0, t0 = se3.horn_alignment(x2, x1, w)  # maps cand-cam -> cur-cam

    lv1 = kfs.level[slot].astype(jnp.float32)
    lv2 = kfs.level[cand][j].astype(jnp.float32)
    inv1 = 1.0 / cfg.orb.scale_factor ** (2.0 * lv1)
    inv2 = 1.0 / cfg.orb.scale_factor ** (2.0 * lv2)
    res = ba.optimize_sim3(
        K_cam, s0, R0, t0,
        xyz1=x1, xyz2=x2,
        uv1=kfs.xy[slot], uv2=kfs.xy[cand][j],
        inv_sigma2_1=inv1, inv_sigma2_2=inv2,
        mask=ok,
    )
    good = res.n_inliers >= min_inliers
    return Sim3Estimate(
        ok=good, s=res.s, R=res.R, t=res.t, n_inliers=res.n_inliers
    )


class LoopCorrection(NamedTuple):
    poses: jnp.ndarray  # (F, 4, 4) corrected keyframe poses
    xyz: jnp.ndarray  # (P, 3) corrected map points


@functools.partial(jax.jit, static_argnames=())
def correct_loop(
    kfs: KeyframeStore,
    points: PointStore,
    slot,
    cand,
    sim3: Sim3Estimate,
) -> LoopCorrection:
    """Essential-graph correction of all keyframe poses + map points.

    Edges: the odometry chain between consecutive keyframes (spanning-tree
    role, measured from current relative poses), COVISIBILITY edges between
    non-consecutive pairs sharing >= 100 observations
    (Optimizer.cc:860-896), and the LOOP edge slot<->cand with the measured
    Sim3.  The loop (candidate) keyframe is
    held fixed; the current keyframe's pose is seeded at the loop-implied
    corrected value (CorrectedSim3 of LoopClosing.cc:450-480).  Points move
    with their reference keyframe: X' = S_new_refkf^{-1}(S_old_refkf(X))
    (LoopClosing.cc:480-520's eigP3Dw correction, batched over all points).
    """
    f_cap = kfs.pose.shape[0]
    s_w, R_w, t_w = ba.sim3_from_se3(kfs.pose)

    # --- edge list: consecutive valid keyframes in insertion (frame) order.
    # The slot axis is already maintained in insertion order by the system
    # (slots are filled/recycled monotonically); invalid slots are masked.
    order = jnp.argsort(
        jnp.where(kfs.valid, kfs.frame_id, jnp.iinfo(jnp.int32).max)
    )
    n_valid = jnp.sum(kfs.valid)
    e_i = order[:-1]
    e_j = order[1:]
    seq_mask = (jnp.arange(f_cap - 1) + 1) < n_valid
    # --- covisibility edges (OptimizeEssentialGraph adds an edge for every
    # pair sharing >= 100 observations, Optimizer.cc:860-896); consecutive
    # pairs are excluded (already covered by the odometry chain, matching
    # the reference's inserted-edges dedup)
    p_cap = points.capacity
    pid = jnp.where(
        kfs.kp_valid & (kfs.point_id >= 0) & kfs.valid[:, None],
        kfs.point_id, p_cap,
    )
    occ = (
        jnp.zeros((f_cap, p_cap + 1), jnp.float32)
        .at[jnp.arange(f_cap)[:, None], pid]
        .set(1.0)[:, :p_cap]
    )
    occ = occ * points.valid[None, :].astype(jnp.float32)
    shared = occ @ occ.T  # (F, F) shared-observation counts
    pos = jnp.zeros(f_cap, jnp.int32).at[order].set(jnp.arange(f_cap))
    iu, ju = jnp.triu_indices(f_cap, k=1)
    consec = jnp.abs(pos[iu] - pos[ju]) == 1
    # the slot<->cand pair gets the MEASURED loop edge below; a covis edge
    # for the same pair would carry the drifted current relative pose and
    # fight the correction (the reference's sInsertedEdges dedup excludes
    # loop-connection pairs, Optimizer.cc OptimizeEssentialGraph)
    lo = jnp.minimum(slot, cand)
    hi = jnp.maximum(slot, cand)
    excl = consec | ((iu == lo) & (ju == hi))
    counts = jnp.where(excl, 0.0, shared[iu, ju])
    n_cov = min(3 * f_cap, iu.shape[0])
    top_c, top_idx = jax.lax.top_k(counts, n_cov)
    cov_i = iu[top_idx]
    cov_j = ju[top_idx]
    cov_mask = top_c >= 100.0
    # loop edge measured by the computed Sim3: S_slot_cand
    edge_i = jnp.concatenate([e_i, cov_i, jnp.asarray(cand)[None]])
    edge_j = jnp.concatenate([e_j, cov_j, jnp.asarray(slot)[None]])
    edge_mask = jnp.concatenate([seq_mask, cov_mask, jnp.asarray(True)[None]])

    graph = ba.build_edges_from_poses(
        edge_i, edge_j, s_w, R_w, t_w, edge_mask,
        fixed=jnp.arange(f_cap) == cand,
    )
    # overwrite the loop edge's measurement with the MEASURED Sim3
    graph = graph._replace(
        meas_s=graph.meas_s.at[-1].set(sim3.s),
        meas_R=graph.meas_R.at[-1].set(sim3.R),
        meas_t=graph.meas_t.at[-1].set(sim3.t),
    )
    # seed the current keyframe at the loop-implied pose:
    # S_slot_w_corrected = S_slot_cand o S_cand_w
    s0, R0, t0 = s_w, R_w, t_w
    sc, Rc, tc = ba._sim3_compose(
        sim3.s[None], sim3.R[None], sim3.t[None],
        s_w[cand][None], R_w[cand][None], t_w[cand][None],
    )
    s0 = s0.at[slot].set(sc[0])
    R0 = R0.at[slot].set(Rc[0])
    t0 = t0.at[slot].set(tc[0])

    s_new, R_new, t_new = ba.optimize_essential_graph(graph, s0, R0, t0)
    poses_new = ba.se3_from_sim3(s_new, R_new, t_new)

    # --- map-point correction through each point's reference keyframe
    p_cap = points.capacity
    ref = jnp.clip(points.ref_kf, 0, f_cap - 1)
    # old: x_cam = S_old(X);  new world: X' = S_new^{-1}(x_cam)
    x_cam = (
        s_w[ref][:, None]
        * jnp.einsum("pij,pj->pi", R_w[ref], points.xyz)
        + t_w[ref]
    )
    si, Ri, ti = ba._sim3_inverse(s_new[ref], R_new[ref], t_new[ref])
    xyz_new = si[:, None] * jnp.einsum("pij,pj->pi", Ri, x_cam) + ti
    movable = points.valid & (points.ref_kf >= 0)
    xyz_new = jnp.where(movable[:, None], xyz_new, points.xyz)
    return LoopCorrection(poses=poses_new, xyz=xyz_new)


def close_loop(
    kfs: KeyframeStore,
    points: PointStore,
    slot: int,
    K_cam: jnp.ndarray,
    cfg: Config,
    min_votes: int = 40,
):
    """Full LoopClosing::Run step for one new keyframe.  Host-friendly:
    returns (closed: bool, kfs, points, cand_slot) — stores are updated
    only when a loop was detected, Sim3-verified, and corrected.
    ``cand_slot`` (int, -1 if not closed) feeds :func:`fuse_and_global_ba`
    for the SearchAndFuse + global-BA completion."""
    cand = detect_loop(kfs, jnp.asarray(slot, jnp.int32), K_cam, cfg,
                       min_votes=min_votes)
    if not bool(cand.found):
        return False, kfs, points, -1
    est = compute_sim3(
        kfs, points, jnp.asarray(slot, jnp.int32), cand.kf,
        cand.match_idx, K_cam, cfg,
    )
    if not bool(est.ok):
        return False, kfs, points, -1
    corr = correct_loop(
        kfs, points, jnp.asarray(slot, jnp.int32), cand.kf, est
    )
    kfs = kfs._replace(pose=corr.poses)
    points = points._replace(xyz=corr.xyz)
    # replace duplicated current-side points with their loop-side
    # originals through the verified descriptor matches — the reference
    # does this replacement UNGATED by any projection window because the
    # pairs come from the Sim3 inlier set (LoopClosing.cc:462-478,
    # "Update matched map points and replace if duplicated")
    kfs, points, _ = replace_loop_matches(
        kfs, points, slot, int(cand.kf), cand.match_idx
    )
    return True, kfs, points, int(cand.kf)


def _resolve_chains(src, dst):
    """Forward every merge destination through the src->dst map until it is
    not itself a retired source (the reference forwards chains through
    MapPoint::Replace / mpReplaced, MapPoint.cc): without this, a pair whose
    dst is another pair's src would transfer n_obs into a point that is then
    invalidated and leave kp->point tables bound to a dead pid.  Pairs whose
    chain cycles back into the source set are dropped (a<->b mutual merges
    collapse to no-ops, which is safe).  Returns (src, dst) int32 arrays."""
    import numpy as np

    fwd = {int(s): int(d) for s, d in zip(src, dst)}
    out_s, out_d = [], []
    for s, d in fwd.items():
        seen = {s}
        while d in fwd and d not in seen:
            seen.add(d)
            d = fwd[d]
        if d in seen:
            continue  # cycle
        out_s.append(s)
        out_d.append(d)
    return (
        np.asarray(out_s, np.int32),
        np.asarray(out_d, np.int32),
    )


def replace_loop_matches(
    kfs: KeyframeStore,
    points: PointStore,
    slot: int,
    cand: int,
    match_idx: jnp.ndarray,  # (K,) current-KF kp -> candidate kp
):
    """Merge point pairs bound to descriptor-matched keypoints of the two
    loop-connection keyframes: the loop-side point replaces the
    current-side duplicate (MapPoint::Replace direction of
    LoopClosing.cc:467-477).  Returns (kfs, points, n_replaced)."""
    import numpy as np

    from defslam_tpu.rigid import triangulation as tri

    k_cap = kfs.point_id.shape[1]
    mi = np.asarray(match_idx)
    j = np.clip(mi, 0, k_cap - 1)
    pid1 = np.asarray(kfs.point_id[slot])
    pid2 = np.asarray(kfs.point_id[cand])[j]
    pvalid = np.asarray(points.valid).copy()
    ok = (
        (mi >= 0)
        & (pid1 >= 0)
        & (pid2 >= 0)
        & (pid1 != pid2)
        & pvalid[np.clip(pid1, 0, points.capacity - 1)]
        & pvalid[np.clip(pid2, 0, points.capacity - 1)]
    )
    if not ok.any():
        return kfs, points, 0
    # build src->dst from the first match per src point, then resolve
    # replacement chains so no dst is itself retired in this pass
    dst_of = {}
    for a, b in zip(pid1[ok], pid2[ok]):
        dst_of.setdefault(int(a), int(b))
    src, dst = _resolve_chains(
        np.asarray(list(dst_of.keys()), np.int32),
        np.asarray(list(dst_of.values()), np.int32),
    )
    if len(src) == 0:
        return kfs, points, 0
    pid_all = np.asarray(
        tri.apply_replacements(
            kfs.point_id, jnp.asarray(src.astype(np.int32)),
            jnp.asarray(dst), points.capacity,
        )
    )
    nobs = np.asarray(points.n_obs).copy()
    for s, d_ in zip(src, dst):
        nobs[d_] += nobs[s]
        pvalid[s] = False
    kfs = kfs._replace(point_id=jnp.asarray(pid_all))
    points = points._replace(
        n_obs=jnp.asarray(nobs), valid=jnp.asarray(pvalid)
    )
    return kfs, points, len(src)


def fuse_points_into(
    kfs: KeyframeStore,
    points: PointStore,
    s_tgt: int,
    K_cam: jnp.ndarray,
    sig2: jnp.ndarray,
    cfg: Config,
    radius: float = 3.0,
):
    """Project all valid map points into keyframe ``s_tgt`` and merge
    duplicates (``ORBmatcher::Fuse`` + ``MapPoint::Replace``,
    LoopClosing::SearchAndFuse LoopClosing.cc:496-616).  The reference
    fuses only mvpLoopMapPoints (loop-KF neighborhood points); projecting
    the whole store is a superset with identical effect — the projection
    window + chi2 gate keeps non-overlapping points out, and at SoA-store
    capacities the dense pass is one device dispatch.

    Returns (kfs, points, n_merged)."""
    import numpy as np

    from defslam_tpu.rigid import triangulation as tri

    fr = tri.fuse_into_keyframe(
        points.xyz, points.desc, points.valid,
        kfs.pose[s_tgt], K_cam,
        kfs.xy[s_tgt], kfs.desc[s_tgt], kfs.kp_valid[s_tgt],
        kfs.level[s_tgt], kfs.point_id[s_tgt],
        sig2, cfg.camera.width, cfg.camera.height, radius=radius,
    )
    kp = np.asarray(fr.kp_idx)
    existing = np.asarray(fr.existing_pid)
    nobs = np.asarray(points.n_obs).copy()
    pvalid = np.asarray(points.valid).copy()
    pid_t = np.asarray(kfs.point_id[s_tgt]).copy()
    src_list, dst_list = [], []
    for p in np.nonzero((kp >= 0) & pvalid)[0]:
        e = existing[p]
        if e < 0:
            pid_t[kp[p]] = p  # new observation for an unbound keypoint
            nobs[p] += 1
        elif e != p:
            # duplicate: keep the more-observed point (ORBmatcher.cc:~1000)
            if nobs[e] >= nobs[p]:
                src_list.append(p)
                dst_list.append(e)
            else:
                src_list.append(e)
                dst_list.append(p)
    pid_all = np.asarray(kfs.point_id).copy()
    pid_all[s_tgt] = pid_t
    n_merged = 0
    if src_list:
        src, dst = _resolve_chains(
            np.asarray(src_list, np.int32), np.asarray(dst_list, np.int32)
        )
        n_merged = len(src)
    if n_merged:
        pid_all = np.asarray(
            tri.apply_replacements(
                jnp.asarray(pid_all), jnp.asarray(src), jnp.asarray(dst),
                points.capacity,
            )
        )
        for s, d_ in zip(src, dst):
            nobs[d_] += nobs[s]
            pvalid[s] = False
    kfs = kfs._replace(point_id=jnp.asarray(pid_all))
    points = points._replace(
        n_obs=jnp.asarray(nobs), valid=jnp.asarray(pvalid)
    )
    return kfs, points, n_merged


def global_ba(
    kfs: KeyframeStore,
    points: PointStore,
    K_cam: jnp.ndarray,
    sig2: jnp.ndarray,
    iters: int = 10,
):
    """Full-map bundle adjustment over every stored keyframe and point
    (``Optimizer::GlobalBundleAdjustemnt`` as launched by
    ``LoopClosing::RunGlobalBundleAdjustment``, LoopClosing.cc:630-741).
    Keyframe 0 fixes the gauge (vpKFs[0]->setFixed, Optimizer.cc:40-235).
    Returns (kfs, points, n_inliers); chi2-failed observations are pruned
    from the kp->point tables like the reference's outlier erase."""
    import numpy as np

    lv = jnp.clip(kfs.level, 0, sig2.shape[0] - 1)
    # observations bound to retired/invalid points must not contribute
    # residuals (the reference erases them via MapPoint::Replace)
    pt_ok = points.valid[jnp.clip(kfs.point_id, 0, points.capacity - 1)]
    problem = ba.BAProblem(
        poses=kfs.pose,
        xyz=points.xyz,
        pid=kfs.point_id,
        uv=kfs.xy,
        inv_sigma2=1.0 / sig2[lv],
        obs_mask=kfs.kp_valid & kfs.valid[:, None] & pt_ok,
        cam_free=kfs.valid & (jnp.arange(kfs.pose.shape[0]) != 0),
        point_free=points.valid,
    )
    res = ba.ba_solve(problem, K_cam, iters_first=iters, iters_second=iters)
    kfs = kfs._replace(pose=res.poses)
    points = points._replace(xyz=res.xyz)
    keep = np.asarray(res.inlier)
    pid = np.asarray(kfs.point_id).copy()
    had = pid >= 0
    pid[had & ~keep] = -1
    kfs = kfs._replace(point_id=jnp.asarray(pid))
    return kfs, points, int(res.n_inliers)


def fuse_and_global_ba(
    kfs: KeyframeStore,
    points: PointStore,
    slot: int,
    cand: int,
    K_cam: jnp.ndarray,
    sig2: jnp.ndarray,
    cfg: Config,
):
    """The CorrectLoop completion the essential graph leaves undone
    (LoopClosing.cc:496-741): SearchAndFuse of loop-side map points into
    both loop-connection keyframes under the CORRECTED poses (duplicated
    landmarks triangulated on the drifted side merge with their loop-side
    originals), then a full global bundle adjustment refining the
    essential-graph solution.  Returns (kfs, points, n_merged)."""
    total = 0
    for tgt in (slot, cand):
        # the loop-fusion pass uses the reference's wider window (th=4,
        # LoopClosing::SearchAndFuse -> matcher.Fuse(pKF, cvScw, ..., 4))
        kfs, points, n = fuse_points_into(
            kfs, points, tgt, K_cam, sig2, cfg, radius=4.0
        )
        total += n
    kfs, points, _ = global_ba(kfs, points, K_cam, sig2)
    return kfs, points, total
