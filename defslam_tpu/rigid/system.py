"""Rigid ORB-SLAM2 comparison mode — the reference's ``#ifdef ORBSLAM``
build (``Modules/Settings/set_MAC.h:24-25``, ``Modules/Common/System.cc:
24-38,103-157``): same input plumbing, stock rigid SLAM instead of the
deformable layer.  Orchestrates the already-TPU-native rigid libraries:

- two-view H/F RANSAC initialization     rigid.initializer
  (Initializer.cc:44-124; Tracking::MonocularInitialization)
- motion-model projection tracking + pose-only LM
  (Tracking::TrackWithMotionModel 1018+, Optimizer::poseOptimization)
- epipolar triangulation + fusion        rigid.triangulation
  (LocalMapping::CreateNewMapPoints 201-458, ORBmatcher::Fuse)
- Schur-complement local BA              rigid.ba
  (Optimizer::LocalBundleAdjustment 447-771)
- found-ratio MapPoint culling + redundancy KeyFrame culling
  (LocalMapping.cc:173-199, 645-725)     rigid.culling
- loop closing                           rigid.loop_closing
  (LoopClosing.cc:398-616)

Host code is the state machine; all geometry/matching/optimization runs in
jitted batched kernels on device.  The stores are the same fixed-capacity
SoA arrays as the deformable system (mapstore.state) with ``facet = -1``
everywhere (no template).
"""

from __future__ import annotations

import enum

import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.frontend import Features, extract_features
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.mapstore import state as store
from defslam_tpu.ops import matching
from defslam_tpu.rigid import ba, culling, initializer, loop_closing
from defslam_tpu.rigid import triangulation as tri
from defslam_tpu.tracking import pose_opt


class RigidState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "window"))
def _match_points_rigid(
    points, pose, K, feats: Features, cfg: Config, window: float = 15.0
):
    """Projection search of ALL valid map points against the frame
    (ORBmatcher::SearchByProjection(Frame, ...) ORBmatcher.cc:42-166 —
    rigid mode has no template gate, unlike the deformable tracker)."""
    pc = se3.transform(pose, points.xyz)
    uv = cam.project(K, pc)
    ok_p = (
        points.valid
        & (pc[..., 2] > 1e-6)
        & cam.in_image(uv, cfg.camera.width, cfg.camera.height)
    )
    scale = cfg.orb.scale_factor ** feats.level.astype(jnp.float32)
    d = jnp.abs(uv[:, None, :] - feats.xy[None, :, :])
    inside = jnp.max(d, axis=-1) <= window * scale[None, :]
    dist = matching.masked_hamming(
        points.desc, feats.desc, ok_p, feats.valid, pair_mask=inside
    )
    m = matching.best_match(
        dist, max_dist=cfg.tracking.match_th_high,
        nn_ratio=cfg.tracking.nn_ratio, mutual=True,
    )
    m = matching.rotation_consistency(points.angle, feats.angle, m)
    return m.idx, jnp.sum(m.idx >= 0), ok_p


@functools.partial(jax.jit, static_argnames=("cfg", "radius"))
def _match_for_init(f1: Features, f2: Features, cfg: Config,
                    radius: float = 100.0):
    """SearchForInitialization (ORBmatcher.cc:418-536): windowed descriptor
    match between the two init frames with ratio + rotation checks."""
    inside = matching.window_mask(f1.xy, f2.xy, radius)
    d = matching.masked_hamming(
        f1.desc, f2.desc, f1.valid, f2.valid, pair_mask=inside
    )
    m = matching.best_match(d, max_dist=cfg.tracking.match_th_low,
                            nn_ratio=0.9, mutual=True)
    m = matching.rotation_consistency(f1.angle, f2.angle, m)
    return m.idx


class RigidSystem:
    """Monocular rigid SLAM (the reference's ORBSLAM A/B baseline)."""

    def __init__(self, cfg: Config | None = None):
        self.cfg = cfg or Config()
        self.K = jnp.asarray(self.cfg.camera.K)
        self.sig2 = tri.level_sigma2(
            self.cfg.orb.n_levels, self.cfg.orb.scale_factor
        )
        self.reset()

    # ----------------------------------------------------------- lifecycle

    def reset(self):
        c = self.cfg
        self.kfs = store.empty_keyframes(c)
        self.points = store.empty_points(c)
        self.pose = jnp.eye(4)
        self.velocity = jnp.eye(4)
        self.state = RigidState.NO_IMAGES_YET
        self.frame_id = -1
        self.frames_since_kf = 0
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self._init_feats: Features | None = None
        # found-ratio statistics (MapPoint::IncreaseVisible/IncreaseFound)
        p = c.capacity.max_map_points
        self._visible = np.zeros(p, np.int32)
        self._found = np.zeros(p, np.int32)
        self._born_kf = np.full(p, -1, np.int32)  # creating KF count
        self._n_kf_inserted = 0
        self.loops_closed = 0

    # ------------------------------------------------------------ tracking

    def track_monocular(self, img, timestamp: float = 0.0):
        self.frame_id += 1
        img = jnp.asarray(img)
        if img.ndim == 3:
            img = jnp.mean(img.astype(jnp.float32), axis=-1)
        feats = extract_features(img, self.cfg)
        if self.state in (RigidState.NO_IMAGES_YET, RigidState.NOT_INITIALIZED):
            ok = self._try_initialize(feats)
            self.state = RigidState.OK if ok else RigidState.NOT_INITIALIZED
            if ok:
                self.trajectory.append((timestamp, np.asarray(self.pose)))
                return np.asarray(self.pose)
            return None
        return self._track(feats, timestamp)

    def _try_initialize(self, feats: Features) -> bool:
        c = self.cfg
        n_valid = int(jnp.sum(feats.valid))
        if n_valid < 100:  # reference requires > 100 keypoints (Tracking.cc)
            self._init_feats = None
            return False
        if self._init_feats is None:
            self._init_feats = feats
            return False
        f1 = self._init_feats
        idx = _match_for_init(f1, feats, c)
        mask = idx >= 0
        if int(jnp.sum(mask)) < 100:
            self._init_feats = feats  # reference replaces the init frame
            return False
        j = jnp.clip(idx, 0, feats.capacity - 1)
        res = initializer.two_view_init(
            f1.xy, feats.xy[j], mask, self.K,
            jax.random.PRNGKey(c.seed),
        )
        if not bool(res.ok):
            return False
        good = np.asarray(res.good & mask)
        xyz = np.asarray(res.xyz)
        # median-depth normalization (CreateInitialMapMonocular,
        # Tracking.cc: invMedianDepth scaling)
        med = float(np.median(xyz[good, 2])) if good.any() else 1.0
        if med <= 1e-6:
            return False
        xyz = xyz / med
        t = np.asarray(res.t) / med
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3] = np.asarray(res.R)
        T1[:3, 3] = t

        p_cap = c.capacity.max_map_points
        kp1 = np.nonzero(good)[0][:p_cap]
        n = len(kp1)
        if n < 50:
            return False
        kp2 = np.asarray(j)[kp1]
        pts = store.empty_points(c)
        xyz_arr = np.zeros((p_cap, 3), np.float32)
        xyz_arr[:n] = xyz[kp1]
        valid = np.zeros(p_cap, bool)
        valid[:n] = True
        desc2 = np.asarray(feats.desc)
        ang2 = np.asarray(feats.angle)
        desc_arr = np.zeros((p_cap, 8), np.uint32)
        desc_arr[:n] = desc2[kp2]
        ang_arr = np.zeros(p_cap, np.float32)
        ang_arr[:n] = ang2[kp2]
        self.points = pts._replace(
            xyz=jnp.asarray(xyz_arr),
            desc=jnp.asarray(desc_arr),
            angle=jnp.asarray(ang_arr),
            ref_kf=jnp.asarray(np.where(valid, 1, -1).astype(np.int32)),
            ref_kp=jnp.asarray(
                np.concatenate([kp2, -np.ones(p_cap - n)]).astype(np.int32)
            ),
            valid=jnp.asarray(valid),
            n_obs=jnp.asarray(valid.astype(np.int32) * 2),
        )
        k_cap = feats.capacity
        pid1 = np.full(k_cap, -1, np.int32)
        pid1[kp1] = np.arange(n)
        pid2 = np.full(k_cap, -1, np.int32)
        pid2[kp2] = np.arange(n)
        kfs = store.empty_keyframes(c)
        kfs = store.add_keyframe(
            kfs, 0, jnp.eye(4), f1, cam.to_retina(self.K, f1.xy),
            jnp.asarray(pid1), jnp.asarray(self.frame_id - 1, jnp.int32),
        )
        kfs = store.add_keyframe(
            kfs, 1, jnp.asarray(T1), feats, cam.to_retina(self.K, feats.xy),
            jnp.asarray(pid2), jnp.asarray(self.frame_id, jnp.int32),
        )
        self.kfs = kfs
        self._n_kf_inserted = 2
        self._born_kf[:n] = 0
        self._visible[:n] = 2
        self._found[:n] = 2
        # global BA on the initial map (Tracking.cc: GlobalBundleAdjustemnt
        # (20) right after initialization), first camera fixed
        self._local_ba(fix_first=True)
        self.pose = self.kfs.pose[1]
        self.velocity = jnp.eye(4)
        self.frames_since_kf = 0
        self._init_feats = None
        return True

    def _track(self, feats: Features, timestamp: float):
        c = self.cfg
        pred = self.velocity @ self.pose
        idx, n_m, visible = _match_points_rigid(
            self.points, pred, self.K, feats, c
        )
        if int(n_m) < 20:  # wider window retry (Tracking.cc:1040-1052)
            idx, n_m, visible = _match_points_rigid(
                self.points, pred, self.K, feats, c, window=30.0
            )
        res = self._pose_solve(pred, idx, feats)
        if int(res.n_inliers) < c.tracking.min_inliers_ok:
            ok_r, T_r, n_r = pose_opt.relocalize(
                feats, self.kfs, self.points, self.K, c
            )
            if bool(ok_r):
                idx, n_m, visible = _match_points_rigid(
                    self.points, T_r, self.K, feats, c, window=30.0
                )
                res = self._pose_solve(T_r, idx, feats)
            if int(res.n_inliers) < c.tracking.min_inliers_ok:
                self.state = RigidState.LOST
                return None
        prev = self.pose
        self.pose = res.T
        self.velocity = res.T @ se3.inverse(prev)
        self.state = RigidState.OK
        self.trajectory.append((timestamp, np.asarray(self.pose)))

        # found-ratio statistics
        vis = np.asarray(visible)
        fnd = np.asarray((idx >= 0) & res.inlier)
        self._visible += vis
        self._found += fnd

        self.frames_since_kf += 1
        if self.frames_since_kf >= c.tracking.keyframe_period and int(
            res.n_inliers
        ) >= c.tracking.min_inliers_ok:
            self._insert_keyframe(feats, idx, res.inlier)
            self.frames_since_kf = 0
        return np.asarray(self.pose)

    def _pose_solve(self, T0, idx, feats: Features):
        c = self.cfg
        k_cap = feats.capacity
        kp = jnp.clip(idx, 0, k_cap - 1)
        obs_uv = feats.xy[kp]
        lv = feats.level[kp].astype(jnp.float32)
        inv_sigma2 = 1.0 / (c.orb.scale_factor ** (2.0 * lv))
        mask = (idx >= 0) & self.points.valid
        return pose_opt.solve_pose(
            self.K, T0, self.points.xyz, obs_uv, inv_sigma2, mask, c
        )

    # ------------------------------------------------------------- mapping

    def _free_kf_slot(self) -> int:
        valid = np.asarray(self.kfs.valid)
        free = np.nonzero(~valid)[0]
        if len(free):
            return int(free[0])
        fid = np.asarray(self.kfs.frame_id).copy()
        fid[:2] = np.iinfo(np.int32).max  # never recycle the init pair
        return int(np.argmin(fid))

    def _covis_order(self, slot: int) -> list[int]:
        """Keyframes ordered by shared-point count with `slot` (the
        covisibility neighbors used for triangulation/fusion)."""
        pid = np.asarray(self.kfs.point_id)
        valid = np.asarray(self.kfs.valid)
        me = pid[slot]
        out = []
        for i in np.nonzero(valid)[0]:
            if i == slot:
                continue
            shared = len(
                np.intersect1d(me[me >= 0], pid[i][pid[i] >= 0])
            )
            if shared >= 10:
                out.append((shared, int(i)))
        out.sort(reverse=True)
        return [i for _, i in out]

    def _insert_keyframe(self, feats: Features, idx, inlier):
        c = self.cfg
        slot = self._free_kf_slot()
        new_kfs, new_n_obs = store.insert_keyframe_from_matches(
            self.kfs, self.points.n_obs, jnp.asarray(slot, jnp.int32),
            self.pose, feats, idx, inlier, self.K,
            jnp.asarray(self.frame_id, jnp.int32), self.points.xyz,
        )
        self.kfs = new_kfs
        self.points = self.points._replace(n_obs=new_n_obs)
        self._n_kf_inserted += 1

        neighbors = self._covis_order(slot)[:3]
        for nb in neighbors:
            self._triangulate_pair(slot, nb)
        for nb in neighbors[:2]:
            self._fuse_pair(slot, nb)
        self._cull_points()
        self._local_ba()
        self._cull_keyframe(slot)
        closed, kfs2, pts2, cand = loop_closing.close_loop(
            self.kfs, self.points, slot, self.K, c
        )
        if closed:
            self.kfs, self.points = kfs2, pts2
            # CorrectLoop completion (LoopClosing.cc:496-741): fuse
            # loop-side duplicates under the corrected poses + global BA
            self.kfs, self.points, _ = loop_closing.fuse_and_global_ba(
                self.kfs, self.points, slot, cand, self.K, self.sig2, c
            )
            self.pose = self.kfs.pose[slot]
            self.velocity = jnp.eye(4)
            self.loops_closed += 1

    def _triangulate_pair(self, s1: int, s2: int):
        """CreateNewMapPoints for one keyframe pair."""
        c = self.cfg
        kfs = self.kfs
        F12 = tri.fundamental_from_poses(kfs.pose[s1], kfs.pose[s2], self.K)
        m = tri.search_for_triangulation(
            kfs.xy[s1], kfs.desc[s1], kfs.kp_valid[s1], kfs.angle[s1],
            kfs.point_id[s1],
            kfs.xy[s2], kfs.desc[s2], kfs.kp_valid[s2], kfs.angle[s2],
            kfs.point_id[s2],
            kfs.level[s2], F12, self.sig2,
        )
        t = tri.triangulate_matches(
            kfs.pose[s1], kfs.pose[s2], self.K,
            kfs.xy[s1], kfs.level[s1], kfs.xy[s2], kfs.level[s2],
            m.idx2, self.sig2, c.orb.scale_factor,
        )
        ok = np.asarray(t.ok)
        if not ok.any():
            return
        # allocate point slots on host (small, occasional)
        pvalid = np.asarray(self.points.valid).copy()
        free = np.nonzero(~pvalid)[0]
        kp1 = np.nonzero(ok)[0][: len(free)]
        if len(kp1) == 0:
            return
        dst = free[: len(kp1)]
        kp2 = np.asarray(m.idx2)[kp1]
        xyz = np.asarray(self.points.xyz).copy()
        desc = np.asarray(self.points.desc).copy()
        ang = np.asarray(self.points.angle).copy()
        refk = np.asarray(self.points.ref_kf).copy()
        refp = np.asarray(self.points.ref_kp).copy()
        nobs = np.asarray(self.points.n_obs).copy()
        xyz[dst] = np.asarray(t.xyz)[kp1]
        d1 = np.asarray(self.kfs.desc[s1])
        a1 = np.asarray(self.kfs.angle[s1])
        desc[dst] = d1[kp1]
        ang[dst] = a1[kp1]
        refk[dst] = s1
        refp[dst] = kp1
        nobs[dst] = 2
        pvalid[dst] = True
        self.points = self.points._replace(
            xyz=jnp.asarray(xyz), desc=jnp.asarray(desc),
            angle=jnp.asarray(ang), ref_kf=jnp.asarray(refk),
            ref_kp=jnp.asarray(refp), valid=jnp.asarray(pvalid),
            n_obs=jnp.asarray(nobs),
        )
        pid = np.asarray(self.kfs.point_id).copy()
        pid[s1, kp1] = dst
        pid[s2, kp2] = dst
        self.kfs = self.kfs._replace(point_id=jnp.asarray(pid))
        self._born_kf[dst] = self._n_kf_inserted
        self._visible[dst] = 2
        self._found[dst] = 2

    def _fuse_pair(self, s_src: int, s_tgt: int):
        """Project map points into s_tgt and merge duplicates
        (ORBmatcher::Fuse + MapPoint::Replace) — shared with the
        loop-closing SearchAndFuse pass."""
        self.kfs, self.points, _ = loop_closing.fuse_points_into(
            self.kfs, self.points, s_tgt, self.K, self.sig2, self.cfg
        )

    def _cull_points(self):
        """Found-ratio MapPoint culling (LocalMapping.cc:173-199): recent
        points that are rarely re-found or under-observed are removed."""
        pvalid = np.asarray(self.points.valid).copy()
        nobs = np.asarray(self.points.n_obs)
        age = self._n_kf_inserted - self._born_kf
        ratio = self._found / np.maximum(self._visible, 1)
        bad = pvalid & (self._born_kf >= 0) & (
            (ratio < 0.25)
            | ((age >= 2) & (age <= 3) & (nobs < 3))
        ) & (age <= 3)
        if bad.any():
            pvalid[bad] = False
            pid = np.asarray(self.kfs.point_id).copy()
            pid[np.isin(pid, np.nonzero(bad)[0])] = -1
            self.kfs = self.kfs._replace(point_id=jnp.asarray(pid))
            self.points = self.points._replace(valid=jnp.asarray(pvalid))

    def _cull_keyframe(self, current: int):
        """Redundancy-based KeyFrame culling (LocalMapping.cc:645-725)."""
        ratios = culling.redundancy_ratios(
            self.kfs.point_id, self.kfs.level, self.kfs.kp_valid,
            self.kfs.valid, self.points.valid,
        )
        protect = np.zeros(self.kfs.capacity, bool)
        protect[[0, 1, current]] = True
        pick = int(culling.pick_cull(ratios, jnp.asarray(protect)))
        if pick >= 0:
            self.kfs = self.kfs._replace(
                valid=self.kfs.valid.at[pick].set(False)
            )

    def _local_ba(self, fix_first: bool = False):
        """LocalBundleAdjustment over all stored keyframes (at this
        capacity the 'local window' is the whole map; Optimizer.cc:447-771
        schedule: 5 iters, chi2 gate, 10 iters, prune)."""
        kfs = self.kfs
        lv = jnp.clip(kfs.level, 0, self.sig2.shape[0] - 1)
        inv_sigma2 = 1.0 / self.sig2[lv]
        # the first keyframe fixes the gauge (g2o setFixed on KF0,
        # Optimizer.cc:447-771); `fix_first` is implied at this capacity
        del fix_first
        cam_free = kfs.valid & (jnp.arange(kfs.capacity) != 0)
        problem = ba.BAProblem(
            poses=kfs.pose,
            xyz=self.points.xyz,
            pid=kfs.point_id,
            uv=kfs.xy,
            inv_sigma2=inv_sigma2,
            obs_mask=kfs.kp_valid & kfs.valid[:, None],
            cam_free=cam_free,
            point_free=self.points.valid,
        )
        res = ba.ba_solve(problem, self.K)
        self.kfs = kfs._replace(pose=res.poses)
        self.points = self.points._replace(xyz=res.xyz)
        # prune observations that failed the chi2 gate (erase outlier
        # observations, Optimizer.cc:720-760)
        keep = np.asarray(res.inlier)
        pid = np.asarray(kfs.point_id).copy()
        had = pid >= 0
        pid[had & ~keep] = -1
        self.kfs = self.kfs._replace(point_id=jnp.asarray(pid))

    # ------------------------------------------------------------- outputs

    def write_trajectory(self, path: str):
        with open(path, "w") as f:
            for ts, T in self.trajectory:
                f.write(
                    f"{ts:.6f} "
                    + " ".join(f"{x:.8f}" for x in T.reshape(-1))
                    + "\n"
                )
