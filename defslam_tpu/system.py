"""defslam_tpu.System — the public API and host-side orchestrator.

Equivalent of the reference's ``defSLAM::System`` (``Modules/Common/System.cc``)
plus the state machines of ``DefTracking`` (``Modules/Tracking/DefTracking.cc``)
and ``DefLocalMapping`` (``Modules/Mapping/DefLocalMapping.cc``).  The host
holds the SoA stores, decides *what* to compute (keyframe cadence, covisible
pairs, template regeneration), and calls the jitted kernels that do all the
math on device.  This mirrors the reference's sequential mode
(``#undef PARALLEL``, System.cc:324-327): tracking and mapping run in one
thread; JAX's async dispatch overlaps device work with host bookkeeping.

Per-frame flow (reference call stack SURVEY 3.2):
  extract -> [init: plane template, DefTracking.cc:583-664]
          -> project-match (SearchByProjection) -> SfT solve
          -> inlier bookkeeping -> KF every `keyframe_period` frames
          -> mapping step (warps -> normals -> SfN -> Sim3 -> re-template)
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.frontend import Features, extract_features
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.mapping import mapper
from defslam_tpu.mapstore import state as store
from defslam_tpu.template import mesh as meshmod
from defslam_tpu.tracking import tracker


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclass
class FrameResult:
    pose: np.ndarray
    state: TrackingState
    n_matches: int
    n_inliers: int
    is_keyframe: bool
    template_updated: bool


class System:
    """Monocular deformable SLAM.

    Reference API parity (System.h:62-202): TrackMonocular, Reset, Restart,
    Shutdown, ActivateLocalizationMode / DeactivateLocalizationMode,
    GetTrackingState; the GT variants live in defslam_tpu.groundtruth.
    """

    def __init__(self, cfg: Config | str | None = None):
        if isinstance(cfg, str):
            cfg = Config.from_yaml(cfg)
        self.cfg = cfg or Config()
        c = self.cfg
        self.K = jnp.asarray(c.camera.K)
        self.dom = cam.retina_domain(self.K, c.camera.width, c.camera.height)
        self.topo = meshmod.grid_topology(c.mesh.nodes_u, c.mesh.nodes_v)
        self.bend_warp = mapper.bending_for(
            np.asarray(self.dom), c.mapping.warp_ctrl_u, c.mapping.warp_ctrl_v
        )
        self.bend_sfn = mapper.bending_for(
            np.asarray(self.dom), c.mapping.sfn_ctrl_u, c.mapping.sfn_ctrl_v
        )
        self._localization_only = False
        self._metrics: list[dict] = []
        # multi-chip execution (Config.parallel): the frame SfT solve runs
        # observation-sharded with psum'd normal equations; the mapping step
        # shards warp fits over pairs and normal solves over points
        # (SURVEY 5.7-5.8; no reference equivalent — its only parallelism is
        # 3 CPU threads, System.cc:140-169)
        if c.parallel.enabled:
            from defslam_tpu.parallel import init_distributed, sharded

            init_distributed(c)
            self.mesh = sharded.make_mesh(c.parallel.n_devices or None)
        else:
            self.mesh = None
        self._pending: list = []  # in-flight pipelined frames (see _track)
        self.reset()

    # ----------------------------------------------------------- lifecycle

    def reset(self):
        """Full map reset (System::Reset -> Tracking/DefLocalMapping reset).
        Any in-flight pipelined frame is dropped (the map it tracked against
        is being destroyed)."""
        self._pending = []
        self._pending_map = None
        self.kf_counter = 0
        self.kfs = store.empty_keyframes(self.cfg)
        self.points = store.empty_points(self.cfg)
        self.template: meshmod.Template | None = None
        self.template_ref_kf = -1
        self.pose = jnp.eye(4)
        # previous validated frame's pose — the constant-velocity motion
        # model state (mVelocity, Tracking.cc:1018+); prev_pose == pose
        # means "no velocity" (reset after init/LOST/relocalize/keyframe)
        self.prev_pose = self.pose
        self.state = TrackingState.NO_IMAGES_YET
        self.frame_id = -1
        self.frames_since_kf = 0
        self.kf_counter = 0  # keyframes created so far (mnId analogue,
        #   the age reference for found-ratio culling of recent points)
        self._lost_count = 0
        self.trajectory: list[tuple[float, np.ndarray]] = []
        # per-keyframe template snapshots (frame_id, nodes) for the
        # DefMapDrawer mesh-history view (viewer.export_template_history);
        # device arrays, materialized only at export
        self.template_history: list[tuple[int, object]] = []

    def apply_tuning(self, overrides: dict) -> None:
        """Live parameter overrides — the DefViewer regularizer sliders
        (DefViewer.cc:53-120) re-expressed for a headless host.  Keys are
        reference YAML names ('Regularizer.laplacian') or dotted config
        paths ('sft.lm_iterations'); values are coerced to the field type.

        The pipeline is flushed and the new Config becomes the kernels'
        static argument: the next frame pays one recompile per changed
        kernel (cached thereafter) — the cost of keeping every weight
        compile-time constant on the hot path."""
        import dataclasses as _dc

        from defslam_tpu import config as cfgmod

        self.flush()
        cfg = self.cfg
        for key, value in overrides.items():
            cfg = cfgmod.replace_path(
                cfg, cfgmod.reference_key_path(key), value
            )
        self.cfg = cfg
        # re-derive config-dependent constants (camera / spline grids)
        self.K = jnp.asarray(cfg.camera.K)
        self.dom = cam.retina_domain(
            self.K, cfg.camera.width, cfg.camera.height
        )
        self.topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
        self.bend_warp = mapper.bending_for(
            np.asarray(self.dom), cfg.mapping.warp_ctrl_u,
            cfg.mapping.warp_ctrl_v,
        )
        self.bend_sfn = mapper.bending_for(
            np.asarray(self.dom), cfg.mapping.sfn_ctrl_u,
            cfg.mapping.sfn_ctrl_v,
        )

    def restart(self):
        """System::Restart (System.cc:254-266): put the template back to its
        rest shape, keep the map."""
        self.flush()
        if self.template is not None:
            self.template = self.template._replace(nodes=self.template.nodes_rest)
            self.points = tracker.reposition_points(
                self.points, self.template.nodes, self.cfg
            )

    def shutdown(self):
        """No threads to join in the sequential design; flush the frame
        pipeline."""
        self.flush()
        return None

    def activate_localization_mode(self):
        self._localization_only = True

    def deactivate_localization_mode(self):
        self._localization_only = False

    def get_tracking_state(self) -> TrackingState:
        return self.state

    # ------------------------------------------------------------ tracking

    def track_monocular(self, img, timestamp: float = 0.0) -> np.ndarray | None:
        """Process one grayscale frame; returns the world->camera pose (4x4)
        or None while not initialized/lost (System::TrackMonocular).

        Contract under ``tracking.pipelined`` (the default): the returned
        pose is the frame's un-validated SfT solution as a DEVICE array
        (materializes on use); validation is deferred one frame — if the
        frame later fails its match/inlier gates, the system rolls back and
        re-tracks, and the corrected outcome lands in the metrics/trajectory
        (not in this return value).  Callers needing synchronous validated
        poses set ``tracking.pipelined=False`` or call :meth:`flush` first.
        """
        self.frame_id += 1
        img = jnp.asarray(img)
        if img.ndim == 3:
            img = jnp.mean(img.astype(jnp.float32), axis=-1)
        reinit = self.state in (
            TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED,
        )
        if self.state == TrackingState.LOST:
            # keep trying to relocalize against the existing map for
            # `lost_patience` frames; only then give up and re-initialize
            # (the reference's DefSLAM mode resets immediately,
            # DefTracking.cc:194-207; ORBSLAM mode relocalizes forever)
            if (
                self.template is None
                or self._lost_count >= self.cfg.tracking.lost_patience
            ):
                reinit = True
        if reinit:
            self.flush()
            feats = extract_features(img, self.cfg)
            ok = self._initialize(feats, timestamp)
            self.state = TrackingState.OK if ok else TrackingState.NOT_INITIALIZED
            self._record(timestamp, 0, 0, ok, ok)
            return np.asarray(self.pose) if ok else None
        result = self._track(img, timestamp)
        if result.state == TrackingState.OK:
            self._lost_count = 0
            return result.pose
        self._lost_count += 1
        return None

    def track_monocular_gt(
        self, img_left, img_right, timestamp: float = 0.0, baseline: float = 0.1
    ):
        """Track on the left image and evaluate against stereo-NCC ground
        truth (System::TrackMonocularGT, System.cc:268-341)."""
        pose = self.track_monocular(img_left, timestamp)
        if pose is not None and self.cfg.save_results:
            self.flush()  # GT evaluation wants the VALIDATED frame state
            self._gt_evaluator().evaluate_stereo(
                self, img_left, img_right, baseline, timestamp
            )
        return pose

    def track_monocular_ct(self, img, depth_map, timestamp: float = 0.0):
        """Track and evaluate against a per-frame GT depth map
        (System::TrackMonocularCTGT, System.cc:343-416)."""
        pose = self.track_monocular(img, timestamp)
        if pose is not None and self.cfg.save_results:
            self.flush()  # GT evaluation wants the VALIDATED frame state
            self._gt_evaluator().evaluate_depth(self, np.asarray(depth_map), timestamp)
        return pose

    def _gt_evaluator(self):
        if not hasattr(self, "_gt_eval") or self._gt_eval is None:
            from defslam_tpu.groundtruth.gt import GroundTruthEvaluator

            self._gt_eval = GroundTruthEvaluator(self.cfg)
        return self._gt_eval

    # ------------------------------------------------------ initialization

    def _initialize(self, feats: Features, timestamp: float) -> bool:
        """Plane-at-z=1 monocular initialization (DefTracking.cc:583-664):
        every keypoint becomes a map point on the plane z=1 through its
        retina ray; the template is the plane mesh over the retina domain."""
        n_valid = int(jnp.sum(feats.valid))
        if n_valid < self.cfg.tracking.min_inliers_ok * 2:
            return False
        c = self.cfg
        retina = cam.to_retina(self.K, feats.xy)
        nodes = meshmod.grid_nodes_from_surface(
            lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1),
            self.dom,
            self.topo,
        )
        self.template = meshmod.make_template(nodes, self.topo)
        self.template_ref_kf = 0

        facet, bary, inside = meshmod.embed_uv(retina, self.dom, self.topo)
        usable = np.asarray(feats.valid & inside)
        k = feats.capacity
        p_cap = c.capacity.max_map_points
        idx_kp = np.nonzero(usable)[0][: min(k, p_cap)]
        n = len(idx_kp)
        if n < c.tracking.min_inliers_ok:
            return False

        xyz = np.zeros((p_cap, 3), np.float32)
        r = np.asarray(retina)
        xyz[:n] = np.concatenate([r[idx_kp], np.ones((n, 1), np.float32)], axis=1)
        pts = store.empty_points(c)
        point_valid = np.zeros(p_cap, bool)
        point_valid[:n] = True
        pid_of_kp = np.full(k, -1, np.int32)
        pid_of_kp[idx_kp] = np.arange(n)
        self.points = pts._replace(
            xyz=jnp.asarray(xyz),
            desc=jnp.asarray(np.asarray(feats.desc)[idx_kp.tolist() + [0] * (p_cap - n)]),
            angle=jnp.asarray(
                np.asarray(feats.angle)[idx_kp.tolist() + [0] * (p_cap - n)]
            ),
            facet=jnp.asarray(
                np.concatenate([np.asarray(facet)[idx_kp], -np.ones(p_cap - n, np.int32)])
            ),
            bary=jnp.asarray(
                np.concatenate([np.asarray(bary)[idx_kp], np.zeros((p_cap - n, 3), np.float32)])
            ),
            ref_kf=jnp.asarray(np.where(point_valid, 0, -1).astype(np.int32)),
            ref_kp=jnp.asarray(
                np.concatenate([idx_kp, -np.ones(p_cap - n)]).astype(np.int32)
            ),
            valid=jnp.asarray(point_valid),
            n_obs=jnp.asarray(point_valid.astype(np.int32)),
            # Found/Visible start at 1/1 (MapPoint ctor: mnVisible=1,
            # mnFound=1); first_kf = the initial keyframe (counter 0)
            n_visible=jnp.asarray(point_valid.astype(np.int32)),
            n_found=jnp.asarray(point_valid.astype(np.int32)),
            first_kf=jnp.zeros(p_cap, jnp.int32),
        )
        self.pose = jnp.eye(4)
        self.prev_pose = self.pose
        self.kfs = store.add_keyframe(
            store.empty_keyframes(c), 0, self.pose, feats, retina,
            jnp.asarray(pid_of_kp), self.frame_id,
        )
        self.kf_counter = 1
        self.frames_since_kf = 0
        self.trajectory.append((timestamp, np.asarray(self.pose)))
        return True

    # ------------------------------------------------------------ tracking

    def _track_frame(self, img, window_scale: float = 1.0):
        """One frame dispatch: fused single-chip kernel, or the
        mesh-sharded path when Config.parallel.enabled."""
        if self.mesh is None:
            return tracker.track_frame(
                img, self.points, self.pose, self.prev_pose, self.template,
                self.K, self.cfg, window_scale=window_scale,
            )
        return tracker.track_frame_parallel(
            self.mesh, img, self.points, self.pose, self.prev_pose,
            self.template, self.K, self.cfg, window_scale=window_scale,
        )

    def _track(self, feats_or_img, timestamp: float) -> FrameResult:
        """Per-frame tracking with a depth-D frame pipeline
        (``tracking.pipeline_depth``): this frame is dispatched FIRST, then
        the OLDEST in-flight frame's stats readback (one host<->device
        round trip) overlaps up to D frames of device compute — the
        reference's PARALLEL-mode overlap (System.cc:140-142) re-expressed
        for async dispatch.  KEYFRAME frames are pipelined too: the fused
        keyframe_step is dispatched on the frame's unvalidated outputs
        (store-level state is snapshotted first, because the step donates
        the store buffers), so the ~tens-of-ms mapping chain never makes
        the host drain the queue — the round-3 p99 spike was exactly this
        drain.  Tracking failures are detected up to D frames late, rolled
        back from the state backups (including undoing an optimistic
        keyframe insertion), and the failed frame plus every newer
        in-flight frame are reprocessed through the exact synchronous retry
        ladder, in frame order."""
        c = self.cfg
        will_kf = (
            not self._localization_only
            and self.frames_since_kf + 1 >= c.tracking.keyframe_period
        )
        pipelined = (
            c.tracking.pipelined
            and self.state == TrackingState.OK
            # the legacy multi-chip mapping path orchestrates on host and
            # keeps the synchronous keyframe protocol.  (The GT harness
            # paths flush() explicitly before evaluating, so save_results
            # alone no longer forces synchronous keyframes — the CLI apps
            # get the same optimistic-keyframe overlap as the bench.)
            and not (will_kf and self.mesh is not None)
        )
        from defslam_tpu import profiling

        with profiling.stage("frame.dispatch"):
            out = self._track_frame(feats_or_img)
        depth = max(1, c.tracking.pipeline_depth)
        target = depth - 1 if pipelined else 0
        with profiling.stage("frame.finalize"):
            while len(self._pending) > target:
                if not self._finalize_pending():
                    # an in-flight frame failed: state was rolled back and
                    # the whole queue recovered synchronously; this frame's
                    # dispatch used stale state — redo it
                    out = self._track_frame(feats_or_img)
        # deferred keyframe mapping decision (scalars only) — overlapped
        # with this frame's already-dispatched device compute; non-forcing:
        # while the mapping chain is still executing on device the host
        # keeps streaming frames instead of blocking on the diag readback
        self._finalize_pending_map(force=False)
        if not pipelined:
            result = self._validate_and_commit(feats_or_img, out, timestamp)
            self._dispatch_pending_kf_b()
            return result
        feats, matches, res, new_points, stats = out
        backup = (self.pose, self.prev_pose, self.template, self.points,
                  self.frames_since_kf)
        self.prev_pose = self.pose
        self.pose = res.T
        self.template = self.template._replace(nodes=res.nodes)
        self.points = new_points
        kf_backup = None
        tmpl_flag = False
        if will_kf:
            # optimistic keyframe insertion: snapshot the store-level state
            # (COPIES — keyframe_step donates the kfs/points buffers, so a
            # bare reference would die with the donation), consume the
            # previous keyframe's diag, then dispatch the mapping chain
            # async.  A later validation failure restores this snapshot.
            self._finalize_pending_map()
            kf_backup = (
                jax.tree.map(jnp.copy, self.kfs),
                self.kf_counter,
                self.template_ref_kf,
                len(self.template_history),
            )
            # the return value matters when the GT harness forces the diag
            # readback inside _insert_keyframe (save_results): the pending
            # map is then already consumed, so no later backfill will set
            # this row's template flag
            tmpl_flag = self._insert_keyframe(feats, matches, res)
            # keyframe steps may re-register/re-anchor the pose (gauge
            # jump) — reset the motion model like the synchronous path
            self.prev_pose = self.pose
            self.frames_since_kf = 0
        else:
            self.frames_since_kf += 1
            # second half of a split keyframe chain rides BEHIND this
            # frame's compute on the device stream; the pre-B state it
            # returns is exactly what this frame's compute consumed, so it
            # doubles as this frame's store-level rollback snapshot
            b_backup = self._dispatch_pending_kf_b()
            if b_backup is not None:
                kf_backup = b_backup
        # record the frame's metrics row NOW (frame order preserved) with
        # placeholder counts; the deferred readback backfills the true
        # values in place (Matches.txt rows end up frame-ordered, -1-free)
        self._record(timestamp, -1, -1, will_kf, tmpl_flag)
        # start the device->host transfer of the deferred-validation scalars
        # NOW so the later device_get is a local read instead of a full
        # round trip (the tunnel RTT is a large fraction of the frame budget)
        for a in (stats, res.T):
            a.copy_to_host_async()
        self._pending.append((feats_or_img, out, timestamp, backup,
                              len(self._metrics) - 1, kf_backup))
        # optimistic result: pose is the (device) SfT output, match counts
        # are unknown until the deferred readback (-1 sentinels); the true
        # counts land in the metrics at finalization
        return FrameResult(res.T, TrackingState.OK, -1, -1, False, False)

    def flush(self):
        """Finalize all in-flight pipelined frames and any pending keyframe
        mapping decision (blocking).  In-flight frames are validated BEFORE
        a still-undispatched chain half B: their compute consumed the pre-B
        state, and a rollback must not have to undo B."""
        while getattr(self, "_pending", None):
            self._finalize_pending()
        self._dispatch_pending_kf_b()
        self._finalize_pending_map()

    def _finalize_pending(self) -> bool:
        """Deferred validation of the OLDEST in-flight frame.  Returns
        False when that frame failed tracking — state has then been rolled
        back and the failed frame plus every newer in-flight frame were
        reprocessed through the synchronous retry/relocalize ladder (the
        queue is empty afterwards)."""
        img, out, timestamp, backup, row, kf_backup = self._pending.pop(0)
        c = self.cfg
        feats, matches, res, new_points, stats = out
        stats_h, pose_h = jax.device_get((stats, res.T))
        n_matches, n_inliers = int(stats_h[0]), int(stats_h[1])
        if (
            n_matches >= c.tracking.min_inliers_ok
            and n_inliers >= c.tracking.min_inliers_ok
        ):
            self.trajectory.append((timestamp, pose_h))
            self._metrics[row].update(
                matches=n_matches, inliers=n_inliers,
                n_local=int(stats_h[2]), match_dropped=int(stats_h[3]),
            )
            self._maybe_draw_frame(img, feats, matches)
            return True
        # rollback the optimistic commits and reprocess synchronously, in
        # frame order: the failed frame re-uses its dispatched `out` (it
        # was computed from exactly the backup state, so the ladder sees
        # the same inputs the synchronous path would have); newer in-flight
        # frames were computed from now-invalid state and re-dispatch.
        # Each frame's optimistic metrics row is replaced in place.
        rest = self._pending
        self._pending = []
        (self.pose, self.prev_pose, self.template, self.points,
         self.frames_since_kf) = backup
        # undo any optimistic keyframe insertion among the failed + newer
        # frames: store mutations happen only at keyframe entries and in
        # order, so the OLDEST keyframe snapshot is the pre-mutation state
        for kb in [kf_backup] + [e[5] for e in rest]:
            if kb is not None:
                kfs_snap, kf_counter, tmpl_ref, n_hist = kb
                self.kfs = kfs_snap
                self.kf_counter = kf_counter
                self.template_ref_kf = tmpl_ref
                del self.template_history[n_hist:]
                # the in-flight mapping diag / undispatched chain half
                # belong to the undone step
                self._pending_map = None
                self._pending_kf_b = None
                break
        replay = [(img, out, timestamp, row)] + [
            (im, None, ts, rw) for im, _out, ts, _bk, rw, _kb in rest
        ]
        for im, out_i, ts, rw in replay:
            if out_i is None:
                out_i = self._track_frame(im)
            n_rows = len(self._metrics)
            self._validate_and_commit(im, out_i, ts)
            if len(self._metrics) > n_rows:
                self._metrics[rw] = self._metrics.pop()
        return False

    def _validate_and_commit(self, feats_or_img, out, timestamp: float) -> FrameResult:
        c = self.cfg
        feats, matches, res, new_points, stats = out
        # single host readback per frame: stats + pose together
        stats_h, pose_h = jax.device_get((stats, res.T))
        n_matches, n_inliers = int(stats_h[0]), int(stats_h[1])
        if n_matches < c.tracking.min_inliers_ok:
            # wider search window once (TrackWithMotionModel retry, then LOST)
            feats, matches, res, new_points, stats = self._track_frame(
                feats_or_img, window_scale=2.0
            )
            stats_h, pose_h = jax.device_get((stats, res.T))
            n_matches, n_inliers = int(stats_h[0]), int(stats_h[1])
        if (
            n_matches < c.tracking.min_inliers_ok
            or n_inliers < c.tracking.min_inliers_ok
        ):
            # relocalization attempt against the stored keyframes before
            # declaring LOST (the reference's DefSLAM mode goes straight to
            # reset, DefTracking.cc:194-207; we first try the recovery path
            # its ORBSLAM mode uses)
            from defslam_tpu.tracking import pose_opt

            feats_now = extract_features(feats_or_img, c) if not isinstance(
                feats_or_img, Features
            ) else feats_or_img
            ok_r, T_r, _ = pose_opt.relocalize(
                feats_now, self.kfs, self.points, self.K, c
            )
            if bool(ok_r):
                self.pose = T_r
                self.prev_pose = T_r  # velocity reset after relocalization
                feats, matches, res, new_points, stats = self._track_frame(
                    feats_or_img
                )
                stats_h, pose_h = jax.device_get((stats, res.T))
                n_matches, n_inliers = int(stats_h[0]), int(stats_h[1])
            if n_inliers < c.tracking.min_inliers_ok:
                self.state = TrackingState.LOST
                self.prev_pose = self.pose  # drop velocity when lost
                self._record(timestamp, n_matches, n_inliers, False, False)
                return FrameResult(np.asarray(self.pose), self.state,
                                   n_matches, n_inliers, False, False)

        self.prev_pose = self.pose
        self.pose = res.T
        self.template = self.template._replace(nodes=res.nodes)
        self.points = new_points
        self.trajectory.append((timestamp, pose_h))
        self.state = TrackingState.OK

        self.frames_since_kf += 1
        is_kf = (
            not self._localization_only
            and self.frames_since_kf >= c.tracking.keyframe_period
        )
        template_updated = False
        if is_kf:
            template_updated = self._insert_keyframe(feats, matches, res)
            self.frames_since_kf = 0
            if template_updated:
                # re-anchor camera + new mesh against the current frame with
                # the temporal term off (DefTracking.cc:115-117:
                # DefPoseOptimization(..., RegTemp=0) after updateTemplate)
                matches2 = tracker.match_points_to_frame(
                    self.points, self.pose, self.K, feats, c
                )
                if self.mesh is None:
                    res2 = tracker.sft_track(
                        self.points, matches2, feats, self.template,
                        self.pose, self.K, c, reg_temp=0.0,
                    )
                else:
                    res2 = tracker.sft_track_sharded(
                        self.mesh, self.points, matches2, feats,
                        self.template, self.pose, self.K, c, reg_temp=0.0,
                    )
                self.pose = res2.T
                self.template = self.template._replace(nodes=res2.nodes)
                self.points = tracker.reposition_points(
                    self.points, res2.nodes, c
                )
        if is_kf:
            # the keyframe step may re-register (Sim3 rescale) or re-anchor
            # the pose: a velocity spanning that gauge jump would extrapolate
            # garbage — drop it for one frame
            self.prev_pose = self.pose
        self._record(timestamp, n_matches, n_inliers, is_kf, template_updated,
                     n_local=int(stats_h[2]), n_dropped=int(stats_h[3]))
        self._maybe_draw_frame(feats_or_img, feats, matches)
        return FrameResult(pose_h, self.state, n_matches,
                           n_inliers, is_kf, template_updated)

    def _maybe_draw_frame(self, feats_or_img, feats, matches):
        """DefFrameDrawer parity: annotated PNG per tracked frame when
        viewer.save_frames is on (debug mode — forces a host sync)."""
        if not self.cfg.viewer.save_frames:
            return
        if isinstance(feats_or_img, Features):
            return
        from defslam_tpu.viewer import frame_drawer

        frame_drawer.save_annotated(
            self, np.asarray(feats_or_img), feats, matches, self.frame_id
        )

    # ------------------------------------------------------------- mapping

    def _free_kf_slot(self) -> int:
        valid = np.asarray(self.kfs.valid)
        free = np.nonzero(~valid)[0]
        if len(free):
            return int(free[0])
        # recycle the oldest non-template keyframe
        fid = np.asarray(self.kfs.frame_id).copy()
        fid[self.template_ref_kf] = np.iinfo(np.int32).max
        return int(np.argmin(fid))

    def _insert_keyframe(self, feats: Features, matches, res) -> bool:
        """CreateNewKeyFrame + the mapping step.

        Single-chip path: ONE fused device dispatch (mapper.keyframe_step)
        whose decision scalars are read back a frame later — the host never
        blocks on the mapping chain (the reference's PARALLEL overlap,
        System.cc:140-142, re-expressed as async dispatch).  The multi-chip
        path keeps the step-by-step orchestration so the pair/point shards
        ride the device mesh (sharded_warp_fits / sharded_normal_solves).
        Returns the template-updated flag for the LEGACY path only; the
        fused path reports it through the deferred MappingDiag (metrics are
        backfilled at finalization)."""
        from defslam_tpu import profiling

        c = self.cfg
        if self.mesh is None:
            self._finalize_pending_map()
            self._dispatch_pending_kf_b()  # a period-1 cadence edge case
            use_split = (
                c.tracking.split_keyframe_dispatch
                and not (
                    c.save_results
                    and getattr(self, "_gt_eval", None) is not None
                )
            )
            if use_split:
                # half 1 now; half 2 rides behind the NEXT frame's compute
                # (dispatched from the next track call), so no single
                # device dispatch exceeds ~half the chain
                with profiling.stage("keyframe.dispatch_a"):
                    self.kfs, self.points, carry = mapper.keyframe_step_a(
                        self.kfs, self.points, self.pose, feats,
                        matches.kp_of_point, res.inlier, self.K, self.dom,
                        self.bend_warp,
                        jnp.asarray(self.template_ref_kf, jnp.int32),
                        jnp.asarray(self.frame_id, jnp.int32), c,
                    )
                # B must see the PRE-increment keyframe counter (the fused
                # path passes it before the += 1): the culling recency
                # window is keyed on it
                kfc = self.kf_counter
                self.kf_counter += 1
                self._pending_kf_b = (
                    carry, feats, len(self._metrics), kfc
                )
                return False
            with profiling.stage("keyframe.dispatch"):
                out = mapper.keyframe_step(
                    self.kfs, self.points, self.template, self.pose, feats,
                    matches.kp_of_point, res.inlier, self.K, self.dom,
                    self.bend_warp, self.bend_sfn,
                    jnp.asarray(self.template_ref_kf, jnp.int32),
                    jnp.asarray(self.kf_counter, jnp.int32),
                    jnp.asarray(self.frame_id, jnp.int32), c,
                )
            self.kfs, self.points, self.template, self.pose, diag = out
            self.kf_counter += 1
            for a in jax.tree.leaves(diag):
                a.copy_to_host_async()
            self._pending_map = (diag, len(self._metrics))
            self._record_template_history()
            if c.save_results and getattr(self, "_gt_eval", None) is not None:
                # the GT harness evaluates per-keyframe angle errors
                # synchronously whenever the NRSfM chain ran
                # (estimateAngleErrorAndScale inside NRSfM,
                # DefLocalMapping.cc:216-221 — called even when the Sim3
                # gate rejects the template swap)
                d = self._finalize_pending_map()
                ran_nrsfm = (
                    d is not None
                    and int(d.n_pairs) > 0
                    and int(d.n_norm) >= c.mapping.min_normals
                )
                if ran_nrsfm:
                    self._gt_eval.evaluate_keyframe_angles(self, int(d.kf_t))
                return bool(d.accepted) if d is not None else False
            return False
        updated = self._insert_keyframe_legacy(feats, matches, res)
        self._record_template_history()
        return updated

    def _record_template_history(self, cap: int = 256):
        """Keep the keyframe-time template state for the mesh-history view
        (DefMapDrawer::MeshDrawershist); device array, no readback here."""
        if self.template is not None:
            self.template_history.append((self.frame_id, self.template.nodes))
            if len(self.template_history) > cap:
                del self.template_history[0]

    def _dispatch_pending_kf_b(self):
        """Dispatch the second half of a split keyframe chain
        (tracking.split_keyframe_dispatch).  Called right after the next
        frame's state assignments, so on the device stream the order is
        [frame t][chain A][frame t+1][chain B][frame t+2] and no frame
        waits behind more than half the chain.

        Returns a rollback snapshot of the PRE-B state in the kf_backup
        format (keyframe_step_b does not donate, so no copies are needed):
        the interleaved frame's compute consumed exactly this state, and a
        later validation failure of that frame must restore it."""
        pending = getattr(self, "_pending_kf_b", None)
        if pending is None:
            return None
        self._pending_kf_b = None
        carry, feats, row, kfc = pending
        from defslam_tpu import profiling

        b_backup = (
            self.kfs, self.kf_counter, self.template_ref_kf,
            len(self.template_history),
        )
        with profiling.stage("keyframe.dispatch_b"):
            out = mapper.keyframe_step_b(
                self.kfs, self.points, self.template, self.pose, feats,
                carry, self.K, self.dom, self.bend_sfn,
                jnp.asarray(kfc, jnp.int32), self.cfg,
            )
        self.kfs, self.points, self.template, self.pose, diag, gauge = out
        # a re-template changes the world gauge; the LIVE pose was already
        # transformed by B (pose @ gauge).  Transform the motion model by
        # the same delta so the constant-velocity prediction survives the
        # swap instead of rewinding to the keyframe's viewpoint.
        self.prev_pose = self.prev_pose @ gauge
        for a in jax.tree.leaves(diag):
            a.copy_to_host_async()
        self._pending_map = (diag, row)
        self._record_template_history()
        return b_backup

    def _finalize_pending_map(self, force: bool = True):
        """Deferred readback of the last keyframe step's decision scalars;
        backfills the keyframe's metrics row (template flag + truncation
        counters) and the host-side template bookkeeping.  Returns the host
        MappingDiag, or None when nothing was pending.

        ``force=False`` (the per-frame poll): only finalize when the diag
        arrays are already computed AND transferred — no host consumer needs
        them before the next keyframe, so the host never blocks on the
        mapping chain mid-stream."""
        if getattr(self, "_pending_map", None) is None:
            return None
        diag, row = self._pending_map
        if not force and not all(
            a.is_ready() for a in jax.tree.leaves(diag)
        ):
            return None
        self._pending_map = None
        d = jax.device_get(diag)
        accepted = bool(d.accepted)
        if accepted:
            self.template_ref_kf = int(d.kf_t)
        if row < len(self._metrics):
            self._metrics[row].update(
                template=accepted,
                map_obs_dropped=int(d.obs_dropped),
                map_pair_dropped=int(d.pair_dropped),
                map_pt_dropped=int(d.pt_dropped),
                points_culled=int(d.n_culled),
                reg_scale=float(d.reg_scale),
            )
        return d

    def _insert_keyframe_legacy(self, feats: Features, matches, res) -> bool:
        c = self.cfg
        slot = self._free_kf_slot()
        self.kf_counter += 1
        # invert point->kp matches into the KF's kp->point table and bump
        # observation counts — fixed shapes only (a variable-length index
        # scatter here recompiled on every keyframe)
        new_kfs, new_n_obs = store.insert_keyframe_from_matches(
            self.kfs, self.points.n_obs, jnp.asarray(slot, jnp.int32),
            self.pose, feats, matches.kp_of_point, res.inlier, self.K,
            jnp.asarray(self.frame_id, jnp.int32), self.points.xyz,
        )
        self.kfs = new_kfs
        self.points = self.points._replace(n_obs=new_n_obs)
        return self._mapping_step(slot)

    def _mapping_step(self, slot: int) -> bool:
        """Warps -> normals -> (maybe) SfN + registration + re-template.

        Device-resident end to end: covisible-pair selection, matched-pair
        tables, warp fits, densification, per-point observation tables and
        the normal solves are dispatched without any intermediate host
        readback — the single sync is the template decision at the end
        (round 1 looped ctypes intersections per keyframe and shipped the
        ~3 MB DiffProp tables host->device->host per keyframe)."""
        c = self.cfg
        slot_j = jnp.asarray(slot, jnp.int32)
        cp = mapper.covis_pairs(
            self.kfs.point_id, self.kfs.retina, self.kfs.valid,
            self.points.valid, slot_j, c,
        )

        # ---- batched warp fitting (new KF -> each covisible KF).
        # FIXED pair-axis size: the warp-fit graph (vmapped LM over 390
        # params) is the most expensive compile in the system — one static
        # shape means it compiles exactly once per process
        np_pairs = c.capacity.max_warp_pairs
        batch = mapper.WarpBatch(
            uv1=cp.uv1, uv2=cp.uv2, mask=cp.mask, pair_valid=cp.pair_valid
        )
        if self.mesh is None or np_pairs % self.mesh.devices.size != 0:
            dps, ctrls = mapper.fit_warps(batch, self.dom, self.bend_warp, c)
        else:
            from defslam_tpu.parallel import sharded

            dps, ctrls = sharded.sharded_warp_fits(
                self.mesh, batch, self.dom, self.bend_warp, c
            )
        self._densify(slot_j, cp, ctrls)

        # ---- per-point observation accumulation (device sort-scatter)
        p_cap = c.capacity.max_map_points
        obs, _obs_dropped = mapper.accumulate_obs_device(
            cp.pid_table, dps.mask, cp.uv1, dps.warped, dps.J12,
            dps.Huu, dps.Hvv, p_cap, mapper.OBS_CAP,
        )
        if self.mesh is None or p_cap % self.mesh.devices.size != 0:
            nres = mapper.solve_normals(
                obs, self.points.norm_k0,
                num_iters=c.mapping.normal_lm_iterations,
            )
        else:
            from defslam_tpu.parallel import sharded

            nres = sharded.sharded_normal_solves(
                self.mesh, obs, self.points.norm_k0,
                num_iters=c.mapping.normal_lm_iterations,
            )

        # write normals into the new keyframe at the matched keypoints, then
        # propagate them to the covisible keyframes through the warp
        # Jacobians (NormalEstimator.cc:173-224) so a later selectKeyframe
        # retemplate from a REFERENCE keyframe has normals to integrate
        pid_row = self.kfs.point_id[slot]
        # covNorm reliability gate (NormalEstimator.cc:159) + warm-start
        # bookkeeping, matching the fused keyframe_step
        solved_ok = mapper.normal_reliability_gate(
            nres, c.regularizer.reliability
        )
        self.points = self.points._replace(
            norm_k0=jnp.where(solved_ok[:, None], nres.k, self.points.norm_k0)
        )
        norm_k, norm_valid, n_normals_dev = mapper.write_normals(
            self.kfs.norm_k, self.kfs.norm_valid, slot_j, pid_row,
            nres.k, solved_ok,
        )
        norm_k, norm_valid = mapper.propagate_normals(
            norm_k, norm_valid, cp, dps, nres.k, solved_ok
        )
        self.kfs = self.kfs._replace(norm_k=norm_k, norm_valid=norm_valid)

        # ---- template decision: exploring -> re-template from the NEW
        # keyframe; otherwise from the most-voted reference keyframe — the
        # reference re-templates EVERY keyframe, only the source differs
        # (DefLocalMapping::NRSfM 186-196, needNewTemplate 355-404,
        # selectKeyframe 411-441)
        pid_row = self.kfs.point_id[slot]
        explore_dev = mapper.exploration_count(
            self.kfs.xy[slot], self.kfs.kp_valid[slot], pid_row, c
        )
        sel_dev = mapper.select_ref_keyframe(
            pid_row, self.points.ref_kf, self.points.valid,
            self.kfs.valid, slot_j,
        )
        # the ONE host sync of the mapping step (enoughNormals counts for
        # every keyframe come along so the non-exploring branch needs no
        # second readback)
        n_new, sel, n_pairs, n_norm_all = jax.device_get(
            (explore_dev, sel_dev, cp.n_pairs,
             jnp.sum(self.kfs.norm_valid, axis=1))
        )
        if int(n_pairs) == 0:
            return False
        exploring = int(n_new) > c.mapping.points_to_template
        kf_t = slot if exploring else int(sel)
        # enoughNormals gate (Surface.cc:62-67) on the template keyframe
        if int(n_norm_all[kf_t]) < c.mapping.min_normals:
            return False
        updated = self._retemplate(kf_t)
        # per-keyframe normal-angle GT evaluation inside the mapping step
        # (estimateAngleErrorAndScale called from NRSfM when saving results,
        # DefLocalMapping.cc:216-221) — after _retemplate so the SfN surface
        # control grid is available for the ErrorAngSfN file
        if c.save_results and getattr(self, "_gt_eval", None) is not None:
            self._gt_eval.evaluate_keyframe_angles(self, kf_t)
        return updated

    def _densify(self, slot_j, cp: "mapper.CovisPairs", ctrls):
        """Warp-guided match densification (DefORBmatcher::findbyWarp /
        searchBySchwarp): propagate map-point observations through the
        fitted warps into whichever side lacks them."""
        c = self.cfg
        best, dist = mapper.densify_matches(
            ctrls,
            self.kfs.retina[slot_j],
            self.kfs.kp_valid[slot_j],
            self.kfs.desc[slot_j],
            self.kfs.retina[cp.pair_kf],
            self.kfs.kp_valid[cp.pair_kf],
            self.kfs.desc[cp.pair_kf],
            self.dom,
            cp.pair_valid,
            c,
        )
        # mask matches from padded/invalid pairs before the fused merge
        best = jnp.where(cp.pair_valid[:, None], best, -1)
        new_point_id, new_n_obs = mapper.apply_densify(
            self.kfs.point_id, self.points.n_obs,
            slot_j, cp.pair_kf, best,
        )
        self.kfs = self.kfs._replace(point_id=new_point_id)
        self.points = self.points._replace(n_obs=new_n_obs)

    def _retemplate(self, slot: int) -> bool:
        """NRSfM surface for the KF + Sim3 registration + template swap
        (DefLocalMapping::NRSfM 172-234 and updateTemplate 138-153)."""
        c = self.cfg
        retina = self.kfs.retina[slot]
        # per-KF SfN domain (DefKeyFrame.cc:94-133) — mirror of the fused
        # device path in mapper.keyframe_step
        if c.mapping.per_kf_domain:
            dom_s = mapper.bbox_domain(
                retina, self.kfs.kp_valid[slot], self.dom,
                margin=c.mapping.kf_domain_margin,
            )
            from defslam_tpu.ops import bspline as _bsp

            bend_s = _bsp.bending_matrix_dyn(
                dom_s, c.mapping.sfn_ctrl_u, c.mapping.sfn_ctrl_v
            )
        else:
            dom_s, bend_s = self.dom, self.bend_sfn
        res_sfn = mapper.integrate_surface(
            retina, self.kfs.norm_k[slot], self.kfs.norm_valid[slot],
            dom_s, bend_s, c, ext_dom=self.dom,
        )
        # registration pairs: the point positions REGISTERED at keyframe
        # insertion (DefMapPoint::PosesKeyframes) gated by normal
        # reliability (covNorm, SurfaceRegistration.cc:69-77)
        pose = self.kfs.pose[slot]
        pid_row = self.kfs.point_id[slot]
        surf_xyz, map_xyz, mask, embedded = mapper.registration_pairs(
            res_sfn.xyz, pid_row,
            self.kfs.kp_xyz[slot], self.kfs.kp_xyz_valid[slot],
            self.kfs.norm_valid[slot],
            self.points.valid, self.points.facet, pose,
        )
        reg = mapper.register_surface(surf_xyz, map_xyz, mask, c)
        # one combined accept readback (SfN conditioning gate + the Sim3
        # chi gate, DefLocalMapping.cc:203 + SurfaceRegistration.cc:126-135)
        sfn_ok, accepted = (
            bool(x) for x in jax.device_get((res_sfn.ok, reg.accepted))
        )
        if not (sfn_ok and accepted):
            return False

        ctrl_p = mapper.polish_surface(
            res_sfn.ctrl, reg, retina, map_xyz, embedded, dom_s,
            bend_s, c, grid_dom=self.dom,
        )
        regen = mapper.regen_template(
            ctrl_p, reg, pose, retina, self.dom, c, spline_dom=dom_s
        )
        self.template = regen.template
        self.template_ref_kf = slot

        # CreateNewMapPoints as one fused device update
        new_points, pid_row_new = mapper.rebuild_points(
            self.points, regen, pose, self.K, pid_row,
            self.kfs.kp_valid[slot], self.kfs.desc[slot],
            self.kfs.angle[slot],
            jnp.asarray(slot, jnp.int32), self.dom, c,
            jnp.asarray(self.kf_counter, jnp.int32),
        )
        self.points = new_points
        self.kfs = self.kfs._replace(
            point_id=self.kfs.point_id.at[slot].set(pid_row_new),
            surf_ctrl=self.kfs.surf_ctrl.at[slot].set(ctrl_p),
            surf_valid=self.kfs.surf_valid.at[slot].set(True),
            surf_dom=self.kfs.surf_dom.at[slot].set(dom_s),
        )
        self.points, _n_culled = mapper.cull_points(
            self.points, self.kfs.point_id, self.kfs.valid,
            jnp.asarray(self.kf_counter, jnp.int32),
        )
        return True

    # -------------------------------------------------------- persistence

    def save_state(self, path: str):
        """Checkpoint the full SLAM state (map, keyframes, template, pose).

        The reference has no save/load at all (SURVEY 5.4); the SoA design
        makes it one npz file.
        """
        self.flush()
        arrays = {}
        for name, store_obj in (("kf", self.kfs), ("pt", self.points)):
            for field_name, arr in zip(store_obj._fields, store_obj):
                arrays[f"{name}_{field_name}"] = np.asarray(arr)
        if self.template is not None:
            for field_name, arr in zip(self.template._fields, self.template):
                arrays[f"tmpl_{field_name}"] = np.asarray(arr)
        arrays["pose"] = np.asarray(self.pose)
        arrays["prev_pose"] = np.asarray(self.prev_pose)
        arrays["meta"] = np.asarray(
            [self.frame_id, self.frames_since_kf, self.template_ref_kf,
             self.state.value, self.kf_counter, self._lost_count]
        )
        # run history: resume must continue the Matches/Trajectory/ErrorGTs
        # streams, not truncate them (SURVEY 5.4 "checkpointable state from
        # day one" includes the metric pipeline)
        import json as _json

        arrays["metrics_json"] = np.frombuffer(
            _json.dumps(self._metrics).encode(), np.uint8
        )
        if self.trajectory:
            arrays["traj_ts"] = np.asarray([t for t, _ in self.trajectory])
            arrays["traj_T"] = np.stack(
                [np.asarray(T) for _, T in self.trajectory]
            )
        if self.template_history:
            arrays["hist_fid"] = np.asarray(
                [f for f, _ in self.template_history], np.int64
            )
            arrays["hist_nodes"] = np.stack(
                [np.asarray(n) for _, n in self.template_history]
            )
        if getattr(self, "_gt_eval", None) is not None and self._gt_eval.rows:
            arrays["gt_rows"] = np.asarray(self._gt_eval.rows, np.float64)
        np.savez_compressed(path, **arrays)

    def load_state(self, path: str):
        """Restore a checkpoint written by save_state."""
        data = np.load(path)
        self.kfs = store.KeyframeStore(
            *[jnp.asarray(data[f"kf_{f}"]) for f in store.KeyframeStore._fields]
        )
        self.points = store.PointStore(
            *[jnp.asarray(data[f"pt_{f}"]) for f in store.PointStore._fields]
        )
        if "tmpl_nodes" in data:
            self.template = meshmod.Template(
                *[jnp.asarray(data[f"tmpl_{f}"]) for f in meshmod.Template._fields]
            )
        self.pose = jnp.asarray(data["pose"])
        self.prev_pose = (
            jnp.asarray(data["prev_pose"]) if "prev_pose" in data else self.pose
        )
        meta = data["meta"]
        self.frame_id = int(meta[0])
        self.frames_since_kf = int(meta[1])
        self.template_ref_kf = int(meta[2])
        self.state = TrackingState(int(meta[3]))
        self.kf_counter = int(meta[4]) if len(meta) > 4 else 1
        self._lost_count = int(meta[5]) if len(meta) > 5 else 0
        if "metrics_json" in data:
            import json as _json

            self._metrics = _json.loads(bytes(data["metrics_json"]).decode())
        if "traj_ts" in data:
            self.trajectory = [
                (float(t), T)
                for t, T in zip(data["traj_ts"], data["traj_T"])
            ]
        if "hist_fid" in data:
            self.template_history = [
                (int(f), jnp.asarray(n))
                for f, n in zip(data["hist_fid"], data["hist_nodes"])
            ]
        if "gt_rows" in data:
            # rows are (ts, rmse, n, scale); the float64 round-trip must not
            # turn the integer inlier count into a float (ErrorGTs.txt would
            # print "12.0" and break the reference column format)
            self._gt_evaluator().rows = [
                (float(t), float(r), int(n), float(s))
                for t, r, n, s in data["gt_rows"]
            ]

    # ------------------------------------------------------------- metrics

    def _record(self, timestamp, n_matches, n_inliers, is_kf, tmpl,
                n_local=0, n_dropped=0):
        self._metrics.append(
            dict(
                frame=self.frame_id, t=timestamp, matches=n_matches,
                inliers=n_inliers, keyframe=bool(is_kf),
                template=bool(tmpl), state=self.state.name,
                n_local=int(n_local), match_dropped=int(n_dropped),
            )
        )

    def write_metrics(self, outdir: str | None = None):
        """The reference's tracking text-stream set (Tracking.cc:150-167):

        - ``Matches.txt`` — our extended per-frame row (timestamp, matches,
          inliers, keyframe/template flags, state); the reference's columns
          (zero-padded timestamp, inliers, outliers, local-map point count,
          Tracking.cc:1277) are recoverable from it.
        - ``StatusTracking.txt`` — "timestamp 0|1" per frame (0 = tracked,
          1 = lost).  The reference DECLARES this stream but never opens it
          (Tracking.h:257 ``ofstream status`` has no .open call), so its
          writes at Tracking.cc:554-559 go nowhere; we emit the file.
        - ``MapPointUsage.txt`` — per-frame map-point usage (matched,
          inliers, frustum candidates, live map points).  The reference
          opens this file (Tracking.cc:167) but its only write is commented
          out (Tracking.cc:621); we emit the usage rows it was meant for.
        - ``Trajectory.txt`` plus the GT harness files (ErrorGTs etc.).
        """
        self.flush()
        outdir = outdir or self.cfg.output_dir
        os.makedirs(outdir, exist_ok=True)
        n_points_valid = int(np.asarray(jnp.sum(self.points.valid)))
        with open(os.path.join(outdir, "Matches.txt"), "w") as f:
            for m in self._metrics:
                f.write(
                    f"{m['t']:.6f} {m['matches']} {m['inliers']} "
                    f"{int(m['keyframe'])} {int(m['template'])} {m['state']}\n"
                )
        with open(os.path.join(outdir, "StatusTracking.txt"), "w") as f:
            for m in self._metrics:
                f.write(f"{m['t']:.6f} {int(m['state'] != 'OK')}\n")
        with open(os.path.join(outdir, "MapPointUsage.txt"), "w") as f:
            for m in self._metrics:
                f.write(
                    f"{m['t']:.6f} {m['matches']} {m['inliers']} "
                    f"{m.get('n_local', 0)} {n_points_valid}\n"
                )
        with open(os.path.join(outdir, "Trajectory.txt"), "w") as f:
            for ts, T in self.trajectory:
                f.write(
                    f"{ts:.6f} "
                    + " ".join(f"{x:.8f}" for x in np.asarray(T).reshape(-1))
                    + "\n"
                )
        if getattr(self, "_gt_eval", None) is not None:
            self._gt_eval.outdir = outdir
            self._gt_eval.write()
