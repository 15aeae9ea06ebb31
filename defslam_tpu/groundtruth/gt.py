"""Ground-truth evaluation harness.

Equivalent of ``Modules/GroundTruth/`` — the reference's *metric pipeline*
(SURVEY section 4): every tracked frame, compute the scaled 3D RMSE of the
inlier map points against stereo or depth-map ground truth
(``GroundTruthFrame::{Estimate3DScale, Estimate3DError}``,
GroundTruthFrame.cc:124-266) and, per keyframe, normal-angle errors
(``GroundTruthKeyFrame::estimateAngleErrorAndScale``).  Results are written
in the reference's text formats (ErrorGTs<ts>.txt) so downstream analysis
(Twiddle.py-style aggregation) works unchanged.

TPU re-design: the stereo NCC correspondence search — the reference's
per-point cv::matchTemplate loop over an epipolar band (CC_MAC.h windows,
GroundTruthCalculator.cc:203-274) — is one batched gather + windowed
correlation over all points and all disparities at once.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.utils import masked_median


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_depth_ncc(
    img_l: jnp.ndarray,  # (H, W) f32 rectified left
    img_r: jnp.ndarray,  # (H, W) f32 rectified right
    uv: jnp.ndarray,  # (N, 2) pixel positions in the left image
    mask: jnp.ndarray,  # (N,) bool
    baseline_fx: float,  # baseline * fx (depth = baseline*fx / disparity)
    cfg: Config,
):
    """Batched NCC stereo matching along the epipolar (same-row) band.

    Returns (depth (N,), ok (N,) bool).  Equivalent of the reference's
    estimateGT NCC search with CC_MAC.h windows; disparity search is to the
    left (standard rectified stereo), sub-pixel via parabola fit.
    """
    g = cfg.gt
    h, w = img_l.shape
    half = g.ncc_template // 2
    dmax = g.ncc_search

    cx = jnp.round(uv[:, 0]).astype(jnp.int32)
    cy = jnp.round(uv[:, 1]).astype(jnp.int32)
    dy, dx = jnp.mgrid[-half : half + 1, -half : half + 1]

    def patch(img, px, py):
        yy = jnp.clip(py[:, None, None] + dy[None], 0, h - 1)
        xx = jnp.clip(px[:, None, None] + dx[None], 0, w - 1)
        return img[yy, xx]  # (N, T, T)

    tmpl = patch(img_l, cx, cy)
    tmpl = tmpl - tmpl.mean(axis=(1, 2), keepdims=True)
    tnorm = jnp.sqrt(jnp.sum(tmpl * tmpl, axis=(1, 2)) + 1e-6)

    disps = jnp.arange(dmax)  # (D,)

    def ncc_at(d):
        p = patch(img_r, cx - d, cy)
        p = p - p.mean(axis=(1, 2), keepdims=True)
        pn = jnp.sqrt(jnp.sum(p * p, axis=(1, 2)) + 1e-6)
        return jnp.sum(p * tmpl, axis=(1, 2)) / (pn * tnorm)  # (N,)

    scores = jax.vmap(ncc_at)(disps).T  # (N, D)
    best = jnp.argmax(scores, axis=1)
    best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    # sub-pixel parabola around the peak
    bm1 = jnp.clip(best - 1, 0, dmax - 1)
    bp1 = jnp.clip(best + 1, 0, dmax - 1)
    sm1 = jnp.take_along_axis(scores, bm1[:, None], axis=1)[:, 0]
    sp1 = jnp.take_along_axis(scores, bp1[:, None], axis=1)[:, 0]
    denom = sm1 - 2.0 * best_score + sp1
    frac = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (sm1 - sp1) / denom, 0.0)
    disp = best.astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5)
    ok = (
        mask
        & (best_score > g.ncc_threshold)
        & (disp > 0.5)
        & (best > 0)
        & (best < dmax - 1)
        & (cx - dmax >= 0)
    )
    depth = baseline_fx / jnp.maximum(disp, 1e-3)
    return depth, ok


@jax.jit
def scaled_error(
    est_cam: jnp.ndarray,  # (N, 3) estimated points, camera frame
    gt_cam: jnp.ndarray,  # (N, 3) GT points, camera frame
    mask: jnp.ndarray,  # (N,) bool
):
    """Min-median scale + per-point Euclidean error (Estimate3DScale /
    Estimate3DError): scale estimated points to GT by the median depth
    ratio, then per-point distances."""
    ratio = jnp.where(
        jnp.linalg.norm(est_cam, axis=-1) > 1e-9,
        jnp.linalg.norm(gt_cam, axis=-1)
        / jnp.maximum(jnp.linalg.norm(est_cam, axis=-1), 1e-9),
        1.0,
    )
    s = masked_median(ratio, mask)
    err = jnp.linalg.norm(s * est_cam - gt_cam, axis=-1)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(mask, err * err, 0.0)) / jnp.maximum(mask.sum(), 1)
    )
    return s, err, rmse


def ate_rmse(
    est_poses: np.ndarray,  # (T, 4, 4) world->camera, estimated
    gt_poses: np.ndarray,  # (T, 4, 4) world->camera, ground truth
) -> float:
    """Sim3-aligned absolute trajectory error (ATE) RMSE.

    The north-star accuracy metric of BASELINE.json ("ATE RMSE <= reference
    on Mandala/Hamlyn").  The reference itself writes raw trajectories and
    per-frame scaled RMSE (GroundTruthCalculator.cc:203-274) and leaves ATE
    to offline tooling; here it is first-class: camera centers are aligned
    by a closed-form Umeyama Sim3 (the monocular scale/gauge freedom), then
    RMSE of the residual centers — the standard TUM-benchmark definition.
    """
    est = np.asarray(est_poses, np.float64)
    gt = np.asarray(gt_poses, np.float64)
    assert est.shape == gt.shape and est.ndim == 3
    # camera center c = -R^T t for world->camera [R|t]
    c_est = -np.einsum("tij,ti->tj", est[:, :3, :3], est[:, :3, 3])
    c_gt = -np.einsum("tij,ti->tj", gt[:, :3, :3], gt[:, :3, 3])
    mu_e, mu_g = c_est.mean(0), c_gt.mean(0)
    X, Y = c_est - mu_e, c_gt - mu_g
    var = (X * X).sum() / len(X)
    if var < 1e-18:
        # stationary estimate: no similarity to fit beyond translation
        aligned = c_est - mu_e + mu_g
    else:
        S = Y.T @ X / len(X)
        U, D, Vt = np.linalg.svd(S)
        W = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            W[2, 2] = -1.0
        R = U @ W @ Vt
        s = np.trace(np.diag(D) @ W) / var
        t = mu_g - s * R @ mu_e
        aligned = s * c_est @ R.T + t
    return float(np.sqrt(np.mean(np.sum((aligned - c_gt) ** 2, axis=1))))


def ate_rmse_trajectory(trajectory, gt_poses: np.ndarray) -> float:
    """ATE RMSE for a ``System.trajectory`` list of (timestamp, pose)
    entries against per-frame GT poses; timestamps index the GT array
    (modulo its length — benches replay sequences cyclically).  LOST
    frames simply have no trajectory entry and drop out of the pairing."""
    gt_poses = np.asarray(gt_poses)
    idx = [int(round(ts)) % len(gt_poses) for ts, _ in trajectory]
    est = np.stack([np.asarray(T) for _, T in trajectory])
    return ate_rmse(est, gt_poses[idx])


class GroundTruthEvaluator:
    """Per-frame GT evaluation + reference-format result files."""

    def __init__(self, cfg: Config, outdir: str | None = None):
        self.cfg = cfg
        self.outdir = outdir or cfg.output_dir
        self.rows: list[tuple[float, float, int, float]] = []
        # latest GT source, kept for per-keyframe normal-angle evaluation
        # (the reference evaluates angles INSIDE NRSfM using the keyframe's
        # GT data, DefLocalMapping.cc:216-221)
        self._last_depth: np.ndarray | None = None
        self._last_stereo: tuple | None = None  # (img_l, img_r, baseline)
        self._last_ts: float = 0.0

    def evaluate_depth(
        self, system, depth_map: np.ndarray, timestamp: float
    ) -> float | None:
        """CT-style GT (Apps/simple_CT.cc + TrackMonocularCTGT): read GT depth
        at each inlier map point's pixel; returns scaled RMSE."""
        self._last_depth, self._last_stereo = depth_map, None
        self._last_ts = timestamp
        pts, mask = self._tracked_points(system)
        if pts is None:
            return None
        uv = cam.project(system.K, pts)
        h, w = depth_map.shape
        xi = np.clip(np.round(np.asarray(uv[:, 0])).astype(int), 0, w - 1)
        yi = np.clip(np.round(np.asarray(uv[:, 1])).astype(int), 0, h - 1)
        d = depth_map[yi, xi]
        gt = np.asarray(cam.backproject(system.K, uv, jnp.asarray(d)))
        ok = mask & (d > 1e-6)
        s, err, rmse = scaled_error(pts, jnp.asarray(gt), jnp.asarray(ok))
        self.rows.append((timestamp, float(rmse), int(ok.sum()), float(s)))
        return float(rmse)

    def evaluate_stereo(
        self, system, img_l, img_r, baseline: float, timestamp: float
    ) -> float | None:
        """Stereo GT (TrackMonocularGT): NCC correspondences on the rectified
        pair -> MLS-radius outlier removal -> depths -> scaled RMSE
        (GroundTruthFrame::Estimate3DScale, GroundTruthFrame.cc:124-228,
        including the SmootherMLS::outlierRemovalRadius pass on the GT cloud
        before the min-median scale)."""
        self._last_stereo, self._last_depth = (img_l, img_r, baseline), None
        self._last_ts = timestamp
        pts, mask = self._tracked_points(system)
        if pts is None:
            return None
        uv = cam.project(system.K, pts)
        depth, ok = stereo_depth_ncc(
            jnp.asarray(img_l, jnp.float32),
            jnp.asarray(img_r, jnp.float32),
            uv,
            jnp.asarray(mask),
            baseline * self.cfg.camera.fx,
            self.cfg,
        )
        gt = cam.backproject(system.K, uv, depth)
        ok_h = np.asarray(ok)
        if ok_h.sum() >= 8:
            from defslam_tpu.groundtruth.normals_gt import radius_outlier_mask

            gt_h = np.asarray(gt)[ok_h]
            keep = radius_outlier_mask(
                gt_h, radius=0.1 * float(np.median(gt_h[:, 2])),
                min_neighbors=4,
            )
            kept = ok_h.copy()
            kept[np.nonzero(ok_h)[0][~keep]] = False
            ok = jnp.asarray(kept)
        s, err, rmse = scaled_error(pts, gt, ok)
        self.rows.append((timestamp, float(rmse), int(np.asarray(ok).sum()), float(s)))
        return float(rmse)

    def evaluate_keyframe_angles(self, system, slot: int) -> dict | None:
        """Per-keyframe normal-angle errors vs the latest GT source,
        written as ErrorAngIso/ErrorAngSfN files (the reference calls
        estimateAngleErrorAndScale inside NRSfM when saving results,
        DefLocalMapping.cc:216-221; GroundTruthKeyFrame.cc:61-209)."""
        from defslam_tpu.groundtruth import normals_gt

        if self._last_depth is not None:
            return normals_gt.evaluate_keyframe_normals(
                system, slot, self._last_depth,
                outdir=self.outdir, timestamp=self._last_ts,
            )
        if self._last_stereo is not None:
            img_l, img_r, baseline = self._last_stereo
            kp_xy = jnp.asarray(system.kfs.xy[slot])
            kp_valid = jnp.asarray(system.kfs.kp_valid[slot])
            depth, ok = stereo_depth_ncc(
                jnp.asarray(img_l, jnp.float32),
                jnp.asarray(img_r, jnp.float32),
                kp_xy, kp_valid,
                baseline * self.cfg.camera.fx,
                self.cfg,
            )
            kp_depth = np.where(np.asarray(ok), np.asarray(depth), 0.0)
            return normals_gt.evaluate_keyframe_normals_at(
                system, slot, kp_depth,
                outdir=self.outdir, timestamp=self._last_ts,
            )
        return None

    def _tracked_points(self, system):
        valid = np.asarray(system.points.valid) & (
            np.asarray(system.points.facet) >= 0
        )
        if valid.sum() < 3:
            return None, None
        pc = se3.transform(system.pose, system.points.xyz)
        in_front = np.asarray(pc[:, 2]) > 1e-6
        return pc, jnp.asarray(valid & in_front)

    def write(self, timestamp_tag: float = 0.0):
        """ErrorGTs<tag>.txt + ScaleVariation.txt, reference formats."""
        os.makedirs(self.outdir, exist_ok=True)
        with open(
            os.path.join(self.outdir, f"ErrorGTs{timestamp_tag:.0f}.txt"), "w"
        ) as f:
            for t, rmse, n, s in self.rows:
                f.write(f"{rmse:.8f}\n")
        with open(os.path.join(self.outdir, "ScaleVariation.txt"), "w") as f:
            for t, rmse, n, s in self.rows:
                f.write(f"{t:.6f} {s:.8f} {n}\n")
