"""Per-keyframe normal-angle evaluation against ground truth.

Equivalent of ``GroundTruthKeyFrame::estimateAngleErrorAndScale``
(``Modules/GroundTruth/GroundTruthKeyFrame.cc:61-209``): compare the NRSfM
per-keypoint normals (isometric estimate) and the integrated SfN surface
normals against normals of the GT point cloud, writing
``ErrorAngIso<ts>.txt`` / ``ErrorAngSfN<ts>.txt``.

The reference computes GT normals with PCL's kNN-PCA estimator and smooths
with MLS (``Modules/ToolsPCL/``: PCLNormalEstimator, SmootherMLS).  Here the
same math is plain numpy + scipy cKDTree — this path is evaluation-only and
never touches the device hot path (the reference makes the same call:
"PCL ... used just for ground truths", README.md section 2).
"""

from __future__ import annotations

import os

import numpy as np


def knn_pca_normals(cloud: np.ndarray, k: int = 12) -> np.ndarray:
    """kNN-PCA normals (PCLNormalEstimator equivalent): smallest-eigenvector
    of the local covariance, oriented toward the camera (-z viewing)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(cloud)
    _, idx = tree.query(cloud, k=min(k, len(cloud)))
    nbrs = cloud[idx]  # (N, k, 3)
    mean = nbrs.mean(axis=1, keepdims=True)
    x = nbrs - mean
    cov = np.einsum("nki,nkj->nij", x, x)
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]  # smallest eigenvalue
    # orient toward the camera at origin
    flip = np.sum(normals * cloud, axis=1) > 0
    normals[flip] *= -1
    return normals


def radius_outlier_mask(
    cloud: np.ndarray, radius: float, min_neighbors: int = 5
) -> np.ndarray:
    """SmootherMLS::outlierRemovalRadius equivalent (SmootherMLS.h:27-59)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(cloud)
    counts = np.array(tree.query_ball_point(cloud, r=radius, return_length=True))
    return counts >= min_neighbors


def angle_errors_deg(n_est: np.ndarray, n_gt: np.ndarray) -> np.ndarray:
    """Unsigned angle between normals (sign-agnostic, like the reference)."""
    a = n_est / np.maximum(np.linalg.norm(n_est, axis=1, keepdims=True), 1e-9)
    b = n_gt / np.maximum(np.linalg.norm(n_gt, axis=1, keepdims=True), 1e-9)
    cos = np.abs(np.sum(a * b, axis=1))
    return np.degrees(np.arccos(np.clip(cos, 0.0, 1.0)))


def evaluate_keyframe_normals(
    system, slot: int, depth_map: np.ndarray, outdir: str | None = None,
    timestamp: float = 0.0,
) -> dict | None:
    """Angle errors of (a) the isometric-NRSfM normals and (b) the SfN
    surface normals at keyframe `slot`'s keypoints vs GT-depth normals."""
    kp_xy = np.asarray(system.kfs.xy[slot])
    h, w = depth_map.shape
    xi = np.clip(np.round(kp_xy[:, 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(kp_xy[:, 1]).astype(int), 0, h - 1)
    return evaluate_keyframe_normals_at(
        system, slot, depth_map[yi, xi], outdir=outdir, timestamp=timestamp
    )


def evaluate_keyframe_normals_at(
    system, slot: int, kp_depth: np.ndarray, outdir: str | None = None,
    timestamp: float = 0.0,
) -> dict | None:
    """evaluate_keyframe_normals with per-KEYPOINT GT depths (K,) — the
    seam the stereo-GT path uses (NCC depths at the keyframe's keypoints
    instead of a dense depth image)."""
    import jax.numpy as jnp

    from defslam_tpu.mapping import normals as nrm
    from defslam_tpu.ops import bspline

    kfs = system.kfs
    if not bool(kfs.valid[slot]):
        return None
    retina = np.asarray(kfs.retina[slot])
    norm_valid = np.asarray(kfs.norm_valid[slot])
    if norm_valid.sum() < 5:
        return None

    d = np.asarray(kp_depth)
    sel = norm_valid & (d > 1e-6)
    if sel.sum() < 5:
        return None
    cloud = np.stack(
        [retina[sel, 0] * d[sel], retina[sel, 1] * d[sel], d[sel]], axis=1
    )
    keep = radius_outlier_mask(cloud, radius=0.3 * np.median(d[sel]))
    n_gt = knn_pca_normals(cloud)

    # (a) isometric normals
    k_vals = np.asarray(kfs.norm_k[slot])[sel]
    n_iso = np.asarray(
        nrm.normal_from_k(jnp.asarray(k_vals), jnp.asarray(retina[sel]))
    )
    ang_iso = angle_errors_deg(n_iso[keep], n_gt[keep])

    out = {"iso_deg": ang_iso}
    # (b) SfN surface normals: gamma gradient -> k = -grad/gamma
    if bool(kfs.surf_valid[slot]):
        ctrl = kfs.surf_ctrl[slot]
        sdom = kfs.surf_dom[slot]  # per-KF spline domain (bbox or camera)
        u = jnp.asarray(retina[sel, 0])
        v = jnp.asarray(retina[sel, 1])
        g = bspline.evaluate(ctrl, u, v, sdom)
        gu = bspline.evaluate(ctrl, u, v, sdom, du=1)
        gv = bspline.evaluate(ctrl, u, v, sdom, dv=1)
        k_sfn = np.stack(
            [-np.asarray(gu) / np.asarray(g), -np.asarray(gv) / np.asarray(g)],
            axis=1,
        )
        n_sfn = np.asarray(
            nrm.normal_from_k(jnp.asarray(k_sfn), jnp.asarray(retina[sel]))
        )
        out["sfn_deg"] = angle_errors_deg(n_sfn[keep], n_gt[keep])

    if outdir:
        os.makedirs(outdir, exist_ok=True)
        np.savetxt(
            os.path.join(outdir, f"ErrorAngIso{timestamp:.0f}.txt"),
            out["iso_deg"],
        )
        if "sfn_deg" in out:
            np.savetxt(
                os.path.join(outdir, f"ErrorAngSfN{timestamp:.0f}.txt"),
                out["sfn_deg"],
            )
    return out
