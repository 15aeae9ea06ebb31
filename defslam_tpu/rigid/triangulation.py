"""Epipolar-constrained matching, batched triangulation, and point fusion.

Rigid-mode map growth, the TPU re-design of
``LocalMapping::CreateNewMapPoints`` (``Thirdparty/ORBSLAM_2/src/
LocalMapping.cc:201-458``), ``ORBmatcher::SearchForTriangulation``
(``ORBmatcher.cc:676-843``) and ``ORBmatcher::Fuse`` (``ORBmatcher.cc:
845-998``).  The reference walks BoW feature-vector buckets and per-keypoint
candidate lists; here the candidate structure is a dense masked (K1, K2)
distance matrix with the epipolar test folded in as a mask — one VPU pass
per keyframe pair instead of nested host loops.

Parity thresholds:
- epipolar gate  d^2 < 3.84 * sigma2[level]      (ORBmatcher.cc:143-165)
- descriptor     Hamming <= TH_LOW = 50          (ORBmatcher.h)
- parallax       0 < cos < 0.9998                (LocalMapping.cc:319-320)
- reprojection   chi2 < 5.991 * sigma2[level]    (LocalMapping.cc:375,402)
- scale ratio    within 1.5 * scaleFactor        (LocalMapping.cc:227,428-435)
- fuse           chi2 <= 5.99 * sigma2, TH_LOW   (ORBmatcher.cc:~905-995)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.geometry import se3
from defslam_tpu.ops import matching

_HP = jax.lax.Precision.HIGHEST

TH_LOW = 50
EPI_CHI2 = 3.84
REPROJ_CHI2 = 5.991
FUSE_CHI2 = 5.99
COS_PARALLAX_MAX = 0.9998


def level_sigma2(n_levels: int, scale_factor: float) -> jnp.ndarray:
    """Per-level measurement variance (Frame/ORBextractor mvLevelSigma2)."""
    s = jnp.asarray(scale_factor, jnp.float32)
    return (s ** (2.0 * jnp.arange(n_levels, dtype=jnp.float32)))


def fundamental_from_poses(T1w: jnp.ndarray, T2w: jnp.ndarray, K: jnp.ndarray):
    """F12 such that x2^T F12 x1 = 0 for pixel coords
    (LocalMapping::ComputeF12)."""
    T12 = T2w @ se3.inverse(T1w)  # cam1 -> cam2
    R, t = T12[:3, :3], T12[:3, 3]
    tx = jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]], K.dtype
    )
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R @ Kinv  # maps x1 -> epipolar line in image 2


class TriangulationMatches(NamedTuple):
    idx2: jnp.ndarray  # (K1,) best kp in KF2 for each unmatched kp in KF1
    dist: jnp.ndarray  # (K1,) Hamming distance


def search_for_triangulation(
    xy1, desc1, valid1, angle1, pid1,
    xy2, desc2, valid2, angle2, pid2,
    level2, F12, sig2,
) -> TriangulationMatches:
    """Match keypoints with no map point yet between two keyframes under the
    epipolar constraint (SearchForTriangulation semantics; the BoW-bucket
    pruning is replaced by the full masked matrix)."""
    free1 = valid1 & (pid1 < 0)
    free2 = valid2 & (pid2 < 0)
    # epipolar line of each kp1 in image 2
    ones = jnp.ones_like(xy1[:, :1])
    l2 = jnp.concatenate([xy1, ones], axis=1) @ F12.T  # (K1, 3)
    num = (
        l2[:, None, 0] * xy2[None, :, 0]
        + l2[:, None, 1] * xy2[None, :, 1]
        + l2[:, None, 2]
    )
    den = jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)[:, None]
    dsq = num * num / den  # (K1, K2)
    epi_ok = dsq < EPI_CHI2 * sig2[jnp.clip(level2, 0, sig2.shape[0] - 1)][None, :]

    d = matching.masked_hamming(desc1, desc2, free1, free2, pair_mask=epi_ok)
    m = matching.best_match(d, TH_LOW)
    m = matching.rotation_consistency(angle1, angle2, m)
    return TriangulationMatches(idx2=m.idx, dist=m.dist)


class Triangulated(NamedTuple):
    xyz: jnp.ndarray  # (K1, 3) world points
    ok: jnp.ndarray  # (K1,) bool passed all checks


def triangulate_matches(
    T1w, T2w, K,
    xy1, level1, xy2_all, level2_all,
    idx2, sig2,
    scale_factor: float,
) -> Triangulated:
    """Triangulate kp1 <-> kp2 matches with the reference's full acceptance
    cascade (LocalMapping.cc:283-446), batched over all matches."""
    k1 = xy1.shape[0]
    j = jnp.clip(idx2, 0, xy2_all.shape[0] - 1)
    xy2 = xy2_all[j]
    level2 = level2_all[j]
    has = idx2 >= 0

    P1 = K @ T1w[:3, :4]
    P2 = K @ T2w[:3, :4]

    rows = jnp.stack(
        [
            xy1[:, 0, None] * P1[2] - P1[0],
            xy1[:, 1, None] * P1[2] - P1[1],
            xy2[:, 0, None] * P2[2] - P2[0],
            xy2[:, 1, None] * P2[2] - P2[1],
        ],
        axis=1,
    )
    rows = rows / jnp.maximum(jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("nij,nik->njk", rows, rows, precision=_HP)
    _, vecs = jnp.linalg.eigh(AtA)
    Xh = vecs[..., 0]
    w = jnp.where(jnp.abs(Xh[:, 3]) < 1e-12, 1e-12, Xh[:, 3])
    X = Xh[:, :3] / w[:, None]
    finite = jnp.all(jnp.isfinite(X), axis=-1)
    X = jnp.where(finite[:, None], X, 0.0)

    # parallax between viewing rays (world frame)
    O1 = se3.inverse(T1w)[:3, 3]
    O2 = se3.inverse(T2w)[:3, 3]
    r1 = X - O1[None, :]
    r2 = X - O2[None, :]
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    par_ok = (cosp > 0) & (cosp < COS_PARALLAX_MAX)

    Xc1 = se3.transform(T1w, X)
    Xc2 = se3.transform(T2w, X)
    depth_ok = (Xc1[:, 2] > 0) & (Xc2[:, 2] > 0)

    def chi2(Xc, uv, lv):
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
        u = K[0, 0] * Xc[:, 0] / z + K[0, 2]
        v = K[1, 1] * Xc[:, 1] / z + K[1, 2]
        e = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return e / sig2[jnp.clip(lv, 0, sig2.shape[0] - 1)]

    reproj_ok = (chi2(Xc1, xy1, level1) < REPROJ_CHI2) & (
        chi2(Xc2, xy2, level2) < REPROJ_CHI2
    )

    # scale consistency (LocalMapping.cc:418-446)
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-12)
    sf = jnp.asarray(scale_factor, jnp.float32)
    ratio_octave = sf ** (level1 - level2).astype(jnp.float32)
    ratio_factor = 1.5 * sf
    scale_ok = (ratio_dist * ratio_factor >= ratio_octave) & (
        ratio_dist <= ratio_octave * ratio_factor
    )

    ok = has & finite & par_ok & depth_ok & reproj_ok & scale_ok & (d1 > 1e-6) & (d2 > 1e-6)
    return Triangulated(xyz=X, ok=ok)


class FuseResult(NamedTuple):
    kp_idx: jnp.ndarray  # (P,) best keypoint in the target KF, -1 if none
    existing_pid: jnp.ndarray  # (P,) map point already at that kp, -1 if free


def fuse_into_keyframe(
    pts_xyz, pts_desc, pts_valid,
    Tkw, K, xy, desc, kp_valid, level, pid,
    sig2, width: int, height: int, radius: float = 3.0,
):
    """Project map points into a keyframe and match them to its keypoints
    (ORBmatcher::Fuse).  Returns, per point, the matched keypoint and the
    point currently bound there (for host-side duplicate merging: the
    reference keeps the more-observed point, ORBmatcher.cc:~1000)."""
    Xc = se3.transform(Tkw, pts_xyz)
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = K[0, 0] * Xc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[:, 1] / zs + K[1, 2]
    in_img = (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    proj = jnp.stack([u, v], axis=-1)

    lv = jnp.clip(level, 0, sig2.shape[0] - 1)
    r = radius * jnp.sqrt(sig2[lv])  # th * scaleFactor^level
    near = (
        jnp.max(jnp.abs(proj[:, None, :] - xy[None, :, :]), axis=-1) <= r[None, :]
    )
    err = jnp.sum((proj[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
    chi_ok = err / sig2[lv][None, :] <= FUSE_CHI2

    d = matching.masked_hamming(
        pts_desc, desc, pts_valid & in_img, kp_valid, pair_mask=near & chi_ok
    )
    m = matching.best_match(d, TH_LOW)
    kp = m.idx
    existing = jnp.where(kp >= 0, pid[jnp.clip(kp, 0, pid.shape[0] - 1)], -1)
    return FuseResult(kp_idx=kp, existing_pid=existing)


import functools


@functools.partial(jax.jit, static_argnames=("p_cap",))
def apply_replacements(
    point_id_tables: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray, p_cap: int
):
    """Apply point-merge replacements src[i] -> dst[i] across all keyframes'
    kp->point tables (MapPoint::Replace propagated through observations,
    MapPoint.cc).  One scatter into an identity LUT + one gather — no loop.
    src/dst: (R,) with -1 padding."""
    lut = jnp.arange(p_cap, dtype=jnp.int32)
    tgt = jnp.where(src >= 0, src, p_cap)
    lut = lut.at[tgt].set(jnp.where(src >= 0, dst, 0), mode="drop")
    valid = point_id_tables >= 0
    mapped = lut[jnp.clip(point_id_tables, 0, p_cap - 1)]
    return jnp.where(valid, mapped, point_id_tables)
