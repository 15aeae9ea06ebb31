"""Pose-only optimization + relocalization.

- ``solve_pose``: camera-only robust LM over fixed 3D points — the
  reference's ``Optimizer::poseOptimization`` (DefOptimizer.cc:63-246, used
  as the rigid fallback when no template exists, DefTracking.cc:248-251).
- ``relocalize``: recover tracking after LOST.  The reference's DefSLAM mode
  simply resets to a plane (DefTracking.cc:194-207); its ORBSLAM mode
  relocalizes via DBoW2 candidates + EPnP RANSAC (Tracking.cc:1631-1799,
  KeyFrameDatabase::DetectRelocalizationCandidates).  TPU re-design: at the
  framework's keyframe capacities a *dense* Hamming match of the frame
  against every stored keyframe descriptor is a single batched op — the
  inverted BoW index exists to avoid exactly this cost on CPUs and is
  unnecessary here; candidate scoring = match votes per keyframe, pose
  recovery = robust pose-only LM seeded at each candidate's stored pose.
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
from defslam_tpu.mapstore.state import KeyframeStore, PointStore
from defslam_tpu.ops import lm, matching


class PoseResult(NamedTuple):
    T: jnp.ndarray  # (4, 4)
    inlier: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # ()
    cost: jnp.ndarray


def solve_pose(
    K: jnp.ndarray,
    T0: jnp.ndarray,
    pts_w: jnp.ndarray,  # (N, 3) fixed world points
    obs_uv: jnp.ndarray,  # (N, 2)
    inv_sigma2: jnp.ndarray,  # (N,)
    mask: jnp.ndarray,  # (N,)
    cfg: Config,
    num_iters: int = 10,
    rounds: int = 4,
) -> PoseResult:
    """Robust camera-only LM: `rounds` passes of optimize + chi2 re-gate,
    like the reference's 4x10-iteration schedule (DefOptimizer.cc:63-246)."""
    n = pts_w.shape[0]

    def chi2_of(T):
        pc = se3.transform(T, pts_w)
        uv = cam.project(K, pc)
        e2 = jnp.sum((uv - obs_uv) ** 2, axis=-1) * inv_sigma2
        return jnp.where(pc[..., 2] > 1e-6, e2, jnp.inf)

    def one_round(carry, _):
        T, m = carry

        def residual_fn(xi):
            Tc = se3.se3_exp(xi) @ T
            pc = se3.transform(Tc, pts_w)
            uv = cam.project(K, pc)
            w = jnp.sqrt(inv_sigma2) * m
            w = jnp.where(pc[..., 2] > 1e-6, w, 0.0)
            return ((uv - obs_uv) * w[:, None]).reshape(-1)

        def weight_fn(r):
            return lm.huber_block_weights(r, 2, cfg.sft.huber_delta)

        res = lm.lm_solve(
            residual_fn, jnp.zeros(6), num_iters=num_iters, weight_fn=weight_fn
        )
        T_new = se3.se3_exp(res.x) @ T
        m_new = mask.astype(jnp.float32) * (
            chi2_of(T_new) <= cfg.sft.chi2_threshold
        )
        return (T_new, m_new), res.cost

    (T, m), costs = jax.lax.scan(
        one_round, (T0, mask.astype(jnp.float32)), None, length=rounds
    )
    inlier = m > 0
    return PoseResult(
        T=T, inlier=inlier, n_inliers=jnp.sum(inlier), cost=costs[-1]
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def relocalize(
    feats: Features,
    kfs: KeyframeStore,
    points: PointStore,
    K: jnp.ndarray,
    cfg: Config,
):
    """Try to recover the camera pose against the stored keyframes.

    1. score every keyframe by dense descriptor-match votes
       (KeyFrameDatabase::DetectRelocalizationCandidates role);
    2. for each of the top-5 candidate keyframes (the reference tries up to
       5 candidates with P4P RANSAC, Tracking.cc:1631-1799 — one bad
       best-vote must not kill recovery): frame-kp -> map-point matches
       through that keyframe's observation table;
    3. robust pose-only LM seeded at each candidate's stored pose, vmapped
       over the candidates; keep the candidate with the most inliers.

    Returns (ok () bool, T (4,4), n_inliers ()).
    """
    f_cap, k_cap = kfs.point_id.shape
    # match frame descriptors against each keyframe (F batched matrices)
    def score_kf(slot):
        d = matching.masked_hamming(
            feats.desc, kfs.desc[slot], feats.valid,
            kfs.kp_valid[slot] & (kfs.point_id[slot] >= 0),
        )
        # the reference relocalizes with a STRICTER ratio than tracking:
        # ORBmatcher(0.75, true) in Tracking::Relocalization
        # (Tracking.cc:1654-1656) vs mfNNratio 0.9 for projection tracking
        m = matching.best_match(
            d, max_dist=cfg.tracking.match_th_low,
            nn_ratio=0.75, mutual=True,
        )
        votes = jnp.sum((m.idx >= 0) & kfs.valid[slot])
        return votes, m.idx

    votes, match_idx = jax.lax.map(score_kf, jnp.arange(f_cap))
    n_cand = min(5, f_cap)
    cand_votes, cand_kf = jax.lax.top_k(votes, n_cand)
    p_cap = points.capacity
    lv = feats.level.astype(jnp.float32)
    inv_sigma2 = 1.0 / (cfg.orb.scale_factor ** (2.0 * lv))

    def try_candidate(kf_slot, cand_ok):
        idx = match_idx[kf_slot]  # (K,) frame-kp -> kf-kp
        pid = jnp.where(
            idx >= 0, kfs.point_id[kf_slot][jnp.clip(idx, 0, k_cap - 1)], -1
        )
        pidc = jnp.clip(pid, 0, p_cap - 1)
        ok_obs = (pid >= 0) & points.valid[pidc] & cand_ok
        res = solve_pose(
            K, kfs.pose[kf_slot], points.xyz[pidc], feats.xy,
            inv_sigma2, ok_obs, cfg,
        )
        return res.T, res.n_inliers

    cand_ok = (cand_votes > 0) & kfs.valid[cand_kf]
    Ts, n_inl = jax.vmap(try_candidate)(cand_kf, cand_ok)
    best = jnp.argmax(n_inl)
    ok = n_inl[best] >= cfg.tracking.min_inliers_ok
    return ok, Ts[best], n_inl[best]
