"""Keyframe redundancy detection (``LocalMapping::KeyFrameCulling``,
``Thirdparty/ORBSLAM_2/src/LocalMapping.cc:645-725``).

The reference walks each local keyframe's map points and, per point, its
observation map, counting other keyframes that see it at the same or finer
pyramid level; a keyframe is culled when >= 90% of its points are covered by
>= 3 such observers.  Here the whole observation structure is two dense
(F, P) arrays (min observation level per keyframe x point, built with one
scatter-min) and the cross-count is a single broadcast comparison — no
per-point host loops.

The reference culls keyframes one at a time inside its sequential loop,
which makes later decisions depend on earlier erasures.  The batched
equivalent returns per-keyframe redundancy ratios and the orchestrator
culls the single most redundant keyframe per mapping step (deterministic,
and immune to the mutual-support race where two keyframes covering the same
points would both be dropped in one pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NO_OBS = 255


def redundancy_ratios(
    point_id: jnp.ndarray,  # (F, K) int32, -1 = none
    level: jnp.ndarray,  # (F, K) int32
    kp_valid: jnp.ndarray,  # (F, K) bool
    kf_valid: jnp.ndarray,  # (F,) bool
    point_valid: jnp.ndarray,  # (P,) bool
    min_obs: int = 3,
) -> jnp.ndarray:
    """Fraction of each keyframe's observed points that are redundantly
    covered (seen by >= ``min_obs`` other keyframes at level <= own+1,
    LocalMapping.cc:665-704).  Returns (F,) float32 (0 for invalid KFs)."""
    F, K = point_id.shape
    P = point_valid.shape[0]
    obs_ok = kp_valid & (point_id >= 0) & kf_valid[:, None]
    pid = jnp.where(obs_ok, point_id, P)
    f_idx = jnp.broadcast_to(jnp.arange(F)[:, None], (F, K))
    lvl = jnp.full((F, P + 1), _NO_OBS, jnp.int32)
    lvl = lvl.at[f_idx.reshape(-1), pid.reshape(-1)].min(
        jnp.where(obs_ok, level, _NO_OBS).reshape(-1)
    )
    lvl = lvl[:, :P]
    obs = (lvl < _NO_OBS) & point_valid[None, :]
    # covered[f, p]: # of other KFs seeing p at scale level <= lvl[f,p]+1
    finer = obs[None, :, :] & (lvl[None, :, :] <= lvl[:, None, :] + 1)  # (F, F', P)
    counts = jnp.sum(finer, axis=1) - obs.astype(jnp.int32)  # exclude self
    redundant = obs & (counts >= min_obs)
    n_obs = jnp.maximum(jnp.sum(obs, axis=1), 1)
    ratio = jnp.sum(redundant, axis=1) / n_obs
    return jnp.where(kf_valid & (jnp.sum(obs, axis=1) > 0), ratio, 0.0)


def pick_cull(
    ratios: jnp.ndarray, protect: jnp.ndarray, threshold: float = 0.9
) -> jnp.ndarray:
    """Slot of the most redundant cullable keyframe, or -1.

    ``protect``: (F,) bool — keyframes that must survive (first keyframe,
    current reference keyframe; the reference never culls KF 0)."""
    r = jnp.where(protect, 0.0, ratios)
    best = jnp.argmax(r)
    return jnp.where(r[best] > threshold, best, -1)
