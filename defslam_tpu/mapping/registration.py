"""Sim(3) registration of a new up-to-scale surface against the metric map.

Equivalent of ``Modules/Mapping/SurfaceRegistration.{h,cc}``: gather the
per-keyframe stored positions of the map points vs the new surface estimate
(>=15 pairs required, :106), initialize scale with a min-median search
(``GroundTruthTools::scaleMinMedian``, GroundTruthCalculator.cc:54-159),
align with a Horn-style Sim(3) (g2o ``OptimizeHorn``, DefOptimizer.cc:
840-922), and gate acceptance on the residual (``chiLimit_``).

TPU re-design: the min-median scale search evaluates *every* candidate scale
against *every* point in one (C x N) broadcast instead of the reference's
rand() subsampling loop (deterministic, and the array is tiny); the Sim(3)
uses the closed-form weighted Umeyama solution plus a robust reweighted
second pass instead of 2x50 g2o iterations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from defslam_tpu.geometry import se3
from defslam_tpu.utils import masked_median


class RegistrationResult(NamedTuple):
    s: jnp.ndarray  # scale applied to the surface
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    residual: jnp.ndarray  # robust (median) relative residual
    accepted: jnp.ndarray  # () bool — residual below chi limit
    n_pairs: jnp.ndarray  # () int


def scale_min_median(
    src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray, n_candidates: int = 128
) -> jnp.ndarray:
    """Min-median scale: among per-point ratio candidates s_i = |dst_i|/|src_i|,
    pick the one minimizing the median alignment residual |s*src - dst|."""
    ns = jnp.linalg.norm(src, axis=-1)
    nd = jnp.linalg.norm(dst, axis=-1)
    ratio = jnp.where(ns > 1e-9, nd / jnp.maximum(ns, 1e-9), 1.0)
    c = min(n_candidates, src.shape[0])
    # evenly strided candidate subset (deterministic)
    idx = (jnp.arange(c) * (src.shape[0] // max(c, 1))).astype(jnp.int32)
    cand = ratio[idx]  # (C,)
    res = jnp.linalg.norm(
        cand[:, None, None] * src[None] - dst[None], axis=-1
    )  # (C, N)
    # vectorized masked median over candidates:
    big = jnp.where(mask[None, :], res, jnp.inf)
    srt = jnp.sort(big, axis=-1)
    cnt = jnp.sum(mask.astype(jnp.int32))
    i1 = jnp.maximum(cnt - 1, 0) // 2
    i2 = jnp.minimum(cnt // 2, src.shape[0] - 1)
    med = 0.5 * (srt[:, i1] + srt[:, i2])
    return cand[jnp.argmin(med)]


def register(
    surf_xyz: jnp.ndarray,  # (N, 3) new surface points (KF camera frame)
    map_xyz: jnp.ndarray,  # (N, 3) current map positions (same frame)
    mask: jnp.ndarray,  # (N,) bool valid pairs
    chi_limit: float,
    min_pairs: int = 15,
) -> RegistrationResult:
    """Align surface -> map: find Sim(3) minimizing |sR surf + t - map|."""
    n_pairs = jnp.sum(mask.astype(jnp.int32))
    w = mask.astype(surf_xyz.dtype)

    s0 = scale_min_median(surf_xyz, map_xyz, mask)
    src = s0 * surf_xyz
    s1, R1, t1 = se3.horn_alignment(src, map_xyz, w)

    # robust second pass: downweight pairs beyond 2.5x the median residual
    res1 = jnp.linalg.norm(
        s1 * src @ R1.T + t1 - map_xyz, axis=-1
    )
    med1 = masked_median(res1, mask)
    w2 = w * (res1 <= 2.5 * med1 + 1e-9).astype(w.dtype)
    s2, R2, t2 = se3.horn_alignment(src, map_xyz, w2)

    res2 = jnp.linalg.norm(s2 * src @ R2.T + t2 - map_xyz, axis=-1)
    # scale-free residual: relative to the median map-point range.
    # DEVIATION (documented at MappingConfig.chi_limit): the reference gates
    # a g2o chi2 SUM (SurfaceRegistration.cc:126-135); a relative median is
    # invariant to pair count and metric scale, so chi_limit transfers
    # across sequences — reference YAML chiLimit values need retuning.
    scene = masked_median(jnp.linalg.norm(map_xyz, axis=-1), mask)
    rel = masked_median(res2, mask) / jnp.maximum(scene, 1e-9)
    accepted = (n_pairs >= min_pairs) & (rel < chi_limit) & jnp.isfinite(rel)
    return RegistrationResult(
        s=s0 * s2, R=R2, t=t2, residual=rel, accepted=accepted, n_pairs=n_pairs
    )
