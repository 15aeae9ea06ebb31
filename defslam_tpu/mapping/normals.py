"""Isometric-NRSfM normal estimation: batched per-point (k1, k2) solves.

The mathematical core of DefSLAM's mapping.  For each map point observed in a
pair of keyframes related by a warp, isometry constrains the log-depth
gradient k = (k1, k2) = -grad(gamma)/gamma of the reference view; the surface
normal then is n = [k1, k2, 1 - k1*u - k2*v] (NormalEstimator.cc:162-169).

Formulation (derived from first principles; equals the zero set of eqs
(13)/(14) of Lamarca et al. arXiv:1908.08918 up to conditioning):

- The scaled embedding of a view is phi = gamma(u,v) * [u, v, 1]; its metric
  satisfies  G(k; u, v) = [T_u.T_u, T_u.T_v; ., T_v.T_v] with
  T_u/gamma = -k1*[u,v,1] + e_u  etc.
- Isometry + the warp eta: view1 -> view2 give the exact pullback identity
      G1(k)  =  (gamma2/gamma1)^2 * J^T G2(k') J,      J = d eta / d(u,v).
  (verified to machine precision on synthetic isometric pairs.)
- Infinitesimal planarity transfers k' through the warp (the reference's
  propagation formula, NormalEstimator.cc:199-214):
      k' = J21 k + [ (d*t2 - b*t1), (a*t1 - c*t2) ] / det(J)^2,
      t1 = (-b*Hvv_x + a*Hvv_y)/2,  t2 = (d*Huu_x - c*Huu_y)/2.
- Eliminating the unknown scale ratio by normalizing both metrics to unit
  Frobenius norm leaves 3 residuals per pair observation in the 2 unknowns.

The reference solves one tiny Ceres problem *per map point, serially*
(``Modules/Mapping/NormalEstimator.cc:115-159``, <=200 LM iterations each,
covariance from the final JtJ).  Here the same estimation is one `vmap` of
the shared 2-parameter LM over thousands of points — the poster-child
batching win of the TPU design.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.mapping.warp import DiffProps
from defslam_tpu.ops import lm


class PairObs(NamedTuple):
    """Differential observation of one point through one warp, stackable to
    (P, O) leading shape."""

    uv1: jnp.ndarray  # (..., 2) point in reference view retina
    uv2: jnp.ndarray  # (..., 2) point in target view (warp prediction)
    J12: jnp.ndarray  # (..., 2, 2)
    Huu: jnp.ndarray  # (..., 2)
    Hvv: jnp.ndarray  # (..., 2)
    mask: jnp.ndarray  # (...,) bool


def pair_obs(dp: DiffProps) -> PairObs:
    return PairObs(
        uv1=dp.uv1, uv2=dp.warped, J12=dp.J12, Huu=dp.Huu, Hvv=dp.Hvv,
        mask=dp.mask,
    )


def transfer_k(k: jnp.ndarray, obs: PairObs) -> jnp.ndarray:
    """Infinitesimal-planarity transfer of k through the warp
    (NormalEstimator.cc:199-214).  k: (..., 2) -> (..., 2) in view 2."""
    a = obs.J12[..., 0, 0]
    c = obs.J12[..., 0, 1]
    b = obs.J12[..., 1, 0]
    d = obs.J12[..., 1, 1]
    det = a * d - c * b
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    det2 = det * det
    t1 = (-b * obs.Hvv[..., 0] + a * obs.Hvv[..., 1]) / 2.0
    t2 = (d * obs.Huu[..., 0] - c * obs.Huu[..., 1]) / 2.0
    # J21 = inv(J12) = [[d, -c], [-b, a]] / det
    k1p = (d * k[..., 0] - c * k[..., 1]) / det + (d * t2 - b * t1) / det2
    k2p = (-b * k[..., 0] + a * k[..., 1]) / det + (a * t1 - c * t2) / det2
    return jnp.stack([k1p, k2p], axis=-1)


def _metric(k: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Scaled first fundamental form G(k)/gamma^2, (..., 2, 2)."""
    u, v = uv[..., 0], uv[..., 1]
    k1, k2 = k[..., 0], k[..., 1]
    # T_u/gamma = -k1*[u,v,1] + e_u ; T_v/gamma = -k2*[u,v,1] + e_v
    e2 = 1.0 + u * u + v * v  # |eta|^2
    tuu = k1 * k1 * e2 - 2.0 * k1 * u + 1.0
    tvv = k2 * k2 * e2 - 2.0 * k2 * v + 1.0
    tuv = k1 * k2 * e2 - k1 * v - k2 * u
    return jnp.stack(
        [
            jnp.stack([tuu, tuv], axis=-1),
            jnp.stack([tuv, tvv], axis=-1),
        ],
        axis=-2,
    )


def metric_residuals(k: jnp.ndarray, obs: PairObs) -> jnp.ndarray:
    """3 isometry residuals per observation (leading dims broadcast).

    Both sides of the pullback identity are normalized to unit Frobenius
    norm, eliminating the unknown depth-scale ratio."""
    kp = transfer_k(k, obs)
    G1 = _metric(k, obs.uv1)
    G2 = _metric(kp, obs.uv2)
    J = obs.J12
    G2p = jnp.einsum("...ji,...jk,...kl->...il", J, G2, J)
    n1 = jnp.sqrt(jnp.sum(G1 * G1, axis=(-2, -1)) + 1e-12)
    n2 = jnp.sqrt(jnp.sum(G2p * G2p, axis=(-2, -1)) + 1e-12)
    D = G1 / n1[..., None, None] - G2p / n2[..., None, None]
    return jnp.stack([D[..., 0, 0], D[..., 0, 1], D[..., 1, 1]], axis=-1)


class NormalResult(NamedTuple):
    k: jnp.ndarray  # (P, 2) solved (k1, k2) per point
    cov: jnp.ndarray  # (P, 2, 2) covariance = inv(JtJ)
    cost: jnp.ndarray  # (P,)
    n_obs: jnp.ndarray  # (P,) number of valid pair observations
    valid: jnp.ndarray  # (P,) bool — solved with >=1 observation & finite


def solve_k1k2(
    obs: PairObs,  # arrays with leading shape (P, O)
    k_init: jnp.ndarray,  # (P, 2)
    num_iters: int = 30,
    unroll: int = 4,
) -> NormalResult:
    """All map points' normals in one vmapped 2-parameter LM.

    unroll > 0 uses the fixed-trip scan-unrolled LM: with thousands of
    lanes some lane always runs the full budget, so the while_loop's
    early exit is dead weight — the scan fuses across iterations and
    cuts the keyframe chain's dominant latency (see ops/lm.py)."""

    def solve_one(o: PairObs, k0):
        m = o.mask.astype(k0.dtype)

        def residual_fn(x):
            r = metric_residuals(x, o)  # (O, 3)
            return (r * m[:, None]).reshape(-1)

        res = lm.lm_solve(residual_fn, k0, num_iters=num_iters,
                          unroll=unroll)
        cov = jnp.linalg.inv(res.JtJ + 1e-10 * jnp.eye(2))
        return res.x, cov, res.cost

    k, cov, cost = jax.vmap(solve_one)(obs, k_init)
    n_obs = jnp.sum(obs.mask, axis=-1)
    valid = (n_obs >= 1) & jnp.all(jnp.isfinite(k), axis=-1)
    return NormalResult(k=k, cov=cov, cost=cost, n_obs=n_obs, valid=valid)


def normal_from_k(k: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """n = [k1, k2, 1 - k1 u - k2 v] (NormalEstimator.cc:162-169)."""
    return jnp.stack(
        [
            k[..., 0],
            k[..., 1],
            1.0 - k[..., 0] * uv[..., 0] - k[..., 1] * uv[..., 1],
        ],
        axis=-1,
    )
