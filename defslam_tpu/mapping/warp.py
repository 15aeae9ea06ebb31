"""Keyframe-to-keyframe spline warps ("Schwarps").

Replaces the reference's Ceres-based warp machinery
(``Modules/Mapping/Schwarp.{h,cc}``: ``Warp`` reprojection cost 38-303 with
closed-form bending-regularized init 99-160, ``Schwarzian`` regularizer
305-543; fitted per covisible pair in ``SchwarpDatabase::calculateSchwarps``
199-349, 3 LM iterations) with batched jnp:

- A warp KF1 -> KF2 is a 2-valued bicubic B-spline over KF1's retina domain
  with the reference's 13x15 control grid (bbs_MAC.h).
- Init = closed-form ridge fit (ops.bspline.fit_ridge), identical role to
  Warp::initialize's LDLT solve.
- Refinement = the shared LM engine over the 390 control values.  The
  regularizer keeps the warp locally projective: at each colocation point we
  eliminate the homography's perspective vector g in closed form and
  penalize the remaining Hessian inconsistency

      r_k = H_k + g* grad_k^T + grad_k g*^T,   k in {u2, v2 components}

  which vanishes exactly iff the warp is locally a homography — the same
  characterization the reference's 2D Schwarzian equations encode (Schwarp.h
  cites Pizarro et al., IJCV 2016); eliminating g keeps it a plain
  least-squares term, batched over colocation points on the MXU.
- The differential properties consumed by NRSfM (warp value, J12, J21,
  Hessian columns — the reference's DiffProp, diffProp.h:37-92) are spline
  evaluations at the matched keypoints, all orders in one pass.

Everything is vmappable over warp pairs: the mapping thread's per-pair Ceres
loop becomes one batched device computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.ops import bspline, lm


class DiffProps(NamedTuple):
    """Differential properties of a warp at N matched points (DiffProp
    equivalent).  J12 = [[a, c], [b, d]] = d(u2,v2)/d(u1,v1)."""

    uv1: jnp.ndarray  # (N, 2) retina coords in KF1
    uv2: jnp.ndarray  # (N, 2) observed retina coords in KF2
    warped: jnp.ndarray  # (N, 2) warp(uv1)
    J12: jnp.ndarray  # (N, 2, 2)
    J21: jnp.ndarray  # (N, 2, 2)
    Huu: jnp.ndarray  # (N, 2) d2(u2,v2)/du1^2
    Huv: jnp.ndarray  # (N, 2)
    Hvv: jnp.ndarray  # (N, 2)
    mask: jnp.ndarray  # (N,) bool


def identity_ctrl(dom: jnp.ndarray, nu: int, nv: int) -> jnp.ndarray:
    """Control points of the identity warp (Greville abscissae)."""
    gu = dom[0] + (jnp.arange(nu) - 1.0) * (dom[1] - dom[0]) / (nu - 3)
    gv = dom[2] + (jnp.arange(nv) - 1.0) * (dom[3] - dom[2]) / (nv - 3)
    U, V = jnp.meshgrid(gu, gv, indexing="ij")
    return jnp.stack([U, V], axis=-1)  # (nu, nv, 2)


def fit_initial(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    w: jnp.ndarray,
    dom: jnp.ndarray,
    nu: int,
    nv: int,
    bending: jnp.ndarray,
    bending_weight: float,
) -> jnp.ndarray:
    """Closed-form warp init (Warp::initialize, Schwarp.cc:99-160).

    Fits the *displacement* field uv2 - uv1 with a bending-regularized
    ridge so the prior pulls toward the identity warp, then adds the
    identity control points back.
    """
    disp = uv2 - uv1
    dctrl = bspline.fit_ridge(
        uv1[:, 0], uv1[:, 1], disp, dom, nu, nv, bending_weight,
        weights=w, bending=bending,
    )
    return identity_ctrl(dom, nu, nv) + dctrl


def _coloc_grid(dom: jnp.ndarray, nu: int, nv: int, per_cell: int = 1):
    """Colocation points for the projectivity regularizer: cell centers."""
    nun, nvn = nu - 3, nv - 3
    cu = dom[0] + (jnp.arange(nun) + 0.5) * (dom[1] - dom[0]) / nun
    cv = dom[2] + (jnp.arange(nvn) + 0.5) * (dom[3] - dom[2]) / nvn
    U, V = jnp.meshgrid(cu, cv, indexing="ij")
    return U.reshape(-1), V.reshape(-1)


def projectivity_residuals(
    ctrl: jnp.ndarray, qu: jnp.ndarray, qv: jnp.ndarray, dom: jnp.ndarray
) -> jnp.ndarray:
    """Per-colocation-point local-projectivity violation (6 values/point).

    For each point, the best perspective vector g solving
    H_k ~ -(g grad_k^T + grad_k g^T) for both warp components is eliminated
    in closed form (linear least squares, 2 unknowns, 6 equations); the
    returned residual is the remainder.  Zero iff the warp is locally a
    homography (the Schwarzian = 0 condition).
    """
    d10 = bspline.evaluate(ctrl, qu, qv, dom, 1, 0)  # (Q, 2) gradients wrt u
    d01 = bspline.evaluate(ctrl, qu, qv, dom, 0, 1)
    d20 = bspline.evaluate(ctrl, qu, qv, dom, 2, 0)
    d11 = bspline.evaluate(ctrl, qu, qv, dom, 1, 1)
    d02 = bspline.evaluate(ctrl, qu, qv, dom, 0, 2)

    # grads: (Q, 2 comp, 2) ; hessians: (Q, 2 comp, 2, 2)
    grad = jnp.stack([d10, d01], axis=-1)  # [comp, d/du|d/dv]
    H = jnp.stack(
        [
            jnp.stack([d20, d11], axis=-1),
            jnp.stack([d11, d02], axis=-1),
        ],
        axis=-2,
    )  # (Q, 2, 2, 2) — H[q, comp, i, j]

    # Solve min_g sum_k || H_k + g grad_k^T + grad_k g^T ||_F^2 : a 2x2
    # linear system  M g = rhs  built from the unique entries.
    # d/dg of sum_k ||...||^2 -> M = 2*sum_k (grad_k grad_k^T + |grad_k|^2 I)
    gg = jnp.einsum("qki,qkj->qij", grad, grad)  # (Q, 2, 2)
    g2 = jnp.einsum("qki,qki->q", grad, grad)  # (Q,)
    M = gg + g2[:, None, None] * jnp.eye(2)
    rhs = -jnp.einsum("qkij,qkj->qi", H, grad)
    M = M + 1e-8 * jnp.eye(2)
    g = jnp.linalg.solve(M, rhs[..., None])[..., 0]  # (Q, 2)
    R = H + jnp.einsum("qi,qkj->qkij", g, grad) + jnp.einsum("qki,qj->qkij", grad, g)
    return R.reshape(R.shape[0], -1).reshape(-1)  # (Q*8,) (sym dup is fine)


def refine(
    ctrl0: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    w: jnp.ndarray,
    dom: jnp.ndarray,
    reg_weight: float,
    fx: float,
    fy: float,
    num_iters: int = 3,
) -> jnp.ndarray:
    """LM refinement of the warp (SchwarpDatabase.cc:199-222: 3 iterations,
    data term in pixel units via fx/fy + Schwarzian regularizer weighted by
    LocalMapping.Schwarp.Regularizer)."""
    nu, nv, _ = ctrl0.shape
    qu, qv = _coloc_grid(dom, nu, nv)
    n_q = qu.shape[0]
    pix = jnp.asarray([fx, fy], ctrl0.dtype)
    lam = jnp.sqrt(reg_weight / (8.0 * n_q))

    def residual_fn(x):
        ctrl = x.reshape(nu, nv, 2)
        pred = bspline.evaluate(ctrl, uv1[:, 0], uv1[:, 1], dom)
        r_data = ((pred - uv2) * pix * w[:, None]).reshape(-1)
        r_reg = lam * projectivity_residuals(ctrl, qu, qv, dom)
        return jnp.concatenate([r_data, r_reg])

    res = lm.lm_solve(residual_fn, ctrl0.reshape(-1), num_iters=num_iters)
    return res.x.reshape(nu, nv, 2)


def diff_props(
    ctrl: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    mask: jnp.ndarray,
    dom: jnp.ndarray,
    fx: float,
    fy: float,
    max_err_px: float,
) -> DiffProps:
    """Evaluate warp + 1st/2nd derivatives at matched points and gate by
    pixel reprojection error (SchwarpDatabase.cc:246-292)."""
    u, v = uv1[:, 0], uv1[:, 1]
    val = bspline.evaluate(ctrl, u, v, dom)
    du = bspline.evaluate(ctrl, u, v, dom, 1, 0)  # (N, 2) = (a, b)
    dv = bspline.evaluate(ctrl, u, v, dom, 0, 1)  # (N, 2) = (c, d)
    huu = bspline.evaluate(ctrl, u, v, dom, 2, 0)
    huv = bspline.evaluate(ctrl, u, v, dom, 1, 1)
    hvv = bspline.evaluate(ctrl, u, v, dom, 0, 2)
    J12 = jnp.stack([du, dv], axis=-1)  # [[a, c], [b, d]] rows=(u2,v2)comp
    det = J12[:, 0, 0] * J12[:, 1, 1] - J12[:, 0, 1] * J12[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    J21 = (
        jnp.stack(
            [
                jnp.stack([J12[:, 1, 1], -J12[:, 0, 1]], axis=-1),
                jnp.stack([-J12[:, 1, 0], J12[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[:, None, None]
    )
    err = jnp.linalg.norm(
        (val - uv2) * jnp.asarray([fx, fy], val.dtype), axis=-1
    )
    ok = mask & (err <= max_err_px)
    return DiffProps(
        uv1=uv1, uv2=uv2, warped=val, J12=J12, J21=J21,
        Huu=huu, Huv=huv, Hvv=hvv, mask=ok,
    )
