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
- Refinement = a 3-iteration damped LM over the 390 control values with
  the data term's constant Jacobian precomputed (see ``refine``).  The
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

from defslam_tpu.ops import bspline


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
    LocalMapping.Schwarp.Regularizer).

    The data term is LINEAR in the control points (spline evaluation is a
    fixed colocation matrix), so its Jacobian and normal matrix are
    precomputed ONCE; only the projectivity regularizer is differentiated
    per iteration — cuts the per-iteration autodiff work by the data-row
    fraction (the reference's Ceres sees the same structure through its
    constant-Jacobian Warp cost, Schwarp.cc:38-303)."""
    nu, nv, _ = ctrl0.shape
    k2 = nu * nv * 2
    qu, qv = _coloc_grid(dom, nu, nv)
    n_q = qu.shape[0]
    pix = jnp.asarray([fx, fy], ctrl0.dtype)
    lam_r = jnp.sqrt(reg_weight / (8.0 * n_q))
    hp = jax.lax.Precision.HIGHEST

    # constant data-term pieces: residual rows (n, c) = C[n,k] pix_c w_n
    # over params (k, c) interleaved as ctrl.reshape(-1)
    C = bspline.coloc_2d(uv1[:, 0], uv1[:, 1], dom, nu, nv)  # (N, K)
    CtC = jnp.einsum("n,ni,nj->ij", w * w, C, C, precision=hp)  # (K, K)
    # H_data[(i,c),(j,c')] = delta_cc' pix_c^2 CtC[i,j]
    H_data = (
        CtC[:, None, :, None] * (jnp.diag(pix * pix))[None, :, None, :]
    ).reshape(k2, k2)
    y = uv2 * pix * w[:, None]  # (N, 2) weighted targets

    def reg_res(x):
        return lam_r * projectivity_residuals(
            x.reshape(nu, nv, 2), qu, qv, dom
        )

    jac_reg = jax.jacfwd(reg_res)

    def data_parts(x):
        pred_w = (C @ x.reshape(nu * nv, 2)) * pix * w[:, None]  # (N, 2)
        r = pred_w - y
        # g_data[(k,c)] = sum_n C[n,k] * pix_c * w_n * r[n,c]
        g = jnp.einsum(
            "nk,nc->kc", C, r * pix * w[:, None], precision=hp
        )
        return r.reshape(-1), g.reshape(-1)

    def cost_of(x):
        rd, _ = data_parts(x)
        rr = reg_res(x)
        return 0.5 * (jnp.sum(rd * rd) + jnp.sum(rr * rr))

    def body(carry, _):
        x, lam, cost = carry
        rd, g_d = data_parts(x)
        rr = reg_res(x)
        Jr = jac_reg(x)  # (8 n_q, 2K)
        H = H_data + jnp.einsum("ri,rj->ij", Jr, Jr, precision=hp)
        g = g_d + jnp.einsum("ri,r->i", Jr, rr, precision=hp)
        A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
        L = jnp.linalg.cholesky(A)
        dx = -jax.scipy.linalg.cho_solve((L, True), g)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        x_new = x + dx
        c_new = cost_of(x_new)
        accept = (c_new < cost) & jnp.isfinite(c_new)
        x = jnp.where(accept, x_new, x)
        cost = jnp.where(accept, c_new, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (x, lam, cost), None

    x0 = ctrl0.reshape(-1)
    (x, _, _), _ = jax.lax.scan(
        body, (x0, jnp.asarray(1e-4, x0.dtype), cost_of(x0)), None,
        length=num_iters,
    )
    return x.reshape(nu, nv, 2)


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
