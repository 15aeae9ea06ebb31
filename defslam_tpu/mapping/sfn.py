"""Shape-from-Normals: integrate per-keypoint normals into a depth surface.

Equivalent of ``Modules/Mapping/ShapeFromNormals.{h,cc}``: the surface is a
1-valued bicubic B-spline gamma(u, v) (depth) over the keyframe's retina
domain; each keypoint normal contributes two linear rows

    n . ( eta(u,v) * dC_u[i] + e_u * C[i] ) = 0
    n . ( eta(u,v) * dC_v[i] + e_v * C[i] ) = 0      (obtainM, 178-260)

with eta = [u, v, 1], plus a bending penalty and one gauge row fixing the
mean control depth (estimate, 81-98).  The solution is normalized so the
median control depth is 1 (128-135), and per-keypoint 3D is
gamma * [u, v, 1] (144-165).

Here the stacked QR of the reference becomes masked normal equations +
Cholesky (one ~195x195 SPD solve), fully jittable and batched over keyframes
when needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from defslam_tpu.ops import bspline
from defslam_tpu.utils import HIGHEST, masked_median, psd_solve


# distance damping of the tilt-continuation targets: larger values fade the
# continuation back to flat closer to the supported region.  The clean-plane
# fixture rewards full continuation; the noisy production pipeline (imperfect
# normals, repeated swaps) rewards damping — see BASELINE.md round-5 notes.
TILT_SHRINK = 0.5


class SfNResult(NamedTuple):
    ctrl: jnp.ndarray  # (nu, nv) control depths, median-normalized
    depth: jnp.ndarray  # (N,) depth at the keypoints
    xyz: jnp.ndarray  # (N, 3) camera-frame surface points gamma*[u,v,1]
    ok: jnp.ndarray  # () bool — solve finite & positive-definite-ish


def solve(
    uv: jnp.ndarray,  # (N, 2) retina keypoints
    normals: jnp.ndarray,  # (N, 3) surface normals at those keypoints
    mask: jnp.ndarray,  # (N,) bool — keypoints with a valid normal
    dom: jnp.ndarray,
    nu: int,
    nv: int,
    bending: jnp.ndarray,  # (K, K) precomputed bending matrix for dom
    bending_weight: float,
    mean_depth: float | jnp.ndarray = 1.0,
    flat_extension: float = 0.0,
    tilt_extension: float = 0.0,
    ext_dom: jnp.ndarray | None = None,
) -> SfNResult:
    """ext_dom: domain covered by the extension-prior grid (defaults to
    ``dom``).  With per-keyframe bbox domains the spline lives on the KF's
    keypoint bbox while downstream template regeneration evaluates it over
    the camera-wide domain — the prior grid must span the EVALUATED region
    (colocation rows outside the knot span are the polynomial extension of
    the edge cells, still linear in the control points)."""
    k = nu * nv
    n = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9
    )
    C = bspline.coloc_2d(uv[:, 0], uv[:, 1], dom, nu, nv)  # (N, K)
    Cu = bspline.coloc_2d(uv[:, 0], uv[:, 1], dom, nu, nv, 1, 0)
    Cv = bspline.coloc_2d(uv[:, 0], uv[:, 1], dom, nu, nv, 0, 1)
    eta_n = (
        n[:, 0] * uv[:, 0] + n[:, 1] * uv[:, 1] + n[:, 2]
    )  # n . [u, v, 1]
    row_u = eta_n[:, None] * Cu + n[:, 0:1] * C  # (N, K)
    row_v = eta_n[:, None] * Cv + n[:, 1:2] * C
    w = mask.astype(C.dtype)

    # normal equations of [rows_u; rows_v; lambda*B; gauge]
    AtA = (
        jnp.einsum("ni,n,nj->ij", row_u, w, row_u, precision=HIGHEST)
        + jnp.einsum("ni,n,nj->ij", row_v, w, row_v, precision=HIGHEST)
        + (bending_weight**2) * (bending @ bending)
    )
    ones = jnp.ones((k,), C.dtype)
    rhs = jnp.zeros((k,), C.dtype)
    tilt = None
    if flat_extension > 0.0:
        # extension prior OUTSIDE the normal support: a linear depth tilt
        # lies in the bending penalty's NULL SPACE, so without data the
        # spline extrapolates an arbitrary (and, over repeated
        # re-templating, compounding) tilt into newly explored regions —
        # the round-4 diagnosed accuracy limiter.  Weak gradient rows at
        # unsupported grid points pin the extension instead (the
        # reference's ShapeFromNormals has no equivalent and shares the
        # free-tilt behavior).  Support is a soft RBF coverage of valid
        # normal keypoints, scale = one spline cell.
        #
        # The gradient TARGET is 0 (constant depth) when tilt_extension=0;
        # with tilt_extension > 0 it is a distance-shrunk CONTINUATION of
        # the supported region's own tilt: each normal implies a
        # log-gradient d(gamma)/du = -n_u / (n.eta) * gamma at its
        # keypoint, and each unsupported grid point targets the RBF-mean of
        # nearby implied gradients, fading back to flat where no support is
        # near.  This extends the surface across the exploration boundary
        # at its local slope instead of flattening it — the round-4
        # constant-depth bias at template swaps (stress ATE 0.158) comes
        # precisely from the flat target.
        edom = dom if ext_dom is None else ext_dom
        g = 16
        gu = jnp.linspace(edom[0], edom[1], g)
        gv = jnp.linspace(edom[2], edom[3], g)
        GU, GV = jnp.meshgrid(gu, gv, indexing="ij")
        gq = jnp.stack([GU.reshape(-1), GV.reshape(-1)], axis=-1)  # (G, 2)
        cell2 = (
            ((dom[1] - dom[0]) / (nu - 3)) ** 2
            + ((dom[3] - dom[2]) / (nv - 3)) ** 2
        )
        d2 = jnp.sum((gq[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
        support = jnp.minimum(
            jnp.sum(jnp.exp(-d2 / cell2) * w[None, :], axis=1), 1.0
        )
        wf = flat_extension * (1.0 - support)  # (G,)
        Gu = bspline.coloc_2d(gq[:, 0], gq[:, 1], dom, nu, nv, 1, 0)
        Gv = bspline.coloc_2d(gq[:, 0], gq[:, 1], dom, nu, nv, 0, 1)
        AtA = (
            AtA
            + jnp.einsum("gi,g,gj->ij", Gu, wf * wf, Gu, precision=HIGHEST)
            + jnp.einsum("gi,g,gj->ij", Gv, wf * wf, Gv, precision=HIGHEST)
        )
        if tilt_extension > 0.0:
            # continuation targets in INVERSE depth: the normal rows give
            # the log-gradient gamma_u / gamma = -n_u / (n.eta) exactly,
            # so sigma_u = d(1/gamma)/du = n_u / (n.eta * gamma).  A plane
            # is exactly LINEAR in 1/gamma, so extending 1/gamma at the
            # supported region's kernel-averaged slope reconstructs planar
            # continuations exactly; the absolute-gradient target is then
            # gamma_u = -sigma_bar * gamma(g)^2, applied by fixed-point
            # refinement passes below (rhs-only re-solves with the same
            # normal matrix).  Clipped against grazing rays.
            safe = jnp.where(jnp.abs(eta_n) > 1e-3, eta_n, 1e-3)
            s_u = jnp.clip(-n[:, 0] / safe, -2.0, 2.0)  # gamma_u / gamma
            s_v = jnp.clip(-n[:, 1] / safe, -2.0, 2.0)
            # wider kernel for the slope estimate than for support
            # detection (tau = 4 cells), shrunk toward 0 as total nearby
            # weight vanishes
            ker = jnp.exp(-d2 / (4.0 * cell2)) * w[None, :]  # (G, N)
            ksum = jnp.maximum(jnp.sum(ker, axis=1), 1e-6)
            shrink = tilt_extension * ksum / (ksum + TILT_SHRINK)
            G0 = bspline.coloc_2d(gq[:, 0], gq[:, 1], dom, nu, nv)
            tilt = (G0, Gu, Gv, wf, ker, ksum, shrink, s_u, s_v)
    AtA = AtA + jnp.outer(ones, ones)
    rhs = rhs + ones * (k * mean_depth)
    base_rhs = rhs

    def _normalize(ctrl):
        med = masked_median(ctrl, jnp.ones_like(ctrl, dtype=bool))
        corr = jnp.where(jnp.abs(med) > 1e-9, 1.0 / med, 1.0)
        return ctrl * corr

    # pass 0: flat targets (gradient 0) — also the final answer when
    # tilt_extension == 0
    ctrl = _normalize(psd_solve(AtA, rhs, jitter=1e-7 * k))
    if tilt is not None:
        G0, Gu, Gv, wf, ker, ksum, shrink, s_u, s_v = tilt
        for _ in range(2):
            # per-point inverse-depth slope from the SOLVED depth at the
            # keypoints, kernel-averaged onto the grid
            g_kp = jnp.clip(C @ ctrl, 0.3, 3.0)
            sig_u = (ker @ (s_u / g_kp)) / ksum
            sig_v = (ker @ (s_v / g_kp)) / ksum
            g_est = jnp.clip(G0 @ ctrl, 0.3, 3.0)
            tgt_u = shrink * sig_u * g_est * g_est
            tgt_v = shrink * sig_v * g_est * g_est
            rhs2 = (
                base_rhs
                + Gu.T @ (wf * wf * tgt_u)
                + Gv.T @ (wf * wf * tgt_v)
            )
            ctrl = _normalize(psd_solve(AtA, rhs2, jitter=1e-7 * k))
    depth = (C @ ctrl[:, None])[:, 0]
    xyz = jnp.stack([uv[:, 0] * depth, uv[:, 1] * depth, depth], axis=-1)
    ok = jnp.all(jnp.isfinite(ctrl)) & (jnp.sum(mask) >= 3)
    return SfNResult(ctrl=ctrl.reshape(nu, nv), depth=depth, xyz=xyz, ok=ok)
