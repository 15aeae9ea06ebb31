"""Schur-complement bundle adjustment, Sim3 refinement, essential graph.

TPU re-design of the reference's rigid g2o optimizer suite
(``Thirdparty/ORBSLAM_2/src/Optimizer.cc``): ``LocalBundleAdjustment``
(Optimizer.cc:447-771 schedule: 5 LM iterations, chi2 gate, 10 more, erase
outlier observations), ``GlobalBundleAdjustemnt``/``BundleAdjustment``
(Optimizer.cc:40-234), ``OptimizeSim3`` (Optimizer.cc:1036-1233) and
``OptimizeEssentialGraph`` (Optimizer.cc:773-1034).

The reference hands g2o a pointer graph and lets its generic sparse block
solver discover the camera/point structure at runtime.  Here the structure
is static and exploited directly: observations live in a dense (C, K)
table (camera slot x keypoint slot, point ids from the keyframe store), the
point-block Hessian is accumulated with one ``segment_sum``, and the Schur
complement onto the camera block is two einsums — a (6C, 6C) dense Cholesky
instead of a sparse factorization.  All observation residuals, analytic
Jacobians and robust weights are evaluated in one batched pass per LM
iteration (the MXU sees the einsums; no per-edge host loop exists).

Parity thresholds: Huber delta sqrt(5.991) (Optimizer.cc thresholds for
monocular edges), chi2 gate 5.991 * sigma2[level], positive-depth gate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.geometry import se3
from defslam_tpu.ops import lm

_HP = jax.lax.Precision.HIGHEST

CHI2_MONO = 5.991
HUBER_DELTA = 2.4477  # sqrt(5.991)


class BAProblem(NamedTuple):
    """Static-shape bundle adjustment problem.

    C cameras x K keypoint slots of observations; P points.  ``pid`` maps
    each (camera, keypoint) observation to a point id (-1 = no observation).
    Fixed cameras/points contribute residuals but no update (g2o setFixed).
    """

    poses: jnp.ndarray  # (C, 4, 4) world->camera
    xyz: jnp.ndarray  # (P, 3)
    pid: jnp.ndarray  # (C, K) int32, -1 = none
    uv: jnp.ndarray  # (C, K, 2)
    inv_sigma2: jnp.ndarray  # (C, K)
    obs_mask: jnp.ndarray  # (C, K) bool
    cam_free: jnp.ndarray  # (C,) bool
    point_free: jnp.ndarray  # (P,) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray  # (C, 4, 4)
    xyz: jnp.ndarray  # (P, 3)
    inlier: jnp.ndarray  # (C, K) bool — surviving observations
    cost: jnp.ndarray  # () final robust cost
    n_inliers: jnp.ndarray  # () int32


def _obs_terms(poses, xyz, K, pid, uv):
    """Residuals + analytic camera/point Jacobians for every (c, k) slot.

    Left-multiplicative SE(3) perturbation [rho, phi] (matches
    se3.retract): d(exp(xi) p)/d xi = [I | -hat(p)].
    """
    p_safe = jnp.clip(pid, 0)
    X = xyz[p_safe]  # (C, K, 3)
    R = poses[:, :3, :3]
    pc = jnp.einsum("cij,ckj->cki", R, X, precision=_HP) + poses[:, None, :3, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    fx, fy = K[0, 0], K[1, 1]
    u = fx * x / zs + K[0, 2]
    v = fy * y / zs + K[1, 2]
    r = jnp.stack([u, v], axis=-1) - uv  # (C, K, 2)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    duv_dpc = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )  # (C, K, 2, 3)
    # camera block: [I | -hat(pc)]
    hat_pc = se3.hat(pc)  # (C, K, 3, 3)
    Jc = jnp.concatenate(
        [duv_dpc, -jnp.einsum("ckai,ckij->ckaj", duv_dpc, hat_pc, precision=_HP)],
        axis=-1,
    )  # (C, K, 2, 6)
    Jp = jnp.einsum("ckai,cij->ckaj", duv_dpc, R, precision=_HP)  # (C, K, 2, 3)
    return r, Jc, Jp, z


def _robust_cost(chi2, w_valid, delta):
    """Sum of Huber rho over valid observations (g2o robust kernel)."""
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    rho = jnp.where(chi2 <= delta * delta, chi2, 2.0 * delta * s - delta * delta)
    return jnp.sum(rho * w_valid)


def _gn_step(problem: BAProblem, K, lam, huber_delta):
    """One damped Schur-complement Gauss-Newton step.

    Returns candidate (poses, xyz) and the current robust cost.
    """
    poses, xyz = problem.poses, problem.xyz
    C, Kk = problem.pid.shape
    P = xyz.shape[0]
    r, Jc, Jp, z = _obs_terms(poses, xyz, K, problem.pid, problem.uv)
    valid = problem.obs_mask & (problem.pid >= 0) & (z > 1e-6)
    vf = valid.astype(jnp.float32)
    chi2 = jnp.sum(r * r, axis=-1) * problem.inv_sigma2
    cost = _robust_cost(chi2, vf, huber_delta)
    # IRLS weight: information * Huber weight * validity
    hub = jnp.minimum(1.0, huber_delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    w = problem.inv_sigma2 * hub * vf  # (C, K)

    cam_f = problem.cam_free.astype(jnp.float32)
    pt_f = problem.point_free.astype(jnp.float32)
    Jc_e = Jc * cam_f[:, None, None, None]
    Jp_e = Jp * pt_f[jnp.clip(problem.pid, 0)][..., None, None]

    U = jnp.einsum("ckai,ck,ckaj->cij", Jc_e, w, Jc_e, precision=_HP)  # (C,6,6)
    b_c = jnp.einsum("ckai,ck,cka->ci", Jc_e, w, r, precision=_HP)  # (C,6)

    seg_p = jnp.where(valid, problem.pid, P).reshape(-1)  # (C*K,)
    Vp_flat = jnp.einsum("ckai,ck,ckaj->ckij", Jp_e, w, Jp_e, precision=_HP)
    V = jax.ops.segment_sum(Vp_flat.reshape(-1, 9), seg_p, num_segments=P + 1)[
        :P
    ].reshape(P, 3, 3)
    bp_flat = jnp.einsum("ckai,ck,cka->cki", Jp_e, w, r, precision=_HP)
    b_p = jax.ops.segment_sum(bp_flat.reshape(-1, 3), seg_p, num_segments=P + 1)[:P]
    # camera-point coupling blocks, grouped per point: A[p, c] = sum_k Jc^T W Jp
    Wcp = jnp.einsum("ckai,ck,ckaj->ckij", Jc_e, w, Jp_e, precision=_HP)  # (C,K,6,3)
    cam_idx = jnp.broadcast_to(jnp.arange(C)[:, None], (C, Kk))
    seg_pc = jnp.where(valid, problem.pid * C + cam_idx, P * C).reshape(-1)
    A = jax.ops.segment_sum(
        Wcp.reshape(-1, 18), seg_pc, num_segments=P * C + 1
    )[: P * C].reshape(P, C, 6, 3)

    # Marquardt damping + identity for fixed/unconstrained blocks
    eyeC = jnp.eye(6, dtype=U.dtype)
    U_d = U + lam * U * eyeC[None] + 1e-8 * eyeC[None]
    U_d = U_d + (1.0 - cam_f)[:, None, None] * eyeC[None]
    eyeP = jnp.eye(3, dtype=V.dtype)
    V_d = V + lam * V * eyeP[None] + 1e-8 * eyeP[None]
    constrained = (jnp.abs(jnp.diagonal(V, axis1=-2, axis2=-1)).sum(-1) > 0).astype(
        V.dtype
    )
    V_d = V_d + (1.0 - constrained * pt_f)[:, None, None] * eyeP[None]

    Vinv = jnp.linalg.inv(V_d)  # (P, 3, 3) — batched tiny inverses
    Y = jnp.einsum("pcij,pjk->pcik", A, Vinv, precision=_HP)  # (P, C, 6, 3)
    S_off = jnp.einsum("pcik,pdjk->cidj", Y, A, precision=_HP)  # (C,6,D,6)
    S = jnp.zeros_like(S_off)
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].set(U_d)
    S = (S - S_off).reshape(6 * C, 6 * C)
    rhs = b_c - jnp.einsum("pcik,pk->ci", Y, b_p, precision=_HP)  # (C, 6)
    L = jnp.linalg.cholesky(S + 1e-8 * jnp.eye(6 * C))
    d_cam = -jax.scipy.linalg.cho_solve((L, True), rhs.reshape(-1)).reshape(C, 6)
    d_cam = jnp.where(jnp.isfinite(d_cam), d_cam, 0.0) * cam_f[:, None]
    d_pt = -jnp.einsum(
        "pij,pj->pi",
        Vinv,
        b_p + jnp.einsum("pcki,ck->pi", A, d_cam, precision=_HP),
        precision=_HP,
    )
    d_pt = jnp.where(jnp.isfinite(d_pt), d_pt, 0.0) * (constrained * pt_f)[:, None]

    poses_new = se3.se3_exp(d_cam) @ poses
    xyz_new = xyz + d_pt
    return poses_new, xyz_new, cost


def _cost_at(problem: BAProblem, K, poses, xyz, huber_delta):
    r, _, _, z = _obs_terms(poses, xyz, K, problem.pid, problem.uv)
    valid = problem.obs_mask & (problem.pid >= 0) & (z > 1e-6)
    chi2 = jnp.sum(r * r, axis=-1) * problem.inv_sigma2
    return _robust_cost(chi2, valid.astype(jnp.float32), huber_delta)


def _chi2_of(problem: BAProblem, K, poses, xyz):
    r, _, _, z = _obs_terms(poses, xyz, K, problem.pid, problem.uv)
    chi2 = jnp.sum(r * r, axis=-1) * problem.inv_sigma2
    return jnp.where(z > 1e-6, chi2, jnp.inf)


def _lm_phase(problem: BAProblem, K, iters: int, huber_delta, lam0=1e-4):
    """Fixed-length accept/reject LM loop (one _gn_step per iteration)."""

    def body(carry, _):
        poses, xyz, lam = carry
        prob = problem._replace(poses=poses, xyz=xyz)
        poses_n, xyz_n, cost = _gn_step(prob, K, lam, huber_delta)
        cost_n = _cost_at(problem, K, poses_n, xyz_n, huber_delta)
        accept = jnp.isfinite(cost_n) & (cost_n < cost)
        poses = jnp.where(accept, poses_n, poses)
        xyz = jnp.where(accept, xyz_n, xyz)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (poses, xyz, lam), cost_n

    (poses, xyz, _), _ = jax.lax.scan(
        body,
        (problem.poses, problem.xyz, jnp.asarray(lam0, jnp.float32)),
        None,
        length=iters,
    )
    return poses, xyz


def ba_solve(
    problem: BAProblem,
    K: jnp.ndarray,
    iters_first: int = 5,
    iters_second: int = 10,
    chi2_th: float = CHI2_MONO,
    huber_delta: float = HUBER_DELTA,
) -> BAResult:
    """The reference LocalBundleAdjustment schedule (Optimizer.cc:447-771):
    optimize ``iters_first``, drop chi2 > 5.991 observations, optimize
    ``iters_second`` on survivors, return final inlier set.
    """
    poses, xyz = _lm_phase(problem, K, iters_first, huber_delta)
    chi2 = _chi2_of(problem, K, poses, xyz)
    keep = problem.obs_mask & (problem.pid >= 0) & (chi2 <= chi2_th)
    prob2 = problem._replace(poses=poses, xyz=xyz, obs_mask=keep)
    # second phase runs WITHOUT the robust kernel on the gated inliers, like
    # the reference's e->setRobustKernel(0) refit (Optimizer.cc:447-771):
    # a huge delta makes the Huber effectively quadratic
    poses, xyz = _lm_phase(prob2, K, iters_second, 1e6)
    chi2 = _chi2_of(prob2, K, poses, xyz)
    inlier = keep & (chi2 <= chi2_th)
    cost = _cost_at(prob2, K, poses, xyz, huber_delta)
    return BAResult(
        poses=poses,
        xyz=xyz,
        inlier=inlier,
        cost=cost,
        n_inliers=jnp.sum(inlier),
    )


# ------------------------------------------------------------------ Sim3 ----


class Sim3Result(NamedTuple):
    s: jnp.ndarray  # ()
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    inlier: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # ()


def optimize_sim3(
    K: jnp.ndarray,
    s0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    xyz1: jnp.ndarray,  # (N, 3) matched points in camera-1 frame
    xyz2: jnp.ndarray,  # (N, 3) matched points in camera-2 frame
    uv1: jnp.ndarray,  # (N, 2) observations in image 1
    uv2: jnp.ndarray,  # (N, 2) observations in image 2
    inv_sigma2_1: jnp.ndarray,  # (N,)
    inv_sigma2_2: jnp.ndarray,  # (N,)
    mask: jnp.ndarray,  # (N,)
    chi2_th: float = 10.0,  # th2=10 passed by LoopClosing.cc:323
    num_iters: int = 20,
) -> Sim3Result:
    """Refine the camera-2 -> camera-1 Sim3 (g2o ``OptimizeSim3``,
    Optimizer.cc:1036-1233): bidirectional reprojection residuals, Huber,
    one mid-way chi2 re-gate.  All N edges evaluated in one batched pass.
    """
    n = xyz1.shape[0]

    def residuals(params, m):
        s, R, t = params
        p1 = se3.sim3_apply(s[None], R, t, xyz2[None])[0]  # S12 * x2
        sinv = 1.0 / s
        p2 = sinv * jnp.einsum("ji,nj->ni", R, xyz1 - t[None], precision=_HP)
        z1 = jnp.where(jnp.abs(p1[:, 2]) < 1e-6, 1e-6, p1[:, 2])
        z2 = jnp.where(jnp.abs(p2[:, 2]) < 1e-6, 1e-6, p2[:, 2])
        proj1 = jnp.stack(
            [K[0, 0] * p1[:, 0] / z1 + K[0, 2], K[1, 1] * p1[:, 1] / z1 + K[1, 2]],
            axis=-1,
        )
        proj2 = jnp.stack(
            [K[0, 0] * p2[:, 0] / z2 + K[0, 2], K[1, 1] * p2[:, 1] / z2 + K[1, 2]],
            axis=-1,
        )
        r1 = (proj1 - uv1) * jnp.sqrt(inv_sigma2_1 * m)[:, None]
        r2 = (proj2 - uv2) * jnp.sqrt(inv_sigma2_2 * m)[:, None]
        return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

    def solve_round(s, R, t, m, iters):
        def rfn(xi):
            ds, dR, dt = se3.sim3_exp(xi)
            return residuals((s * ds, dR @ R, ds * dR @ t + dt), m)

        res = lm.lm_solve(
            rfn,
            jnp.zeros(7),
            num_iters=iters,
            weight_fn=lambda r: lm.huber_block_weights(r, 2, jnp.sqrt(chi2_th)),
        )
        ds, dR, dt = se3.sim3_exp(res.x)
        return s * ds, dR @ R, ds * dR @ t + dt

    def chi2_of(s, R, t):
        r = residuals((s, R, t), jnp.ones(n))
        r = r.reshape(2, n, 2)
        c1 = jnp.sum(r[0] ** 2, axis=-1)
        c2 = jnp.sum(r[1] ** 2, axis=-1)
        return jnp.maximum(c1, c2)

    m = mask.astype(jnp.float32)
    s, R, t = solve_round(
        jnp.asarray(s0, jnp.float32), R0, t0, m, num_iters // 2
    )
    m = m * (chi2_of(s, R, t) <= chi2_th)
    s, R, t = solve_round(s, R, t, m, num_iters)
    inlier = (m > 0) & (chi2_of(s, R, t) <= chi2_th)
    return Sim3Result(s=s, R=R, t=t, inlier=inlier, n_inliers=jnp.sum(inlier))


# -------------------------------------------------------- essential graph ----


def _sim3_inverse(s, R, t):
    si = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    return si, Rt, -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def _sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) o (sb,Rb,tb): apply b first, then a."""
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )


class EssentialGraph(NamedTuple):
    """Pose-graph problem over keyframe Sim3 poses (world->camera).

    Edges carry the relative measurement S_ji = S_jw o S_iw^{-1} captured at
    build time (spanning tree + covisibility + loop edges,
    Optimizer.cc:773-1034).  Static edge capacity with a validity mask.
    """

    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    meas_s: jnp.ndarray  # (E,)
    meas_R: jnp.ndarray  # (E, 3, 3)
    meas_t: jnp.ndarray  # (E, 3)
    edge_mask: jnp.ndarray  # (E,) bool
    fixed: jnp.ndarray  # (F,) bool — e.g. loop keyframe held fixed


def build_edges_from_poses(edge_i, edge_j, s_w, R_w, t_w, edge_mask, fixed):
    """Measurements from current (uncorrected) poses: S_ji = S_jw o S_iw^-1."""
    si, Ri, ti = _sim3_inverse(s_w[edge_i], R_w[edge_i], t_w[edge_i])
    ms, mR, mt = _sim3_compose(s_w[edge_j], R_w[edge_j], t_w[edge_j], si, Ri, ti)
    return EssentialGraph(
        edge_i=edge_i,
        edge_j=edge_j,
        meas_s=ms,
        meas_R=mR,
        meas_t=mt,
        edge_mask=edge_mask,
        fixed=fixed,
    )


def optimize_essential_graph(
    graph: EssentialGraph,
    s0: jnp.ndarray,  # (F,) initial (possibly loop-corrected) scales
    R0: jnp.ndarray,  # (F, 3, 3)
    t0: jnp.ndarray,  # (F, 3)
    num_iters: int = 20,
):
    """Sim3 pose-graph optimization (``OptimizeEssentialGraph``,
    Optimizer.cc:773-1034).  g2o minimizes || log(S_ji o S_iw o S_wj) ||^2
    per edge; here the error chart is the equivalent [so3_log(R_err), t_err,
    log(s_err)] local parametrization (vanishes at the same zero set, valid
    near identity), the state is a (F, 7) tangent stacked into one dense LM
    solve — at F <= 24 keyframes a dense (7F) system is far below MXU scale
    and one factorization replaces g2o's sparse machinery.

    Returns corrected (s, R, t) per keyframe.
    """
    F = s0.shape[0]
    free = (~graph.fixed).astype(jnp.float32)
    em = graph.edge_mask.astype(jnp.float32)

    def poses_of(xi_flat):
        xi = xi_flat.reshape(F, 7) * free[:, None]
        ds, dR, dt = jax.vmap(se3.sim3_exp)(xi)
        return _sim3_compose(ds, dR, dt, s0, R0, t0)

    def residual_fn(xi_flat):
        s, R, t = poses_of(xi_flat)
        si, Ri, ti = _sim3_inverse(s[graph.edge_i], R[graph.edge_i], t[graph.edge_i])
        ps, pR, pt = _sim3_compose(s[graph.edge_j], R[graph.edge_j], t[graph.edge_j], si, Ri, ti)
        # error = meas^{-1} o predicted, mapped through the identity chart
        es, eR, et = _sim3_compose(*_sim3_inverse(graph.meas_s, graph.meas_R, graph.meas_t), ps, pR, pt)
        r = jnp.concatenate(
            [
                jax.vmap(se3.so3_log)(eR),
                et,
                jnp.log(jnp.maximum(es, 1e-12))[:, None],
            ],
            axis=-1,
        )  # (E, 7)
        # pin the (masked-out) fixed-pose tangent coords so the normal
        # matrix stays full rank — they do not affect any edge residual
        pin = (xi_flat.reshape(F, 7) * graph.fixed[:, None]).reshape(-1)
        return jnp.concatenate([(r * em[:, None]).reshape(-1), pin])

    res = lm.lm_solve(residual_fn, jnp.zeros(F * 7), num_iters=num_iters)
    return poses_of(res.x)


def sim3_from_se3(T: jnp.ndarray):
    """(F, 4, 4) SE3 -> unit-scale Sim3 triplet."""
    return (
        jnp.ones(T.shape[:-2], T.dtype),
        T[..., :3, :3],
        T[..., :3, 3],
    )


def se3_from_sim3(s, R, t):
    """Sim3 -> SE3 with the scale folded into translation (the reference's
    CorrectLoop does exactly this when writing back keyframe poses,
    LoopClosing.cc:554-561: [R t/s])."""
    T = jnp.zeros(s.shape + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t / s[..., None])
    T = T.at[..., 3, 3].set(1.0)
    return T
