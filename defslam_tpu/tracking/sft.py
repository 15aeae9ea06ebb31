"""Shape-from-Template: joint camera + mesh deformation solve.

The TPU equivalent of the reference's hottest code path,
``Optimizer::DefPoseOptimization`` (``Modules/Tracking/DefOptimizer.cc:
251-578``) and its hand-written g2o residuals (``Thirdparty/g2o/g2o/types/
sft_types.h``: EdgeNodesCamera 75-210, EdgeMeanCurvature 212-328,
EdgesStreching 330-379, EdgesReference 381-411).

Energy terms and weights match the reference:

- barycentric reprojection of every observed template-embedded map point,
  information invSigma2 / N with N the frame's total keypoint count
  (DefOptimizer.cc:276 ``N = pFrame->N``, 340), Huber delta sqrt(5.991)
- mean-curvature preservation with mean-value weights frozen at template
  creation, one residual per incident edge scaled by 1/rest_edge_length
  (folded into Template.curv_scale), information RegLap / |OptLap|, only
  for non-boundary nodes in the optimized set (DefOptimizer.cc:414-462)
- edge inextensibility |x_a - x_b| / rest - 1 over edges incident to the
  optimized set, information RegInex / |edges| (DefOptimizer.cc:465-507)
- a reference anchor pulling VIEWED nodes to the template's REST shape
  (Node::getInitialPose returns xO/yO/zO, Node.cc:193-198), information
  RegTemp / median_edge_length^2 (DefOptimizer.cc:364-381 with
  m = Template::getEdgeMeanSize, the median rest edge length)
- LocalZone: only nodes of observed facets plus ``local_zone`` rings of
  neighbors are free (setMeshNodes fixes all, OptLap un-fixes,
  DefOptimizer.cc:388-406 + 926-953); everything else stays put.

Solver re-design: one flat unknown vector x = [xi(6) | dnodes(3M)] (camera
in the se(3) tangent at the current estimate, nodes as displacements), and
a Levenberg-Marquardt loop whose normal equations are assembled from
ANALYTIC per-block Jacobians stacked into one dense (R, 6+3M) matrix — the
306-parameter J^T W J is a single MXU matmul per iteration, replacing the
round-1 jacfwd (306 forward passes of the whole residual stack, the frame
hot-spot).  Jacobian formulas mirror the reference's linearizeOplus
implementations (sft_types.h:137-206, 296-315, 364-377, 408).

Deliberate deviation from the reference: the final outlier gate here uses
the UN-normalized chi2 = err_px^2 * invSigma2 vs 5.991 (a ~2.4 px gate);
the reference gates on e->chi2() whose information already contains the
1/N factor (DefOptimizer.cc:515-537), i.e. a ~sqrt(5.991 N / invSigma2)
~ 80 px gate that virtually never fires.  The strict gate feeds the LOST
logic and keyframe observation tables with meaningful inlier sets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.geometry import se3
from defslam_tpu.template import mesh as meshmod

_HP = jax.lax.Precision.HIGHEST

CHI2_2DOF = 5.991


class SfTData(NamedTuple):
    """Static-shape inputs of one SfT solve.

    Template-derived fields come straight from :class:`mesh.Template`
    (use :func:`data_from_template`)."""

    K: jnp.ndarray  # (3, 3) intrinsics
    T0: jnp.ndarray  # (4, 4) initial world->camera pose
    nodes0: jnp.ndarray  # (M, 3) initial (current) node positions
    nodes_rest: jnp.ndarray  # (M, 3) rest shape — the EdgesReference anchor
    rest_len: jnp.ndarray  # (E,)
    lap_rest: jnp.ndarray  # (M,) rest curvature magnitudes
    lap_w: jnp.ndarray  # (M, R) mean-value weights (frozen)
    curv_scale: jnp.ndarray  # (M,) folded per-edge curvature scale
    interior: jnp.ndarray  # (M,) bool
    mean_edge: jnp.ndarray  # () median rest edge length
    obs_uv: jnp.ndarray  # (N, 2) observed pixels
    obs_face: jnp.ndarray  # (N,) facet id of the observed map point
    obs_bary: jnp.ndarray  # (N, 3)
    obs_invsigma2: jnp.ndarray  # (N,) per-level information
    obs_mask: jnp.ndarray  # (N,) bool
    n_kp: jnp.ndarray  # () frame keypoint count (pFrame->N normalizer)


class SfTResult(NamedTuple):
    T: jnp.ndarray  # (4, 4) optimized pose
    nodes: jnp.ndarray  # (M, 3) optimized mesh
    inlier: jnp.ndarray  # (N,) bool chi2 gate
    chi2: jnp.ndarray  # (N,) per-observation chi2 at the solution
    cost: jnp.ndarray


def data_from_template(
    tmpl: meshmod.Template,
    K: jnp.ndarray,
    T0: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_face: jnp.ndarray,
    obs_bary: jnp.ndarray,
    obs_invsigma2: jnp.ndarray,
    obs_mask: jnp.ndarray,
    n_kp: jnp.ndarray | float | None = None,
) -> SfTData:
    if n_kp is None:
        n_kp = obs_mask.sum()
    return SfTData(
        K=K,
        T0=T0,
        nodes0=tmpl.nodes,
        nodes_rest=tmpl.nodes_rest,
        rest_len=tmpl.rest_len,
        lap_rest=tmpl.lap_rest,
        lap_w=tmpl.lap_w,
        curv_scale=tmpl.curv_scale,
        interior=tmpl.interior,
        mean_edge=tmpl.mean_edge,
        obs_uv=obs_uv,
        obs_face=obs_face,
        obs_bary=obs_bary,
        obs_invsigma2=obs_invsigma2,
        obs_mask=obs_mask,
        n_kp=jnp.asarray(n_kp, jnp.float32),
    )


class _Pre(NamedTuple):
    """Per-solve constants (masks, one-hots, folded weights)."""

    fcorners: jnp.ndarray  # (N, 3) node ids of each observation's facet
    onehot_f: jnp.ndarray  # (N, 3, M)
    ringx: jnp.ndarray  # (M, 1+R) [self | ring]
    onehot_r: jnp.ndarray  # (M, 1+R, M)
    e0: jnp.ndarray  # (E,)
    e1: jnp.ndarray
    onehot_e: jnp.ndarray  # (E, 2, M)
    viewed: jnp.ndarray  # (M,) bool
    optlap: jnp.ndarray  # (M,) bool — free nodes
    w_obs_base: jnp.ndarray  # (N,)
    c_lap: jnp.ndarray  # (M,)
    c_edge: jnp.ndarray  # (E,)
    c_temp: jnp.ndarray  # ()
    col_free: jnp.ndarray  # (6+3M,) 1.0 where the parameter is free
    sw: jnp.ndarray  # (M,) sum of lap weights


def _prepare(data: SfTData, topo: meshmod.MeshTopology, cfg: Config,
             reg_temp: float) -> _Pre:
    reg = cfg.regularizer
    m = data.nodes0.shape[0]
    faces = jnp.asarray(topo.faces)
    ring = jnp.asarray(topo.ring)
    ring_mask = jnp.asarray(topo.ring_mask)
    edges = jnp.asarray(topo.edges)

    fcorners = faces[jnp.clip(data.obs_face, 0, faces.shape[0] - 1)]  # (N,3)
    touched = jnp.zeros(m, jnp.int32).at[fcorners.reshape(-1)].add(
        jnp.repeat(data.obs_mask.astype(jnp.int32), 3)
    )
    viewed = touched > 0
    optlap = viewed
    for _ in range(max(int(cfg.regularizer.local_zone), 0)):
        optlap = optlap | jnp.any(optlap[ring] & ring_mask, axis=1)

    n_optlap = jnp.maximum(jnp.sum(optlap), 1).astype(jnp.float32)
    c_lap = (
        jnp.sqrt(reg.laplacian / n_optlap)
        * data.curv_scale
        * (optlap & data.interior)
    )
    e0, e1 = edges[:, 0], edges[:, 1]
    edge_act = optlap[e0] | optlap[e1]
    n_edge = jnp.maximum(jnp.sum(edge_act), 1).astype(jnp.float32)
    c_edge = jnp.sqrt(reg.inextensibility / n_edge) * edge_act
    c_temp = jnp.sqrt(jnp.asarray(reg_temp, jnp.float32)) / jnp.maximum(
        data.mean_edge, 1e-9
    )
    w_obs_base = (
        jnp.sqrt(data.obs_invsigma2 / jnp.maximum(data.n_kp, 1.0))
        * data.obs_mask
    )
    ar = jnp.arange(m)
    onehot_f = (fcorners[:, :, None] == ar).astype(jnp.float32)
    ringx = jnp.concatenate([ar[:, None], ring], axis=1)  # (M, 1+R)
    onehot_r = (ringx[:, :, None] == ar).astype(jnp.float32)
    onehot_e = (edges[:, :, None] == ar).astype(jnp.float32)
    col_free = jnp.concatenate(
        [jnp.ones(6), jnp.repeat(optlap.astype(jnp.float32), 3)]
    )
    return _Pre(
        fcorners=fcorners,
        onehot_f=onehot_f,
        ringx=ringx,
        onehot_r=onehot_r,
        e0=e0,
        e1=e1,
        onehot_e=onehot_e,
        viewed=viewed,
        optlap=optlap,
        w_obs_base=w_obs_base,
        c_lap=c_lap,
        c_edge=c_edge,
        c_temp=c_temp,
        col_free=col_free,
        sw=jnp.maximum(jnp.sum(data.lap_w, axis=1), 1e-12),
    )


def obs_forward(T, nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Reprojection residuals (2N,) and optionally their Jacobian rows
    (2N, 6+3M) with respect to the increment [dxi | dnodes] at the current
    (T, nodes) linearization point (g2o linearizes each iteration at the
    current vertex estimates; so does this solver).  Shardable over the
    observation axis (the per-device body of the distributed solver)."""
    m = nodes.shape[0]
    n = data.obs_uv.shape[0]
    R = T[:3, :3]
    p = jnp.einsum("nk,nkd->nd", data.obs_bary, nodes[pre.fcorners])
    pc = se3.transform(T, p)
    z = pc[:, 2]
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    fx, fy = data.K[0, 0], data.K[1, 1]
    u = fx * pc[:, 0] / zs + data.K[0, 2]
    v = fy * pc[:, 1] / zs + data.K[1, 2]
    w_o = pre.w_obs_base * front
    r_obs = ((jnp.stack([u, v], axis=-1) - data.obs_uv) * w_o[:, None]).reshape(-1)
    if not with_jac:
        return r_obs, None
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(zs)
    duv_dpc = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * pc[:, 0] * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * pc[:, 1] * iz2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    duv_dpc = duv_dpc * w_o[:, None, None]
    # left-multiplicative se3: d pc / d xi = [I | -hat(pc)]
    Jxi = jnp.concatenate(
        [duv_dpc, -jnp.einsum("nai,nij->naj", duv_dpc, se3.hat(pc))], axis=-1
    )  # (N, 2, 6)
    B = jnp.einsum("nac,cd->nad", duv_dpc, R)  # (N, 2, 3) d uv / d p_world
    J_obs_nodes = jnp.einsum(
        "nac,nk,nkm->namc", B, data.obs_bary, pre.onehot_f
    )  # (N, 2, M, 3)
    J_obs = jnp.concatenate(
        [Jxi.reshape(2 * n, 6), J_obs_nodes.reshape(2 * n, 3 * m)], axis=1
    )
    return r_obs, J_obs * pre.col_free[None, :]


def reg_forward(nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Regularizer residuals [M curvature | E edges | 3M temporal] and
    optionally their Jacobian rows.  Independent of observations — the
    distributed solver evaluates these replicated, outside the psum."""
    m = nodes.shape[0]

    # --- curvature (mean-value weights, frozen)
    zc = jnp.einsum(
        "mr,mrd->md", data.lap_w, nodes[pre.ringx[:, 1:]]
    ) / pre.sw[:, None]
    dvec = nodes - zc
    dn = jnp.linalg.norm(dvec, axis=-1)
    r_curv = pre.c_lap * (dn - data.lap_rest)

    # --- inextensibility
    dv_e = nodes[pre.e0] - nodes[pre.e1]
    ln = jnp.linalg.norm(dv_e, axis=-1)
    r_edge = pre.c_edge * (ln / data.rest_len - 1.0)

    # --- temporal anchor to rest shape, viewed nodes only
    temp3 = jnp.repeat(pre.viewed.astype(jnp.float32), 3)
    r_temp = pre.c_temp * temp3 * (nodes - data.nodes_rest).reshape(-1)

    r = jnp.concatenate([r_curv, r_edge, r_temp])
    if not with_jac:
        return r, None

    # curvature rows (sft_types.h:296-315: J = dhat for the center,
    # -w_j/sum(w) * dhat for neighbors; zero when |curvature| ~ 0)
    jfac = jnp.where(dn > 1e-15, 1.0 / jnp.maximum(dn, 1e-15), 0.0)
    dhat = dvec * jfac[:, None]
    coef = jnp.concatenate(
        [jnp.ones((m, 1)), -(data.lap_w / pre.sw[:, None])], axis=1
    )  # (M, 1+R)
    Jc = (pre.c_lap[:, None] * coef)[:, :, None] * dhat[:, None, :]  # (M,1+R,3)
    Jc_dense = jnp.einsum("mko,mkj->mjo", Jc, pre.onehot_r).reshape(m, 3 * m)
    J_curv = jnp.concatenate([jnp.zeros((m, 6)), Jc_dense], axis=1)

    # edge rows (sft_types.h:364-377)
    ue = dv_e * (
        pre.c_edge / (jnp.maximum(ln, 1e-12) * data.rest_len)
    )[:, None]
    Je = jnp.stack([ue, -ue], axis=1)  # (E, 2, 3)
    Je_dense = jnp.einsum("eko,ekm->emo", Je, pre.onehot_e).reshape(-1, 3 * m)
    J_edge = jnp.concatenate(
        [jnp.zeros((Je_dense.shape[0], 6)), Je_dense], axis=1
    )

    # temporal rows: diagonal identity (sft_types.h:408)
    J_temp = jnp.concatenate(
        [jnp.zeros((3 * m, 6)), jnp.diag(pre.c_temp * temp3)], axis=1
    )
    J = jnp.concatenate([J_curv, J_edge, J_temp], axis=0)
    return r, J * pre.col_free[None, :]


def _forward(T, nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Residual stack r (R,) and, if with_jac, the dense Jacobian (R, 6+3M)
    wrt the increment at (T, nodes).

    Row layout: [2N reprojection | M curvature | E edges | 3M temporal]."""
    r_o, J_o = obs_forward(T, nodes, data, pre, with_jac)
    r_r, J_r = reg_forward(nodes, data, pre, with_jac)
    r = jnp.concatenate([r_o, r_r])
    if not with_jac:
        return r, None
    return r, jnp.concatenate([J_o, J_r], axis=0)


def residuals(T, nodes, data: SfTData, topo: meshmod.MeshTopology,
              cfg: Config, reg_temp: float):
    """Residual vector at (T, nodes) — the autodiff cross-check seam: the
    analytic J of :func:`assemble` equals jacfwd at zero increment of
    delta -> residuals(se3_exp(delta[:6]) @ T, nodes + delta[6:])."""
    pre = _prepare(data, topo, cfg, reg_temp)
    return _forward(T, nodes, data, pre, with_jac=False)[0]


def assemble(T, nodes, data: SfTData, topo: meshmod.MeshTopology,
             cfg: Config, reg_temp: float):
    """(r, J) at (T, nodes) — exposed for tests and the distributed solver."""
    pre = _prepare(data, topo, cfg, reg_temp)
    return _forward(T, nodes, data, pre, with_jac=True)


def _chi2(T, nodes, data: SfTData, topo) -> jnp.ndarray:
    from defslam_tpu.geometry import camera as cam

    pw = meshmod.facet_positions(nodes, topo, data.obs_face, data.obs_bary)
    uv = cam.project(data.K, se3.transform(T, pw))
    e2 = jnp.sum((uv - data.obs_uv) ** 2, axis=-1)
    return e2 * data.obs_invsigma2


def solve(
    data: SfTData,
    topo: meshmod.MeshTopology,
    cfg: Config,
    reg_temp: float | None = None,
) -> SfTResult:
    """Robust LM solve + chi2 outlier gate (the reference's single
    optimize(50) -> mark-outliers sequence, DefOptimizer.cc:509-577)."""
    reg = cfg.regularizer
    r_temp = reg.temporal if reg_temp is None else reg_temp
    m = data.nodes0.shape[0]
    n = data.obs_uv.shape[0]
    n_reproj = 2 * n
    delta_h = cfg.sft.huber_delta

    # Huber on the sqrt(invSigma2)-weighted pixel error.  The reference's
    # robust kernel sees the extra 1/N information factor (DefOptimizer.cc:
    # 340+342), which pushes its knee to ~sqrt(5.991 N) px — effectively
    # inactive.  Scaling the knee back by sqrt(N) gives ORB-SLAM2's
    # poseOptimization deltaMono semantics (a deliberate robustness fix).
    sqrt_nkp = jnp.sqrt(jnp.maximum(data.n_kp, 1.0))

    def hub_weights(r):
        rb = r[:n_reproj].reshape(-1, 2)
        nrm = jnp.sqrt(jnp.sum(rb * rb, axis=-1) + 1e-12) * sqrt_nkp
        h = jnp.minimum(1.0, delta_h / nrm)
        return jnp.concatenate(
            [jnp.repeat(h, 2), jnp.ones(r.shape[0] - n_reproj, r.dtype)]
        )

    def cost_of(r):
        return 0.5 * jnp.sum(hub_weights(r) * r * r)

    def run(dd: SfTData, iters: int):
        pre = _prepare(dd, topo, cfg, r_temp)
        pin = 1.0 - pre.col_free  # fixed coords get a unit diagonal
        r0, _ = _forward(dd.T0, dd.nodes0, dd, pre, with_jac=False)
        c0 = cost_of(r0)

        def cond(carry):
            T, nodes, lam, cost, i, done = carry
            return (i < iters) & ~done

        def body(carry):
            T, nodes, lam, cost, i, _ = carry
            r, J = _forward(T, nodes, dd, pre, with_jac=True)
            W = hub_weights(r)
            H = jnp.einsum("ri,r,rj->ij", J, W, J, precision=_HP)
            g = jnp.einsum("ri,r->i", J, W * r, precision=_HP)
            H = H + jnp.diag(pin)
            A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
            L = jnp.linalg.cholesky(A)
            dx = -jax.scipy.linalg.cho_solve((L, True), g)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            T_new = se3.se3_exp(dx[:6]) @ T
            nodes_new = nodes + dx[6:].reshape(m, 3)
            r_new, _ = _forward(T_new, nodes_new, dd, pre, with_jac=False)
            c_new = cost_of(r_new)
            accept = (c_new < cost) & jnp.isfinite(c_new)
            converged = accept & (cost - c_new <= 1e-6 * (cost + 1e-30))
            T = jnp.where(accept, T_new, T)
            nodes = jnp.where(accept, nodes_new, nodes)
            cost = jnp.where(accept, c_new, cost)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8
            )
            return (T, nodes, lam, cost, i + 1, converged | (lam >= 1e8))

        T, nodes, _, cost, _, _ = jax.lax.while_loop(
            cond,
            body,
            (dd.T0, dd.nodes0,
             jnp.asarray(cfg.sft.lm_lambda_init, jnp.float32),
             c0, jnp.asarray(0), jnp.asarray(False)),
        )
        return T, nodes, cost

    # stage 1: full robust solve
    T1, nodes1, _ = run(data, cfg.sft.lm_iterations)
    chi2 = _chi2(T1, nodes1, data, topo)
    inlier = data.obs_mask & (chi2 <= cfg.sft.chi2_threshold)
    # stage 2: short polish on the gated inliers (robustness addition over
    # the reference's single optimize(50); the strict gate makes it cheap)
    d2 = data._replace(T0=T1, nodes0=nodes1, obs_mask=inlier)
    T2, nodes2, cost = run(d2, max(cfg.sft.lm_iterations // 5, 5))
    chi2f = _chi2(T2, nodes2, data, topo)
    inlier_f = data.obs_mask & (chi2f <= cfg.sft.chi2_threshold)
    return SfTResult(T=T2, nodes=nodes2, inlier=inlier_f, chi2=chi2f, cost=cost)
