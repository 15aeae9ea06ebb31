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

Solver re-design (third iteration): the normal equations H dx = -g are
assembled from analytic per-term blocks with ZERO gathers or scatters.
Barycentric interpolation and every node-block reduction ride a
precomputed dense blend matrix bmat (N, M) — plain MXU matmuls totalling
~300 MFLOP per iteration — and the curvature/edge terms contract one-hot
ring/edge maps the same way; the dense (6+3M, 6+3M) system (tiny at
M=100) is solved by Cholesky per LM iteration.  The progression, each
step measured on the TPU: round-1 dense (R, 6+3M) Jacobian (97%
structural zeros, HBM-bound) -> round-3 per-facet segment_sum blocks
(~3x faster, but TPU scatter-adds serialize) -> round-4 dense-blend
matmuls (another ~2x per iteration; the per-frame solve is latency-bound,
so op count is the currency).  Jacobian formulas mirror the reference's
linearizeOplus implementations (sft_types.h:137-206, 296-315, 364-377,
408); the dense-J path survives as :func:`assemble` purely as the
autodiff cross-check seam for tests.

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
    """Per-solve constants (masks, index tables, folded weights)."""

    fcorners: jnp.ndarray  # (N, 3) node ids of each observation's facet
    fid: jnp.ndarray  # (N,) facet id, F for masked observations
    ringx: jnp.ndarray  # (M, 1+R) [self | ring]
    e0: jnp.ndarray  # (E,)
    e1: jnp.ndarray
    viewed: jnp.ndarray  # (M,) bool
    optlap: jnp.ndarray  # (M,) bool — free nodes
    w_obs_base: jnp.ndarray  # (N,)
    c_lap: jnp.ndarray  # (M,)
    c_edge: jnp.ndarray  # (E,)
    c_temp: jnp.ndarray  # ()
    col_free: jnp.ndarray  # (6+3M,) 1.0 where the parameter is free
    sw: jnp.ndarray  # (M,) sum of lap weights
    # one-hot scatter maps: TPU scatter-adds (segment_sum) serialize, so
    # the H assembly contracts these with einsum on the MXU instead —
    # ~2x faster per LM iteration at the shipped sizes (measured r4)
    oh_ring: jnp.ndarray  # (M, 1+R, M) ring slot -> node
    oh_ev: jnp.ndarray  # (E, 2, M) edge endpoint -> node
    # dense barycentric blend: p = bmat @ nodes reproduces the per-obs
    # facet interpolation exactly (bmat[n, m] = bary weight of node m in
    # obs n, nonzero only at the 3 facet corners).  Turns EVERY gather and
    # scatter of the observation half into plain (N, M) matmuls — the
    # per-LM-iteration graph collapses to ~10 MXU-shaped ops
    bmat: jnp.ndarray  # (N, M)


def _prepare(data: SfTData, topo: meshmod.MeshTopology, cfg: Config,
             reg_temp: float, axis_name: str | None = None) -> _Pre:
    """Per-solve constants.  With ``axis_name`` set, the observation axis of
    `data` is a shard_map shard: the viewed-node counts (the only
    observation-global reduction here) are psum'd so every device derives
    the identical LocalZone mask and weight normalizations."""
    reg = cfg.regularizer
    m = data.nodes0.shape[0]
    faces = jnp.asarray(topo.faces)
    ring = jnp.asarray(topo.ring)
    ring_mask = jnp.asarray(topo.ring_mask)
    edges = jnp.asarray(topo.edges)
    n_faces = topo.faces.shape[0]

    fcorners = faces[jnp.clip(data.obs_face, 0, n_faces - 1)]  # (N,3)
    fid = jnp.where(
        data.obs_mask & (data.obs_face >= 0),
        jnp.clip(data.obs_face, 0, n_faces - 1),
        n_faces,
    )
    touched = jnp.zeros(m, jnp.int32).at[fcorners.reshape(-1)].add(
        jnp.repeat(data.obs_mask.astype(jnp.int32), 3)
    )
    if axis_name is not None:
        touched = jax.lax.psum(touched, axis_name)
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
    ringx = jnp.concatenate([ar[:, None], ring], axis=1)  # (M, 1+R)
    col_free = jnp.concatenate(
        [jnp.ones(6), jnp.repeat(optlap.astype(jnp.float32), 3)]
    )
    return _Pre(
        fcorners=fcorners,
        fid=fid,
        ringx=ringx,
        e0=e0,
        e1=e1,
        viewed=viewed,
        optlap=optlap,
        w_obs_base=w_obs_base,
        c_lap=c_lap,
        c_edge=c_edge,
        c_temp=c_temp,
        col_free=col_free,
        sw=jnp.maximum(jnp.sum(data.lap_w, axis=1), 1e-12),
        oh_ring=jax.nn.one_hot(ringx, m),
        oh_ev=jax.nn.one_hot(edges, m),
        bmat=jnp.einsum(
            "nk,nkm->nm", data.obs_bary, jax.nn.one_hot(fcorners, m)
        ),
    )


# ------------------------------------------------- block normal equations --


def obs_cost(T, nodes, data: SfTData, pre: _Pre, huber_delta: float):
    """Robust observation cost at (T, nodes) — the accept-test half of an LM
    iteration (no Jacobians).  Gather-free via pre.bmat."""
    p = jnp.einsum("nm,md->nd", pre.bmat, nodes, precision=_HP)
    pc = se3.transform(T, p)
    z = pc[:, 2]
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    fx, fy = data.K[0, 0], data.K[1, 1]
    u = fx * pc[:, 0] / zs + data.K[0, 2]
    v = fy * pc[:, 1] / zs + data.K[1, 2]
    w_o = pre.w_obs_base * front
    r2 = (jnp.stack([u, v], axis=-1) - data.obs_uv) * w_o[:, None]
    nrm = jnp.sqrt(jnp.sum(r2 * r2, axis=-1) + 1e-12) * jnp.sqrt(
        jnp.maximum(data.n_kp, 1.0)
    )
    hub = jnp.minimum(1.0, huber_delta / nrm)
    return 0.5 * jnp.sum(hub * jnp.sum(r2 * r2, axis=-1))


def reg_terms(nodes, data: SfTData, pre: _Pre):
    """Regularizer residuals + analytic blocks (shared by cost and normal
    equations; observation-independent, evaluated replicated when sharded).

    Returns (r_curv (M,), Jc (M,1+R,3), r_edge (E,), Je (E,2,3),
    r_temp (M,3), tw (M,))."""
    m = nodes.shape[0]
    zc = jnp.einsum(
        "mr,mrd->md", data.lap_w, nodes[pre.ringx[:, 1:]]
    ) / pre.sw[:, None]
    dvec = nodes - zc
    dn = jnp.linalg.norm(dvec, axis=-1)
    r_curv = pre.c_lap * (dn - data.lap_rest)
    jfac = jnp.where(dn > 1e-15, 1.0 / jnp.maximum(dn, 1e-15), 0.0)
    dhat = dvec * jfac[:, None]
    coef = jnp.concatenate(
        [jnp.ones((m, 1)), -(data.lap_w / pre.sw[:, None])], axis=1
    )  # (M, 1+R)
    Jc = (pre.c_lap[:, None] * coef)[:, :, None] * dhat[:, None, :]

    dv_e = nodes[pre.e0] - nodes[pre.e1]
    ln = jnp.linalg.norm(dv_e, axis=-1)
    r_edge = pre.c_edge * (ln / data.rest_len - 1.0)
    ue = dv_e * (
        pre.c_edge / (jnp.maximum(ln, 1e-12) * data.rest_len)
    )[:, None]
    Je = jnp.stack([ue, -ue], axis=1)  # (E, 2, 3)

    tw = pre.c_temp * pre.viewed.astype(jnp.float32)  # (M,)
    r_temp = tw[:, None] * (nodes - data.nodes_rest)  # (M, 3)
    return r_curv, Jc, r_edge, Je, r_temp, tw


def reg_cost(nodes, data: SfTData, pre: _Pre):
    r_curv, _, r_edge, _, r_temp, _ = reg_terms(nodes, data, pre)
    return 0.5 * (
        jnp.sum(r_curv * r_curv) + jnp.sum(r_edge * r_edge)
        + jnp.sum(r_temp * r_temp)
    )


def reg_normal_eq(nodes, data: SfTData, pre: _Pre):
    """Regularizer contribution: (H_nn (M,M,3,3), g_n (M,3), cost ())."""
    m = nodes.shape[0]
    r_curv, Jc, r_edge, Je, r_temp, tw = reg_terms(nodes, data, pre)

    # scatter-free: ring/edge blocks scattered into the (M, M) node-pair
    # grid via one-hot contractions (see _Pre.oh_ring; ~2x faster per LM
    # iteration than segment_sum on TPU)
    Or = pre.oh_ring  # (M, 1+R, M)
    cH = Jc[:, :, None, :, None] * Jc[:, None, :, None, :]  # (M,A,A,3,3)
    t1 = jnp.einsum("mai,mabkl->mibkl", Or, cH, precision=_HP)
    H_nn = jnp.einsum("mbj,mibkl->ijkl", Or, t1, precision=_HP)
    g_n = jnp.einsum(
        "mai,max->ix", Or, Jc * r_curv[:, None, None], precision=_HP
    )

    Oe = pre.oh_ev  # (E, 2, M)
    eH = Je[:, :, None, :, None] * Je[:, None, :, None, :]  # (E,2,2,3,3)
    t2 = jnp.einsum("eai,eabkl->eibkl", Oe, eH, precision=_HP)
    H_nn = H_nn + jnp.einsum("ebj,eibkl->ijkl", Oe, t2, precision=_HP)
    g_n = g_n + jnp.einsum(
        "eai,eax->ix", Oe, Je * r_edge[:, None, None], precision=_HP
    )

    diag = jnp.eye(m, dtype=nodes.dtype)[:, :, None, None] * jnp.eye(
        3, dtype=nodes.dtype
    )[None, None]
    H_nn = H_nn + (tw ** 2)[:, None, None, None] * diag
    g_n = g_n + tw[:, None] * r_temp
    cost = 0.5 * (
        jnp.sum(r_curv * r_curv) + jnp.sum(r_edge * r_edge)
        + jnp.sum(r_temp * r_temp)
    )
    return H_nn, g_n, cost


def dense_system(H_cc, H_cn, H_nn, g_c, g_n, pre: _Pre):
    """Blocks -> pinned dense (6+3M, 6+3M) system.

    Fixed (non-LocalZone) node coordinates get zeroed rows/columns and a
    unit diagonal (g2o setFixed), exactly matching the col_free masking of
    the dense-J path."""
    m = g_n.shape[0]
    nf = pre.optlap.astype(g_n.dtype)
    H_nn = H_nn * nf[:, None, None, None] * nf[None, :, None, None]
    diag = jnp.eye(m, dtype=g_n.dtype)[:, :, None, None] * jnp.eye(
        3, dtype=g_n.dtype
    )[None, None]
    H_nn = H_nn + (1.0 - nf)[:, None, None, None] * diag
    H_cn = H_cn * nf[:, None, None]
    g_n = g_n * nf[:, None]

    d = 6 + 3 * m
    H = jnp.zeros((d, d), g_n.dtype)
    H = H.at[:6, :6].set(H_cc)
    Hcn = H_cn.transpose(1, 0, 2).reshape(6, 3 * m)
    H = H.at[:6, 6:].set(Hcn).at[6:, :6].set(Hcn.T)
    H = H.at[6:, 6:].set(H_nn.transpose(0, 2, 1, 3).reshape(3 * m, 3 * m))
    g = jnp.concatenate([g_c, g_n.reshape(-1)])
    return H, g


# --------------------------------------------------- dense-J test seam -----


def obs_forward(T, nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Reprojection residuals (2N,) and optionally dense Jacobian rows
    (2N, 6+3M) — retained as the autodiff cross-check seam (tests) and NOT
    used by the production solver (see obs_normal_eq)."""
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
    ar = jnp.arange(m)
    onehot_f = (pre.fcorners[:, :, None] == ar).astype(jnp.float32)
    J_obs_nodes = jnp.einsum(
        "nac,nk,nkm->namc", B, data.obs_bary, onehot_f
    )  # (N, 2, M, 3)
    J_obs = jnp.concatenate(
        [Jxi.reshape(2 * n, 6), J_obs_nodes.reshape(2 * n, 3 * m)], axis=1
    )
    return r_obs, J_obs * pre.col_free[None, :]


def reg_forward(nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Regularizer residuals [M curvature | E edges | 3M temporal] and
    optionally dense Jacobian rows (test seam)."""
    m = nodes.shape[0]
    r_curv, Jc, r_edge, Je, r_temp, tw = reg_terms(nodes, data, pre)
    r = jnp.concatenate([r_curv, r_edge, r_temp.reshape(-1)])
    if not with_jac:
        return r, None
    ar = jnp.arange(m)
    onehot_r = (pre.ringx[:, :, None] == ar).astype(jnp.float32)
    Jc_dense = jnp.einsum("mko,mkj->mjo", Jc, onehot_r).reshape(m, 3 * m)
    J_curv = jnp.concatenate([jnp.zeros((m, 6)), Jc_dense], axis=1)

    edges = jnp.stack([pre.e0, pre.e1], axis=1)
    onehot_e = (edges[:, :, None] == ar).astype(jnp.float32)
    Je_dense = jnp.einsum("eko,ekm->emo", Je, onehot_e).reshape(-1, 3 * m)
    J_edge = jnp.concatenate(
        [jnp.zeros((Je_dense.shape[0], 6)), Je_dense], axis=1
    )

    temp3 = jnp.repeat(tw, 3)
    J_temp = jnp.concatenate([jnp.zeros((3 * m, 6)), jnp.diag(temp3)], axis=1)
    J = jnp.concatenate([J_curv, J_edge, J_temp], axis=0)
    return r, J * pre.col_free[None, :]


def _forward(T, nodes, data: SfTData, pre: _Pre, with_jac: bool):
    """Dense residual stack r (R,) and Jacobian (R, 6+3M) — test seam.

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
    """(r, J) at (T, nodes) — exposed for tests and cross-checks."""
    pre = _prepare(data, topo, cfg, reg_temp)
    return _forward(T, nodes, data, pre, with_jac=True)


def normal_equations(T, nodes, data: SfTData, topo: meshmod.MeshTopology,
                     cfg: Config, reg_temp: float):
    """(H, g, cost) of the production block assembly at (T, nodes) —
    exposed for tests (must match J^T W J of :func:`assemble` with the
    IRLS Huber weights) and for the distributed solver."""
    pre = _prepare(data, topo, cfg, reg_temp)
    faces = jnp.asarray(topo.faces)
    H_cc, H_cn, H_nn_o, g_c, g_n_o, c_o = _obs_normal_eq_impl(
        T, nodes, data, pre, cfg.sft.huber_delta, faces, topo.faces.shape[0]
    )
    H_nn_r, g_n_r, c_r = reg_normal_eq(nodes, data, pre)
    H, g = dense_system(
        H_cc, H_cn, H_nn_o + H_nn_r, g_c, g_n_o + g_n_r, pre
    )
    return H, g, c_o + c_r


def _obs_normal_eq_impl(T, nodes, data: SfTData, pre: _Pre,
                        huber_delta: float, faces: jnp.ndarray,
                        n_faces: int):
    """obs_normal_eq with the static face table passed explicitly.

    Gather/scatter-free: the barycentric interpolation and all node-block
    reductions ride pre.bmat (N, M) matmuls — per iteration the MXU does
    ~300 MFLOP of dense contractions instead of thousands of small
    gather/scatter ops (the round-4 latency profile)."""
    m = nodes.shape[0]
    n = data.obs_uv.shape[0]
    R3 = T[:3, :3]
    p = jnp.einsum("nm,md->nd", pre.bmat, nodes, precision=_HP)
    pc = se3.transform(T, p)
    z = pc[:, 2]
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    fx, fy = data.K[0, 0], data.K[1, 1]
    u = fx * pc[:, 0] / zs + data.K[0, 2]
    v = fy * pc[:, 1] / zs + data.K[1, 2]
    w_o = pre.w_obs_base * front
    r2 = (jnp.stack([u, v], axis=-1) - data.obs_uv) * w_o[:, None]

    nrm = jnp.sqrt(jnp.sum(r2 * r2, axis=-1) + 1e-12) * jnp.sqrt(
        jnp.maximum(data.n_kp, 1.0)
    )
    hub = jnp.minimum(1.0, huber_delta / nrm)
    cost = 0.5 * jnp.sum(hub * jnp.sum(r2 * r2, axis=-1))
    sh = jnp.sqrt(hub)

    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(zs)
    duv = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * pc[:, 0] * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * pc[:, 1] * iz2], axis=-1),
        ],
        axis=-2,
    ) * (w_o * sh)[:, None, None]
    Jxi = jnp.concatenate(
        [duv, -jnp.einsum("nai,nij->naj", duv, se3.hat(pc))], axis=-1
    )
    B = jnp.einsum("nac,cd->nad", duv, R3)
    r2w = r2 * sh[:, None]

    H_cc = jnp.einsum("nai,naj->ij", Jxi, Jxi, precision=_HP)
    g_c = jnp.einsum("nai,na->i", Jxi, r2w, precision=_HP)
    G = jnp.einsum("nai,naj->nij", B, B)  # (N, 3, 3)
    CB = jnp.einsum("nai,naj->nij", Jxi, B)  # (N, 6, 3)
    gB = jnp.einsum("nai,na->ni", B, r2w)  # (N, 3)

    # node-block reductions as two dense matmuls over the obs axis:
    # H_nn[(m,j),(p,k)] = sum_n bmat[n,m] bmat[n,p] G[n,j,k]
    Bm = pre.bmat  # (N, M)
    BG = Bm[:, :, None] * G.reshape(n, 1, 9)  # (N, M, 9)
    H_nn = jnp.einsum("nm,npc->mpc", Bm, BG, precision=_HP).reshape(
        m, m, 3, 3
    )
    H_cn = jnp.einsum(
        "nm,nx->mx", Bm, CB.reshape(n, 18), precision=_HP
    ).reshape(m, 6, 3)
    g_n = jnp.einsum("nm,nj->mj", Bm, gB, precision=_HP)
    return H_cc, H_cn, H_nn, g_c, g_n, cost


def obs_normal_eq(T, nodes, data, pre, huber_delta, faces, n_faces):
    """Observation half of the normal equations: (H_cc (6,6), H_cn (M,6,3),
    H_nn (M,M,3,3), g_c (6,), g_n (M,3), cost ()).  This is the per-device
    body of the distributed solver: shard the observation axis and psum
    every output (parallel.sharded.sft_solve_sharded)."""
    return _obs_normal_eq_impl(T, nodes, data, pre, huber_delta, faces, n_faces)


def _chi2(T, nodes, data: SfTData, topo, bmat=None) -> jnp.ndarray:
    from defslam_tpu.geometry import camera as cam

    if bmat is not None:  # gather-free via the dense blend matrix
        pw = jnp.einsum("nm,md->nd", bmat, nodes, precision=_HP)
    else:
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
    optimize(50) -> mark-outliers sequence, DefOptimizer.cc:509-577).

    Huber on the sqrt(invSigma2)-weighted pixel error.  The reference's
    robust kernel sees the extra 1/N information factor (DefOptimizer.cc:
    340+342), which pushes its knee to ~sqrt(5.991 N) px — effectively
    inactive.  Scaling the knee back by sqrt(N) gives ORB-SLAM2's
    poseOptimization deltaMono semantics (a deliberate robustness fix)."""
    reg = cfg.regularizer
    r_temp = reg.temporal if reg_temp is None else reg_temp
    m = data.nodes0.shape[0]
    delta_h = cfg.sft.huber_delta
    faces = jnp.asarray(topo.faces)
    n_faces = topo.faces.shape[0]

    def run(dd: SfTData, iters: int):
        pre = _prepare(dd, topo, cfg, r_temp)

        def cost_at(T, nodes):
            return obs_cost(T, nodes, dd, pre, delta_h) + reg_cost(
                nodes, dd, pre
            )

        c0 = cost_at(dd.T0, dd.nodes0)

        def cond(carry):
            T, nodes, lam, cost, i, done = carry
            return (i < iters) & ~done

        def body(carry):
            T, nodes, lam, cost, i, _ = carry
            H_cc, H_cn, H_nn_o, g_c, g_n_o, _ = _obs_normal_eq_impl(
                T, nodes, dd, pre, delta_h, faces, n_faces
            )
            H_nn_r, g_n_r, _ = reg_normal_eq(nodes, dd, pre)
            H, g = dense_system(
                H_cc, H_cn, H_nn_o + H_nn_r, g_c, g_n_o + g_n_r, pre
            )
            # fixed coords already carry a unit diagonal (dense_system)
            A = H + lam * jnp.diag(jnp.diag(H) + 1e-9)
            L = jnp.linalg.cholesky(A)
            dx = -jax.scipy.linalg.cho_solve((L, True), g)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            T_new = se3.se3_exp(dx[:6]) @ T
            nodes_new = nodes + dx[6:].reshape(m, 3)
            c_new = cost_at(T_new, nodes_new)
            accept = (c_new < cost) & jnp.isfinite(c_new)
            converged = accept & (
                cost - c_new <= cfg.sft.lm_rtol * (cost + 1e-30)
            )
            T = jnp.where(accept, T_new, T)
            nodes = jnp.where(accept, nodes_new, nodes)
            cost = jnp.where(accept, c_new, cost)
            lam = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0),
                cfg.sft.lm_lambda_min, cfg.sft.lm_lambda_max,
            )
            return (T, nodes, lam, cost, i + 1,
                    converged | (lam >= cfg.sft.lm_lambda_max))

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
    # bmat for the chi2 passes (mask-independent; shared by both stages)
    fc = faces[jnp.clip(data.obs_face, 0, n_faces - 1)]
    bmat = jnp.einsum(
        "nk,nkm->nm", data.obs_bary, jax.nn.one_hot(fc, m)
    )
    chi2 = _chi2(T1, nodes1, data, topo, bmat)
    inlier = data.obs_mask & (chi2 <= cfg.sft.chi2_threshold)
    # stage 2: short polish on the gated inliers (robustness addition over
    # the reference's single optimize(50); the strict gate makes it cheap)
    d2 = data._replace(T0=T1, nodes0=nodes1, obs_mask=inlier)
    T2, nodes2, cost = run(d2, max(cfg.sft.lm_iterations // 5, 5))
    chi2f = _chi2(T2, nodes2, data, topo, bmat)
    inlier_f = data.obs_mask & (chi2f <= cfg.sft.chi2_threshold)
    return SfTResult(T=T2, nodes=nodes2, inlier=inlier_f, chi2=chi2f, cost=cost)
