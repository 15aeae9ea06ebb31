"""Shape-from-Template: joint camera + mesh deformation solve.

The TPU equivalent of the reference's hottest code path,
``Optimizer::DefPoseOptimization`` (``Modules/Tracking/DefOptimizer.cc:
251-578``) and its hand-written g2o residuals (``Thirdparty/g2o/g2o/types/
sft_types.h``: EdgeNodesCamera 75-210, EdgeMeanCurvature 212-328,
EdgesStreching 330-379, EdgesReference 381-411).

Energy terms and their count-normalized weights match the reference:

- barycentric reprojection of every observed template-embedded map point,
  information invSigma2 / N_obs, Huber at chi2 = 5.991
  (DefOptimizer.cc:293-340, 509-537)
- mean-curvature preservation, weight RegLap / M       (DefOptimizer.cc:458)
- edge inextensibility, weight RegInex / E             (DefOptimizer.cc:499)
- temporal anchor to the previous frame's mesh, RegTemp / M^2
  (DefOptimizer.cc:379)

Re-design: instead of a g2o graph with one vertex per node and analytic
Jacobians, the unknowns are one flat vector x = [xi(6) | dnodes(3M)] (camera
in the se(3) tangent at the current estimate, nodes as displacements), the
residual stack is a pure function, and the dense Jacobian comes from forward-
mode autodiff inside the shared LM engine — one compilation, MXU-shaped
linear algebra (J is ~(2N+E+4M) x (6+3M) ~= 3800 x 306 at reference budgets).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.ops import lm
from defslam_tpu.template import mesh as meshmod

CHI2_2DOF = 5.991


class SfTData(NamedTuple):
    """Static-shape inputs of one SfT solve."""

    K: jnp.ndarray  # (3, 3) intrinsics
    T0: jnp.ndarray  # (4, 4) initial world->camera pose
    nodes0: jnp.ndarray  # (M, 3) initial node positions
    nodes_anchor: jnp.ndarray  # (M, 3) temporal anchor (prev frame mesh)
    rest_len: jnp.ndarray  # (E,)
    lap_rest: jnp.ndarray  # (M,)
    obs_uv: jnp.ndarray  # (N, 2) observed pixels
    obs_face: jnp.ndarray  # (N,) facet id of the observed map point
    obs_bary: jnp.ndarray  # (N, 3)
    obs_invsigma2: jnp.ndarray  # (N,) per-level information
    obs_mask: jnp.ndarray  # (N,) bool


class SfTResult(NamedTuple):
    T: jnp.ndarray  # (4, 4) optimized pose
    nodes: jnp.ndarray  # (M, 3) optimized mesh
    inlier: jnp.ndarray  # (N,) bool chi2 gate
    chi2: jnp.ndarray  # (N,) per-observation chi2 at the solution
    cost: jnp.ndarray


def _residuals(
    x: jnp.ndarray,
    data: SfTData,
    topo: meshmod.MeshTopology,
    w_reproj_mask: jnp.ndarray,
    reg_lap: float,
    reg_inex: float,
    reg_temp: float,
) -> jnp.ndarray:
    m = data.nodes0.shape[0]
    xi = x[:6]
    nodes = data.nodes0 + x[6:].reshape(m, 3)
    T = se3.se3_exp(xi) @ data.T0

    # --- reprojection (2N), sqrt(info) folded in
    pw = meshmod.facet_positions(nodes, topo, data.obs_face, data.obs_bary)
    pc = se3.transform(T, pw)
    uv = cam.project(data.K, pc)
    n_eff = jnp.maximum(jnp.sum(w_reproj_mask), 1.0)
    behind = pc[..., 2] < 1e-6
    w_obs = jnp.sqrt(data.obs_invsigma2 / n_eff) * w_reproj_mask
    w_obs = jnp.where(behind, 0.0, w_obs)
    r_reproj = ((uv - data.obs_uv) * w_obs[:, None]).reshape(-1)

    # --- mean curvature magnitude (M)
    lap = meshmod.laplacian(nodes, topo)
    lap_mag = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12)
    r_lap = jnp.sqrt(reg_lap / m) * (lap_mag - data.lap_rest)

    # --- inextensibility (E), relative stretch like EdgesStreching
    ln = meshmod.edge_lengths(nodes, topo)
    n_edges = data.rest_len.shape[0]
    r_inex = jnp.sqrt(reg_inex / n_edges) * (ln - data.rest_len) / data.rest_len

    # --- temporal anchor (3M)
    r_temp = jnp.sqrt(reg_temp / (m * m)) * (nodes - data.nodes_anchor).reshape(-1)

    return jnp.concatenate([r_reproj, r_lap, r_inex, r_temp])


def _chi2(T, nodes, data: SfTData, topo) -> jnp.ndarray:
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
    """Two-stage robust solve: full LM with Huber, chi2 outlier gate, short
    re-solve on inliers (the reference's optimize -> chi2 mark -> node update
    sequence, DefOptimizer.cc:509-577)."""
    reg = cfg.regularizer
    r_temp = reg.temporal if reg_temp is None else reg_temp
    m = data.nodes0.shape[0]
    n = data.obs_uv.shape[0]
    n_reproj = 2 * n

    def run(obs_mask, x0, iters):
        w_mask = obs_mask.astype(jnp.float32)

        def residual_fn(x):
            return _residuals(
                x, data, topo, w_mask, reg.laplacian, reg.inextensibility, r_temp
            )

        def weight_fn(r):
            rr = r[:n_reproj]
            w = lm.huber_block_weights(rr, 2, cfg.sft.huber_delta)
            return jnp.concatenate([w, jnp.ones(r.shape[0] - n_reproj, r.dtype)])

        return lm.lm_solve(
            residual_fn,
            x0,
            num_iters=iters,
            weight_fn=weight_fn,
            lam0=cfg.sft.lm_lambda_init,
        )

    x0 = jnp.zeros(6 + 3 * m, jnp.float32)
    res1 = run(data.obs_mask, x0, cfg.sft.lm_iterations)
    T1 = se3.se3_exp(res1.x[:6]) @ data.T0
    nodes1 = data.nodes0 + res1.x[6:].reshape(m, 3)
    chi2 = _chi2(T1, nodes1, data, topo)
    inlier = data.obs_mask & (chi2 <= cfg.sft.chi2_threshold)
    # short polish on inliers only
    res2 = run(inlier, res1.x, max(cfg.sft.lm_iterations // 5, 5))
    T2 = se3.se3_exp(res2.x[:6]) @ data.T0
    nodes2 = data.nodes0 + res2.x[6:].reshape(m, 3)
    chi2f = _chi2(T2, nodes2, data, topo)
    inlier_f = data.obs_mask & (chi2f <= cfg.sft.chi2_threshold)
    return SfTResult(T=T2, nodes=nodes2, inlier=inlier_f, chi2=chi2f, cost=res2.cost)
