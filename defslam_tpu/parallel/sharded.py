"""Multi-chip sharding of the SLAM workload over a jax.sharding.Mesh.

The reference's only parallelism is three CPU threads + mutexes
(``System.cc:140-169``, ``set_MAC.h PARALLEL``); there is no distributed
backend at all (SURVEY 2.4/5.8).  This module defines the TPU-native scaling
story:

- **Data-parallel mapping** ("dp" axis): warp fitting over covisible
  keyframe pairs and per-point normal solves are embarrassingly parallel —
  sharded over the mesh with pjit `in_shardings`; XLA inserts no collectives
  beyond the final gather.  This parallelizes the reference's dominant
  mapping cost (serial per-point Ceres loops, NormalEstimator.cc:49-226).
- **Solver-parallel SfT** ("dp" axis over observations): a shard_map'd
  Levenberg-Marquardt where every device assembles its observation shard's
  normal-equation blocks (sft.obs_normal_eq), the blocks are `psum`'d over
  ICI, regularizer terms are evaluated replicated (outside the psum), and
  the tiny damped solve + accept/reject state update happen identically on
  every device — the block-partitioned GN with collective reductions
  sketched in SURVEY 5.7.

All entry points work identically on a real TPU pod slice and on the
virtual CPU mesh used by tests/dryruns
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from defslam_tpu.config import Config
from defslam_tpu.geometry import se3
from defslam_tpu.mapping import mapper
from defslam_tpu.mapping import normals as nrm
from defslam_tpu.template import mesh as meshmod
from defslam_tpu.tracking import sft as sftmod


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("dp",))


def _shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


# ------------------------------------------------------- mapping sharding --


def sharded_normal_solves(
    mesh: Mesh, obs: nrm.PairObs, k_init: jnp.ndarray
) -> nrm.NormalResult:
    """Per-point normal solves sharded over the point axis (dp)."""
    p = k_init.shape[0]
    assert p % mesh.devices.size == 0, "pad the point axis to the mesh size"
    obs_sharded = jax.tree.map(lambda a: _shard(mesh, a, P("dp")), obs)
    k0 = _shard(mesh, k_init, P("dp"))
    fn = jax.jit(
        nrm.solve_k1k2,
        in_shardings=(
            jax.tree.map(lambda _: NamedSharding(mesh, P("dp")), obs),
            NamedSharding(mesh, P("dp")),
        ),
    )
    return fn(obs_sharded, k0)


def sharded_warp_fits(
    mesh: Mesh,
    batch: mapper.WarpBatch,
    dom: jnp.ndarray,
    bending: jnp.ndarray,
    cfg: Config,
):
    """Warp fitting sharded over the pair axis (dp); domain constants are
    replicated.  Returns (DiffProps, ctrl) like mapper.fit_warps."""
    batch_sh = jax.tree.map(lambda a: _shard(mesh, a, P("dp")), batch)
    fn = jax.jit(
        functools.partial(mapper.fit_warps, cfg=cfg),
        in_shardings=(
            jax.tree.map(lambda _: NamedSharding(mesh, P("dp")), batch),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
    )
    return fn(batch_sh, _shard(mesh, dom, P()), _shard(mesh, bending, P()))


# ----------------------------------------------------------- sharded SfT --

def sft_solve_sharded(
    mesh: Mesh,
    data: sftmod.SfTData,
    cfg: Config,
    num_iters: int | None = None,
    reg_temp: float | None = None,
) -> sftmod.SfTResult:
    """Distributed SfT with full single-chip parity: the SAME two-stage
    robust solve as ``sft.solve`` (analytic block Jacobians, IRLS Huber,
    Marquardt damping, accept/reject, LocalZone masking, chi2 gate +
    inlier polish) with the observation rows sharded over the "dp" axis.

    Each device assembles its observation shard's normal-equation blocks
    (``sft.obs_normal_eq``); the blocks, the robust cost, and the
    viewed-node counts inside ``sft._prepare`` are ``psum``'d over ICI;
    regularizer rows (observation-independent) are evaluated replicated;
    and the tiny damped solve + accept/reject run identically on every
    device.  The psum is the only reduction-order difference vs the
    single-chip path.

    Returns a replicated :class:`sft.SfTResult` (per-observation inlier /
    chi2 arrays gathered back to the full observation axis).
    """
    c = cfg
    n_dev = mesh.devices.size
    iters = num_iters or c.sft.lm_iterations
    m = data.nodes0.shape[0]
    topo = meshmod.grid_topology(c.mesh.nodes_u, c.mesh.nodes_v)
    n_obs_total = data.obs_uv.shape[0]
    assert n_obs_total % n_dev == 0, "pad observations to the mesh size"
    rt = c.regularizer.temporal if reg_temp is None else reg_temp
    delta_h = c.sft.huber_delta

    data_specs = sftmod.SfTData(
        K=P(), T0=P(), nodes0=P(), nodes_rest=P(), rest_len=P(),
        lap_rest=P(), lap_w=P(), curv_scale=P(), interior=P(),
        mean_edge=P(), obs_uv=P("dp"), obs_face=P("dp"), obs_bary=P("dp"),
        obs_invsigma2=P("dp"), obs_mask=P("dp"), n_kp=P(),
    )
    data_sh = jax.tree.map(lambda a, sp: _shard(mesh, a, sp), data, data_specs)
    faces = jnp.asarray(topo.faces)
    n_faces = topo.faces.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(data_specs,),
        out_specs=(P(), P(), P("dp"), P("dp"), P()),
    )
    def run(d):
        def solve_stage(dd, stage_iters):
            # per-stage constants: the viewed/LocalZone reduction inside
            # _prepare is psum'd so every device derives identical masks
            p = sftmod._prepare(dd, topo, c, rt, axis_name="dp")

            def cost_at(T, nodes):
                c_o = jax.lax.psum(
                    sftmod.obs_cost(T, nodes, dd, p, delta_h), "dp"
                )
                return c_o + sftmod.reg_cost(nodes, dd, p)

            def cond(carry):
                T, nodes, lam, cost, i, done = carry
                return (i < stage_iters) & ~done

            def body(carry):
                T, nodes, lam, cost, i, _ = carry
                blocks = sftmod.obs_normal_eq(
                    T, nodes, dd, p, delta_h, faces, n_faces
                )
                H_cc, H_cn, H_nn_o, g_c, g_n_o, _ = jax.lax.psum(
                    blocks, "dp"
                )
                H_nn_r, g_n_r, _ = sftmod.reg_normal_eq(nodes, dd, p)
                H, g = sftmod.dense_system(
                    H_cc, H_cn, H_nn_o + H_nn_r, g_c, g_n_o + g_n_r, p
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
                 jnp.asarray(c.sft.lm_lambda_init, jnp.float32),
                 cost_at(dd.T0, dd.nodes0), jnp.asarray(0),
                 jnp.asarray(False)),
            )
            return T, nodes, cost

        # stage 1: full robust solve; chi2 gate on the LOCAL obs shard
        T1, nodes1, _ = solve_stage(d, iters)
        chi2 = sftmod._chi2(T1, nodes1, d, topo)
        inlier = d.obs_mask & (chi2 <= c.sft.chi2_threshold)
        # stage 2: short polish on the gated inliers (sft.solve parity)
        d2 = d._replace(T0=T1, nodes0=nodes1, obs_mask=inlier)
        T2, nodes2, cost = solve_stage(d2, max(iters // 5, 5))
        chi2f = sftmod._chi2(T2, nodes2, d, topo)
        inlier_f = d.obs_mask & (chi2f <= c.sft.chi2_threshold)
        return T2, nodes2, inlier_f, chi2f, cost

    T, nodes, inlier, chi2, cost = jax.jit(run)(data_sh)
    return sftmod.SfTResult(
        T=T, nodes=nodes, inlier=inlier, chi2=chi2, cost=cost
    )
