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
  Gauss-Newton where every device computes the residuals/Jacobian of its
  observation shard, the normal equations are `psum`'d over ICI, and the
  (tiny, replicated) damped solve + state update happen on every device —
  the block-partitioned GN with collective reductions sketched in SURVEY
  5.7.  Regularizer terms are scaled by 1/n_shards so their psum
  contributes exactly once.

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
from defslam_tpu.utils import HIGHEST


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
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed Gauss-Newton over the observation shards.

    Returns (pose (4,4), nodes (M,3)).  Each device: local residual stack ->
    local J via jacfwd -> local (H, g) -> psum over "dp" -> replicated
    damped solve + update.  This is the Schur-free variant (the full state
    fits every device easily at reference scales: 306 parameters); the
    Schur-complement split of camera vs node blocks becomes worthwhile only
    for much larger meshes.
    """
    c = cfg
    n_dev = mesh.devices.size
    iters = num_iters or c.sft.lm_iterations
    m = data.nodes0.shape[0]
    n_params = 6 + 3 * m
    reg = c.regularizer
    topo = meshmod.grid_topology(c.mesh.nodes_u, c.mesh.nodes_v)
    n_obs_total = data.obs_uv.shape[0]
    assert n_obs_total % n_dev == 0, "pad observations to the mesh size"

    obs_axes = sftmod.SfTData(
        K=P(), T0=P(), nodes0=P(), nodes_anchor=P(), rest_len=P(),
        lap_rest=P(), obs_uv=P("dp"), obs_face=P("dp"), obs_bary=P("dp"),
        obs_invsigma2=P("dp"), obs_mask=P("dp"),
    )
    data_sh = jax.tree.map(
        lambda a, sp: _shard(mesh, a, sp), data, obs_axes,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )

    def local_residuals(x, d: sftmod.SfTData):
        """Residuals of this shard: local reprojection + 1/n_dev-scaled
        regularizers (so the psum adds them exactly once)."""
        xi = x[:6]
        nodes = d.nodes0 + x[6:].reshape(m, 3)
        T = se3.se3_exp(xi) @ d.T0
        pw = meshmod.facet_positions(nodes, topo, d.obs_face, d.obs_bary)
        pc = se3.transform(T, pw)
        from defslam_tpu.geometry import camera as cammod

        uv = cammod.project(d.K, pc)
        w = jnp.sqrt(d.obs_invsigma2 / jnp.maximum(n_obs_total, 1)) * d.obs_mask
        w = jnp.where(pc[..., 2] < 1e-6, 0.0, w)
        r_reproj = ((uv - d.obs_uv) * w[:, None]).reshape(-1)

        lap = meshmod.laplacian(nodes, topo)
        lap_mag = jnp.sqrt(jnp.sum(lap * lap, axis=-1) + 1e-12)
        r_lap = jnp.sqrt(reg.laplacian / (m * n_dev)) * (lap_mag - d.lap_rest)
        ln = meshmod.edge_lengths(nodes, topo)
        n_e = d.rest_len.shape[0]
        r_inex = (
            jnp.sqrt(reg.inextensibility / (n_e * n_dev))
            * (ln - d.rest_len) / d.rest_len
        )
        r_temp = jnp.sqrt(reg.temporal / (m * m * n_dev)) * (
            nodes - d.nodes_anchor
        ).reshape(-1)
        return jnp.concatenate([r_reproj, r_lap, r_inex, r_temp])

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(obs_axes,), out_specs=(P(), P())
    )
    def run(d: sftmod.SfTData):
        def gn_step(_, x):
            J = jax.jacfwd(local_residuals)(x, d)
            r = local_residuals(x, d)
            H_local = jnp.einsum("ri,rj->ij", J, J, precision=HIGHEST)
            g_local = jnp.einsum("ri,r->i", J, r, precision=HIGHEST)
            H = jax.lax.psum(H_local, "dp")
            g = jax.lax.psum(g_local, "dp")
            A = H + 1e-4 * jnp.diag(jnp.diag(H) + 1e-9)
            L = jnp.linalg.cholesky(A)
            dx = -jax.scipy.linalg.cho_solve((L, True), g)
            return x + jnp.where(jnp.isfinite(dx), dx, 0.0)

        x = jax.lax.fori_loop(0, iters, gn_step, jnp.zeros(n_params, jnp.float32))
        T = se3.se3_exp(x[:6]) @ d.T0
        nodes = d.nodes0 + x[6:].reshape(m, 3)
        return T, nodes

    return jax.jit(run)(data_sh)
