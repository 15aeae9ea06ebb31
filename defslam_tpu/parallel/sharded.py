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
    if len(devs) < n:
        # virtual-mesh dryruns: the default backend may be a single real
        # chip while the requested topology lives on the CPU host platform
        # (XLA_FLAGS=--xla_force_host_platform_device_count=N)
        devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), ("dp",))


def _shard(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


# ------------------------------------------------------- mapping sharding --


@functools.lru_cache(maxsize=16)
def _normal_solves_fn(mesh: Mesh, num_iters: int = 30):
    """Jitted sharded normal solver, memoized per (mesh, budget) so the
    trace cache is shared across frames (a fresh jax.jit wrapper per call
    would retrace the vmapped LM every keyframe)."""
    dp = NamedSharding(mesh, P("dp"))
    return jax.jit(
        functools.partial(nrm.solve_k1k2, num_iters=num_iters),
        in_shardings=(nrm.PairObs(dp, dp, dp, dp, dp, dp), dp),
    )


def sharded_normal_solves(
    mesh: Mesh, obs: nrm.PairObs, k_init: jnp.ndarray, num_iters: int = 30
) -> nrm.NormalResult:
    """Per-point normal solves sharded over the point axis (dp)."""
    p = k_init.shape[0]
    assert p % mesh.devices.size == 0, "pad the point axis to the mesh size"
    obs_sharded = jax.tree.map(lambda a: _shard(mesh, a, P("dp")), obs)
    k0 = _shard(mesh, k_init, P("dp"))
    return _normal_solves_fn(mesh, num_iters)(obs_sharded, k0)


@functools.lru_cache(maxsize=16)
def _warp_fits_fn(mesh: Mesh, cfg: Config):
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        functools.partial(mapper.fit_warps, cfg=cfg),
        in_shardings=(mapper.WarpBatch(dp, dp, dp, dp), rep, rep),
    )


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
    return _warp_fits_fn(mesh, cfg)(
        batch_sh, _shard(mesh, dom, P()), _shard(mesh, bending, P())
    )


# ----------------------------------------------------------- sharded SfT --

def sft_solve_sharded(
    mesh: Mesh,
    data: sftmod.SfTData,
    cfg: Config,
    num_iters: int | None = None,
    reg_temp: float | None = None,
) -> sftmod.SfTResult:
    """Distributed SfT with full single-chip parity (see _sft_sharded_fn)."""
    n_dev = mesh.devices.size
    n_obs_total = data.obs_uv.shape[0]
    assert n_obs_total % n_dev == 0, "pad observations to the mesh size"
    data_sh = jax.tree.map(
        lambda a, sp: _shard(mesh, a, sp), data, _SFT_DATA_SPECS
    )
    fn = _sft_sharded_fn(
        mesh, cfg,
        num_iters or cfg.sft.lm_iterations,
        cfg.regularizer.temporal if reg_temp is None else reg_temp,
    )
    T, nodes, inlier, chi2, cost = fn(data_sh)
    return sftmod.SfTResult(
        T=T, nodes=nodes, inlier=inlier, chi2=chi2, cost=cost
    )


@functools.lru_cache(maxsize=8)
def _node_partition(nu: int, nv: int, n_dev: int):
    """Static u-strip partition of the (nu x nv) node grid for the Schur
    solver (SURVEY 5.7): device d owns the contiguous u-rows
    [d*s, (d+1)*s); the FIRST row of every strip d>0 is the interface set
    (together with the 6 camera params), the remaining rows are that
    device's interior.  Node couplings (faces, edges, 1-rings) span at most
    one u-row, so interiors of different strips never couple — eliminating
    them locally and psum-ing the Schur contributions onto the interface
    system is EXACT.

    Returns (interior_param_idx (D, Ni) int32, interior_valid (D, Ni) bool,
    interface_param_idx (Nb,) int32) in the 6+3M parameter numbering.
    Interior sets are padded to the widest strip (strip 0 has no leading
    interface row)."""
    assert nu % n_dev == 0, "nodes_u must divide over the mesh"
    s = nu // n_dev
    assert s >= 2 or n_dev == 1, (
        "need >=2 u-rows per device (one interface + interior)"
    )
    ni_max = s * nv  # strip 0: all s rows are interior
    interior = np.zeros((n_dev, 3 * ni_max), np.int64)
    valid = np.zeros((n_dev, 3 * ni_max), bool)
    iface_nodes = []
    for d in range(n_dev):
        rows = range(d * s, (d + 1) * s)
        if d > 0:
            iface_nodes.extend(d * s * nv + np.arange(nv))
            rows = range(d * s + 1, (d + 1) * s)
        nodes = np.concatenate([
            u * nv + np.arange(nv) for u in rows
        ]) if s else np.zeros(0, np.int64)
        params = (6 + 3 * nodes[:, None] + np.arange(3)).reshape(-1)
        interior[d, : len(params)] = params
        valid[d, : len(params)] = True
    iface_nodes = np.asarray(iface_nodes, np.int64)
    iface = np.concatenate([
        np.arange(6),
        (6 + 3 * iface_nodes[:, None] + np.arange(3)).reshape(-1)
        if len(iface_nodes) else np.zeros(0, np.int64),
    ])
    return (
        jnp.asarray(interior, jnp.int32),
        jnp.asarray(valid),
        jnp.asarray(iface, jnp.int32),
    )


def _schur_solve(A, g, part, axis: str):
    """Distributed SPD solve A x = g via non-overlapping block elimination:
    each device Cholesky-factors its interior block, reduces it onto the
    (camera + strip-boundary) interface system, the psum'd interface system
    is solved replicated, and interiors back-substitute locally.  Exact
    (matches the dense solve in exact arithmetic); the O(M^3) factorization
    cost drops to D * O((M/D)^3) + O(B^3)."""
    ii_all, vi_all, bi = part
    d = jax.lax.axis_index(axis)
    ii = ii_all[d]
    vi = vi_all[d]
    n = g.shape[0]
    ni = ii.shape[0]
    pair_ok = vi[:, None] & vi[None, :]
    eye = jnp.eye(ni, dtype=A.dtype)
    Aii = jnp.where(pair_ok, A[ii][:, ii], eye)
    Aib = jnp.where(vi[:, None], A[ii][:, bi], 0.0)
    gi = jnp.where(vi, g[ii], 0.0)
    L = jnp.linalg.cholesky(Aii)
    Y = jax.scipy.linalg.cho_solve(
        (L, True), jnp.concatenate([Aib, gi[:, None]], axis=1)
    )
    Yb, yg = Y[:, :-1], Y[:, -1]
    S = A[bi][:, bi] - jax.lax.psum(Aib.T @ Yb, axis)
    rhs = g[bi] - jax.lax.psum(Aib.T @ yg, axis)
    Lb = jnp.linalg.cholesky(S)
    xb = jax.scipy.linalg.cho_solve((Lb, True), rhs)
    xi = jax.scipy.linalg.cho_solve((L, True), gi - Aib @ xb)
    xi = jnp.where(vi, xi, 0.0)
    buf = jnp.zeros(n + 1, A.dtype).at[
        jnp.where(vi, ii, n)
    ].set(xi, mode="drop")[:n]
    return jax.lax.psum(buf, axis) + jnp.zeros(n, A.dtype).at[bi].set(xb)


_SFT_DATA_SPECS = sftmod.SfTData(
    K=P(), T0=P(), nodes0=P(), nodes_rest=P(), rest_len=P(),
    lap_rest=P(), lap_w=P(), curv_scale=P(), interior=P(),
    mean_edge=P(), obs_uv=P("dp"), obs_face=P("dp"), obs_bary=P("dp"),
    obs_invsigma2=P("dp"), obs_mask=P("dp"), n_kp=P(),
)


@functools.lru_cache(maxsize=32)
def _sft_sharded_fn(mesh: Mesh, cfg: Config, iters: int, rt: float):
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
    m = c.mesh.n_nodes
    topo = meshmod.grid_topology(c.mesh.nodes_u, c.mesh.nodes_v)
    delta_h = c.sft.huber_delta
    faces = jnp.asarray(topo.faces)
    n_faces = topo.faces.shape[0]
    # Mesh-axis scaling (SURVEY 5.7): for large templates the damped-normal
    # solve itself is node-block-partitioned over the mesh (Schur reduction
    # to the camera+boundary system, psum over ICI) instead of replicated.
    n_dev = mesh.devices.size
    use_schur = (
        n_dev > 1 and m >= 256 and c.mesh.nodes_u % n_dev == 0
        and c.mesh.nodes_u // n_dev >= 2
    )
    part = _node_partition(c.mesh.nodes_u, c.mesh.nodes_v, n_dev) \
        if use_schur else None

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(_SFT_DATA_SPECS,),
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
                if use_schur:
                    dx = -_schur_solve(A, g, part, "dp")
                else:
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
                    jnp.where(accept, lam * 0.5, lam * 4.0),
                    c.sft.lm_lambda_min, c.sft.lm_lambda_max,
                )
                return (T, nodes, lam, cost, i + 1,
                        converged | (lam >= c.sft.lm_lambda_max))

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

    return jax.jit(run)
