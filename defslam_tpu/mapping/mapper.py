"""Deformation mapping (NRSfM) kernels — the jitted heart of
``DefLocalMapping`` (``Modules/Mapping/DefLocalMapping.cc``).

Pipeline per new keyframe (reference call stack SURVEY 3.3):
 1. for every covisible keyframe pair: fit + refine a retina warp and
    extract differential properties  (SchwarpDatabase::add/calculateSchwarps)
 2. batched per-point normal solves   (NormalEstimator::ObtainK1K2)
 3. shape-from-normals on the chosen reference keyframe (ShapeFromNormals)
 4. Sim(3) registration against the metric map (SurfaceRegistration)
 5. template regeneration from the registered surface (updateTemplate ->
    TemplateGenerator / TriangularMesh / LaplacianMesh)

All stages below are pure jitted functions over padded arrays; the selection
and bookkeeping logic (which pairs, which reference keyframe, when to
re-template) lives in ``defslam_tpu.system`` on the host.

A key simplification enabling clean batching: every keyframe shares the same
retina domain (computed from the camera intrinsics + image size, see
``geometry.camera.retina_domain``), so one bending matrix and one warp-domain
constant serve all warps — the reference instead derives a per-keyframe
domain from its keypoint bounding box (DefKeyFrame.cc:94-133), which would
force per-pair resizing for no accuracy benefit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from defslam_tpu.config import Config
from defslam_tpu.geometry import se3
from defslam_tpu.mapping import normals as nrm
from defslam_tpu.mapping import registration, sfn, warp
from defslam_tpu.ops import bspline
from defslam_tpu.template import mesh as meshmod

# padded capacity of matched points per warp pair
PAIR_CAP = 512
# padded capacity of pair-observations per map point for the normal solver
OBS_CAP = 8


@functools.lru_cache(maxsize=8)
def _bending_const(dom_key: tuple, nu: int, nv: int):
    return bspline.bending_matrix(jnp.asarray(dom_key), nu, nv)


def bending_for(dom, nu: int, nv: int):
    key = tuple(float(x) for x in dom)
    return _bending_const(key, nu, nv)


class WarpBatch(NamedTuple):
    """Padded matched retina pairs for NPAIRS warps."""

    uv1: jnp.ndarray  # (NP, PAIR_CAP, 2)
    uv2: jnp.ndarray  # (NP, PAIR_CAP, 2)
    mask: jnp.ndarray  # (NP, PAIR_CAP) bool
    pair_valid: jnp.ndarray  # (NP,) bool


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_warps(batch: WarpBatch, dom: jnp.ndarray, bending: jnp.ndarray, cfg: Config):
    """Fit + refine all pair warps and extract DiffProps, vmapped.

    Returns (DiffProps, ctrl (NP, nu, nv, 2)) — the control grids feed the
    warp-guided match densification (searchBySchwarp)."""
    mc = cfg.mapping
    nu, nv = mc.warp_ctrl_u, mc.warp_ctrl_v
    fx, fy = cfg.camera.fx, cfg.camera.fy

    def one(uv1, uv2, mask):
        w = mask.astype(uv1.dtype)
        ctrl = warp.fit_initial(
            uv1, uv2, w, dom, nu, nv, bending, mc.schwarp_regularizer * 1e-3
        )
        ctrl = warp.refine(
            ctrl, uv1, uv2, w, dom, mc.schwarp_regularizer, fx, fy,
            num_iters=mc.schwarp_lm_iterations,
        )
        dp = warp.diff_props(ctrl, uv1, uv2, mask, dom, fx, fy, mc.warp_error_px)
        return dp, ctrl

    dps, ctrls = jax.vmap(one)(batch.uv1, batch.uv2, batch.mask)
    # invalid pairs contribute nothing
    return dps._replace(mask=dps.mask & batch.pair_valid[:, None]), ctrls


@functools.partial(jax.jit, static_argnames=("cfg",))
def densify_matches(
    ctrls: jnp.ndarray,  # (NP, nu, nv, 2) fitted warps KF1 -> KF2
    retina1: jnp.ndarray,  # (K, 2) keypoints of KF1 (the new keyframe)
    valid1: jnp.ndarray,  # (K,) bool
    desc1: jnp.ndarray,  # (K, 8) uint32
    retina2: jnp.ndarray,  # (NP, K, 2) keypoints of each covisible KF
    valid2: jnp.ndarray,  # (NP, K) bool
    desc2: jnp.ndarray,  # (NP, K, 8)
    dom: jnp.ndarray,
    pair_valid: jnp.ndarray,  # (NP,)
    cfg: Config,
):
    """Warp-guided descriptor matching (DefORBmatcher::searchBySchwarp,
    DefORBmatcher.cc:190-292): warp every KF1 keypoint into each covisible
    keyframe and match descriptors within a pixel window around the
    prediction.  Returns (best (NP, K) int32 kp2-index or -1, dist (NP, K)).
    """
    from defslam_tpu.ops import matching

    th = cfg.tracking.match_th_low
    radius_px = 2.0 * cfg.tracking.projection_window
    rad_ret = radius_px / cfg.camera.fx

    def one(ctrl, ret2, v2, d2, pv):
        pred = bspline.evaluate(ctrl, retina1[:, 0], retina1[:, 1], dom)  # (K, 2)
        window = matching.window_mask(pred, ret2, rad_ret)
        dist = matching.masked_hamming(
            desc1, d2, valid1 & pv, v2, pair_mask=window
        )
        m = matching.best_match(dist, max_dist=th, nn_ratio=0.85, mutual=True)
        return m.idx, m.dist

    return jax.vmap(one)(ctrls, retina2, valid2, desc2, pair_valid)


@jax.jit
def solve_normals(obs: nrm.PairObs, k_init: jnp.ndarray) -> nrm.NormalResult:
    return nrm.solve_k1k2(obs, k_init)


@functools.partial(jax.jit, static_argnames=("cfg",))
def integrate_surface(
    retina: jnp.ndarray,  # (K, 2) ref-KF keypoint retina coords
    k_vals: jnp.ndarray,  # (K, 2) per-keypoint (k1, k2)
    mask: jnp.ndarray,  # (K,) bool valid normals
    dom: jnp.ndarray,
    bending: jnp.ndarray,
    cfg: Config,
) -> sfn.SfNResult:
    normals = nrm.normal_from_k(k_vals, retina)
    return sfn.solve(
        retina, normals, mask, dom,
        cfg.mapping.sfn_ctrl_u, cfg.mapping.sfn_ctrl_v,
        bending, cfg.mapping.bending, mean_depth=1.0,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def register_surface(
    surf_xyz: jnp.ndarray,
    map_xyz_cam: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: Config,
) -> registration.RegistrationResult:
    return registration.register(
        surf_xyz, map_xyz_cam, mask,
        chi_limit=cfg.mapping.chi_limit,
        min_pairs=cfg.mapping.min_registration_points,
    )


class TemplateRegen(NamedTuple):
    template: meshmod.Template
    point_xyz: jnp.ndarray  # (K, 3) world positions of ref-KF keypoints
    point_facet: jnp.ndarray  # (K,) facet of each ref-KF keypoint
    point_bary: jnp.ndarray  # (K, 3)
    point_inside: jnp.ndarray  # (K,) bool — keypoint inside mesh domain


@functools.partial(jax.jit, static_argnames=("cfg",))
def regen_template(
    surf_ctrl: jnp.ndarray,  # (nu, nv) SfN control depths
    reg: registration.RegistrationResult,
    kf_pose: jnp.ndarray,  # (4, 4) world->camera of the reference KF
    retina: jnp.ndarray,  # (K, 2) ref-KF keypoints (retina)
    dom: jnp.ndarray,
    cfg: Config,
) -> TemplateRegen:
    """Reference updateTemplate (DefLocalMapping.cc:138-153 + 3.4):
    sample the registered surface on the node grid, build the Laplacian
    template in world frame, and embed the keyframe's keypoints."""
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    T_cw = se3.inverse(kf_pose)

    def surf_xyz_fn(u, v):
        d = bspline.evaluate(surf_ctrl, u, v, dom)
        cam_pts = jnp.stack([u * d, v * d, d], axis=-1)
        aligned = reg.s * cam_pts @ reg.R.T + reg.t
        return se3.transform(T_cw, aligned)

    nodes = meshmod.grid_nodes_from_surface(surf_xyz_fn, dom, topo)
    template = meshmod.make_template(nodes, topo)
    pts_world = surf_xyz_fn(retina[:, 0], retina[:, 1])
    facet, bary, inside = meshmod.embed_uv(retina, dom, topo)
    return TemplateRegen(
        template=template,
        point_xyz=pts_world,
        point_facet=facet,
        point_bary=bary,
        point_inside=inside,
    )
