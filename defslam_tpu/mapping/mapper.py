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
from defslam_tpu.utils import masked_median

# padded capacity of matched points per warp pair
PAIR_CAP = 512
# padded capacity of pair-observations per map point for the normal solver
OBS_CAP = 8
# Unit conversion for the covNorm reliability gate: the reference thresholds
# the Ceres covariance diagonal of ITS cost (pixel-scaled residuals) at
# Regularizer.Reliability (NormalEstimator.cc:159).  Our normal solver
# minimizes unit-Frobenius-normalized metric residuals, whose JtJ lives in
# different units.  Calibrated by test_cov_gate_scale_separates_populations
# (tests/test_nrsfm.py): conditioned normals (diverse-baseline pairs) show
# cov diagonals <= ~1e2 even at only 2 observations, degenerate
# (short-baseline) observations land at >= ~1e7 — the gate sits in the
# geometric middle of that 5-decade gap so neither population can drift
# across it.  reliability * COV_GATE_SCALE: 0.7 -> gate 1400.
COV_GATE_SCALE = 2000.0


def normal_reliability_gate(nres, reliability: float) -> jnp.ndarray:
    """covNorm acceptance mask (P,) — see COV_GATE_SCALE."""
    gate = reliability * COV_GATE_SCALE
    return (
        nres.valid
        & (nres.n_obs > 0)
        & (nres.cov[:, 0, 0] <= gate)
        & (nres.cov[:, 1, 1] <= gate)
    )


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


class CovisPairs(NamedTuple):
    """Device-built warp-pair tables for one new keyframe."""

    pair_kf: jnp.ndarray  # (NP,) int32 covisible keyframe slot per pair
    pair_valid: jnp.ndarray  # (NP,) bool
    pid_table: jnp.ndarray  # (NP, PAIR_CAP) int32 shared point id, -1 pad
    uv1: jnp.ndarray  # (NP, PAIR_CAP, 2) new-KF retina coords
    uv2: jnp.ndarray  # (NP, PAIR_CAP, 2) covisible-KF retina coords
    kp_new: jnp.ndarray  # (NP, PAIR_CAP) int32 new-KF keypoint index
    kp_other: jnp.ndarray  # (NP, PAIR_CAP) int32 covisible-KF keypoint index
    mask: jnp.ndarray  # (NP, PAIR_CAP) bool
    n_pairs: jnp.ndarray  # () int32
    # truncation observability (the reference accumulates unbounded
    # observation sets, SchwarpDatabase.cc:83-118 — we cap at static shapes
    # and COUNT what fell off so coverage loss is never silent)
    n_pair_dropped: jnp.ndarray  # () int32 eligible pairs past max_warp_pairs
    n_pt_dropped: jnp.ndarray  # () int32 shared points past PAIR_CAP


@functools.partial(jax.jit, static_argnames=("cfg",))
def covis_pairs(
    point_id: jnp.ndarray,  # (F, K) kp->point tables
    retina: jnp.ndarray,  # (F, K, 2)
    kf_valid: jnp.ndarray,  # (F,)
    points_valid: jnp.ndarray,  # (P,)
    slot: jnp.ndarray,  # () int32 — the new keyframe
    cfg: Config,
) -> CovisPairs:
    """Covisible-anchor selection + matched-pair table construction, fully
    on device (SchwarpDatabase::add anchor selection, SchwarpDatabase.cc:
    83-118: every stored keyframe sharing >= min_shared_points map points
    with the new one, strongest first).

    Replaces the round-1 host loop (per-keyframe ctypes intersection +
    numpy staging of the uv tables): point->keypoint inverse tables are
    built with two scatters, pair membership is one (F, P) mask, and the
    top pairs/points come out of top_k — zero host work, one dispatch."""
    f_cap, k_cap = point_id.shape
    p_cap = points_valid.shape[0]
    np_pairs = cfg.capacity.max_warp_pairs

    ar_k = jnp.arange(k_cap, dtype=jnp.int32)
    # inverse tables: point id -> keypoint index (-1 when unobserved)
    dest_new = jnp.where(point_id[slot] >= 0, point_id[slot], p_cap)
    inv_new = jnp.full(p_cap, -1, jnp.int32).at[dest_new].set(
        ar_k, mode="drop"
    )
    dest_all = jnp.where(point_id >= 0, point_id, p_cap)
    inv_all = jnp.full((f_cap, p_cap), -1, jnp.int32).at[
        jnp.arange(f_cap)[:, None], dest_all
    ].set(ar_k[None], mode="drop")

    shared = (inv_new >= 0)[None, :] & (inv_all >= 0) & points_valid[None, :]
    counts = jnp.sum(shared, axis=1).astype(jnp.int32)
    eligible = kf_valid & (jnp.arange(f_cap) != slot)
    counts = jnp.where(
        eligible & (counts >= cfg.mapping.min_shared_points), counts, -1
    )
    n_eligible = jnp.sum(counts > 0).astype(jnp.int32)
    top_counts, pair_kf = jax.lax.top_k(counts, min(np_pairs, f_cap))
    if np_pairs > f_cap:  # pad to the static pair capacity
        pad = np_pairs - f_cap
        top_counts = jnp.concatenate([top_counts, jnp.full(pad, -1, jnp.int32)])
        pair_kf = jnp.concatenate([pair_kf, jnp.zeros(pad, jnp.int32)])
    pair_valid = top_counts > 0
    n_pt_dropped = jnp.sum(
        jnp.where(pair_valid, jnp.maximum(top_counts - PAIR_CAP, 0), 0)
    ).astype(jnp.int32)

    # up to PAIR_CAP shared points per pair (lowest point ids first — the
    # deterministic tie-break of top_k over the 0/1 membership mask); tiny
    # configs with fewer point slots than PAIR_CAP pad up to the static
    # table width
    sh_sel = shared[pair_kf]  # (NP, P)
    ones, pid_sel = jax.lax.top_k(
        sh_sel.astype(jnp.int32), min(PAIR_CAP, p_cap)
    )
    if p_cap < PAIR_CAP:
        pad = PAIR_CAP - p_cap
        ones = jnp.pad(ones, ((0, 0), (0, pad)))
        pid_sel = jnp.pad(pid_sel, ((0, 0), (0, pad)))
    sel_ok = (ones > 0) & pair_valid[:, None]
    kp_new = inv_new[pid_sel]  # (NP, C)
    kp_i = inv_all[pair_kf[:, None], pid_sel]
    uv1 = retina[slot][jnp.clip(kp_new, 0, k_cap - 1)]
    uv2 = retina[pair_kf[:, None], jnp.clip(kp_i, 0, k_cap - 1)]
    zero2 = jnp.zeros_like(uv1)
    return CovisPairs(
        pair_kf=pair_kf,
        pair_valid=pair_valid,
        pid_table=jnp.where(sel_ok, pid_sel, -1),
        uv1=jnp.where(sel_ok[:, :, None], uv1, zero2),
        uv2=jnp.where(sel_ok[:, :, None], uv2, zero2),
        kp_new=jnp.where(sel_ok, kp_new, -1),
        kp_other=jnp.where(sel_ok, kp_i, -1),
        mask=sel_ok,
        n_pairs=jnp.sum(pair_valid).astype(jnp.int32),
        n_pair_dropped=jnp.maximum(
            n_eligible - jnp.sum(pair_valid), 0
        ).astype(jnp.int32),
        n_pt_dropped=n_pt_dropped,
    )


@functools.partial(jax.jit, static_argnames=("n_points", "obs_cap"))
def accumulate_obs_device(
    pid: jnp.ndarray,  # (NP, PAIR_CAP) int32 point id per observation
    mask: jnp.ndarray,  # (NP, PAIR_CAP) bool
    uv1: jnp.ndarray,  # (NP, PAIR_CAP, 2)
    warped: jnp.ndarray,  # (NP, PAIR_CAP, 2)
    J12: jnp.ndarray,  # (NP, PAIR_CAP, 2, 2)
    Huu: jnp.ndarray,  # (NP, PAIR_CAP, 2)
    Hvv: jnp.ndarray,  # (NP, PAIR_CAP, 2)
    n_points: int,
    obs_cap: int = OBS_CAP,
) -> nrm.PairObs:
    """Per-point observation tables for the normal solver, on device.

    Same semantics as the native/numpy ``native.accumulate_obs`` (arrival
    order, capped at ``obs_cap`` per point) via one stable sort: rows are
    keyed by point id, the within-group rank is position minus the group's
    first position, and rows ranked past the cap are dropped.  Keeps the
    DiffProp arrays on device — the round-1 path shipped ~1.5 MB/keyframe
    to the host for the native scatter and ~1.5 MB back, which dominated
    the mapping step's wall time through a low-bandwidth tunnel."""
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    pidf = flat(pid)
    okf = flat(mask) & (pidf >= 0) & (pidf < n_points)
    key = jnp.where(okf, pidf, n_points)
    # stable argsort via PACK-SORT: key in the high bits, position in the
    # low bits, ONE int32 sort — the variadic (key, iota) sort a stable
    # argsort lowers to moves twice the data through the TPU's bitonic
    # network (measured ~6 ms per keyframe step at the shipped sizes)
    L = key.shape[0]
    bits = max(L - 1, 1).bit_length()
    assert (n_points + 1) << bits < 2**31, "pack-sort key overflow"
    packed = jnp.sort(
        (key << bits) | jnp.arange(L, dtype=jnp.int32)
    )
    order = packed & ((1 << bits) - 1)
    ks = packed >> bits
    first = jnp.searchsorted(ks, ks, side="left")
    rank = jnp.arange(ks.shape[0]) - first
    store_ok = (ks < n_points) & (rank < obs_cap)
    dest = jnp.where(store_ok, ks * obs_cap + rank, n_points * obs_cap)

    def scat(a, init):
        src = flat(a)[order]
        buf = jnp.concatenate(
            [init.reshape((n_points * obs_cap,) + src.shape[1:]),
             jnp.zeros((1,) + src.shape[1:], src.dtype)]
        )
        out = buf.at[dest].set(src, mode="drop")
        return out[:-1].reshape((n_points, obs_cap) + src.shape[1:])

    z2 = jnp.zeros((n_points, obs_cap, 2), jnp.float32)
    eye = jnp.tile(jnp.eye(2, dtype=jnp.float32), (n_points, obs_cap, 1, 1))
    obs_mask = (
        jnp.zeros(n_points * obs_cap + 1, bool)
        .at[dest].set(store_ok, mode="drop")[:-1]
        .reshape(n_points, obs_cap)
    )
    n_dropped = jnp.sum((ks < n_points) & (rank >= obs_cap)).astype(jnp.int32)
    return nrm.PairObs(
        uv1=scat(uv1, z2),
        uv2=scat(warped, z2),
        J12=scat(J12, eye),
        Huu=scat(Huu, z2),
        Hvv=scat(Hvv, z2),
        mask=obs_mask,
    ), n_dropped


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

    pred = jax.vmap(
        lambda ctrl: bspline.evaluate(ctrl, retina1[:, 0], retina1[:, 1], dom)
    )(ctrls)  # (NP, K, 2) warp predictions of every KF1 kp in each KF2
    va = valid1[None, :] & pair_valid[:, None]  # (NP, K)

    if jax.default_backend() == "tpu":
        # fused Pallas path: windowed Hamming + two-min reduction per row,
        # batched over the pair axis — the XLA path below materializes the
        # (NP, K, K) distance matrix (plus the (NP, K, K, 8) XOR tensor)
        # in HBM, which dominates the keyframe chain's device time at
        # reference scale (35-62 ms of keyframe_step_a, BASELINE.md r5)
        from defslam_tpu.ops.pallas_kernels import windowed_match_pallas

        n_pairs, k_cap = desc2.shape[0], desc1.shape[0]
        d1 = jnp.broadcast_to(desc1[None], (n_pairs, k_cap, 8))
        best, idx, second = windowed_match_pallas(
            d1, desc2, pred, retina2, va, valid2, float(rad_ret)
        )
        # reverse direction for the mutual-best check
        _, ridx, _ = windowed_match_pallas(
            desc2, d1, retina2, pred, valid2, va, float(rad_ret)
        )
        ok = best <= th
        if cfg.tracking.nn_ratio < 1.0:
            ok &= best.astype(jnp.float32) <= (
                cfg.tracking.nn_ratio * second.astype(jnp.float32)
            )
        back = jnp.take_along_axis(
            ridx, jnp.clip(idx, 0, desc2.shape[1] - 1), axis=1
        )
        ok &= back == jnp.arange(k_cap, dtype=jnp.int32)[None, :]
        return jnp.where(ok, idx, -1), best

    def one(p, ret2, v2, d2, va_row):
        window = matching.window_mask(p, ret2, rad_ret)
        dist = matching.masked_hamming(
            desc1, d2, va_row, v2, pair_mask=window, use_pallas=False,
        )  # vmapped over pairs -> XLA path
        m = matching.best_match(
            dist, max_dist=th, nn_ratio=cfg.tracking.nn_ratio, mutual=True
        )
        return m.idx, m.dist

    return jax.vmap(one)(pred, retina2, valid2, desc2, va)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def solve_normals(
    obs: nrm.PairObs, k_init: jnp.ndarray, num_iters: int = 30
) -> nrm.NormalResult:
    return nrm.solve_k1k2(obs, k_init, num_iters=num_iters)


@functools.partial(jax.jit, static_argnames=("capacity", "num_iters"))
def solve_normals_compact(
    obs: nrm.PairObs, k_init: jnp.ndarray, capacity: int, num_iters: int = 30
) -> nrm.NormalResult:
    """solve_normals with the point axis COMPACTED to `capacity` slots
    before the vmapped LM: only points with >=1 pair observation can solve,
    and at most K (the new keyframe's keypoint count) distinct points
    appear in the pair tables — solving the full store capacity wastes
    P/K lanes (2.7x at the shipped 4096/1536).  Results scatter back to
    the full axis; pass capacity >= the max distinct observed points
    (min(max_keypoints, P))."""
    from defslam_tpu.ops import matching

    p_cap = k_init.shape[0]
    if capacity >= p_cap:
        return nrm.solve_k1k2(obs, k_init, num_iters=num_iters)
    has = jnp.any(obs.mask, axis=1)
    sel, sel_ok, _ = matching.compact_select(has, capacity)
    obs_c = jax.tree.map(lambda a: a[sel], obs)
    obs_c = obs_c._replace(mask=obs_c.mask & sel_ok[:, None])
    r = nrm.solve_k1k2(obs_c, k_init[sel], num_iters=num_iters)
    k = jnp.zeros((p_cap, 2), k_init.dtype).at[sel].set(r.k)
    cov_init = jnp.tile(
        (jnp.eye(2, dtype=r.cov.dtype) * 1e12)[None], (p_cap, 1, 1)
    )
    cov = cov_init.at[sel].set(r.cov)
    cost = jnp.zeros(p_cap, r.cost.dtype).at[sel].set(r.cost)
    n_obs = jnp.zeros(p_cap, jnp.int32).at[sel].set(
        r.n_obs.astype(jnp.int32)
    )
    valid = jnp.zeros(p_cap, bool).at[sel].set(r.valid & sel_ok)
    return nrm.NormalResult(k=k, cov=cov, cost=cost, n_obs=n_obs, valid=valid)


def bbox_domain(
    uv: jnp.ndarray,  # (K, 2) retina keypoints
    valid: jnp.ndarray,  # (K,) bool
    fallback: jnp.ndarray,  # (4,) domain when degenerate/empty
    margin: float = 0.10,
    min_extent: float = 0.05,
) -> jnp.ndarray:
    """Keypoint bounding-box retina domain + relative margin — the
    reference's per-keyframe warp domain (DefKeyFrame::NormaliseKeypoints,
    DefKeyFrame.cc:94-133).  Falls back to ``fallback`` (the camera-wide
    domain) when fewer than 4 keypoints are valid or either extent is
    degenerate.  Fully jittable (traced output)."""
    big = jnp.asarray(1e9, uv.dtype)
    lo_u = jnp.min(jnp.where(valid, uv[:, 0], big))
    hi_u = jnp.max(jnp.where(valid, uv[:, 0], -big))
    lo_v = jnp.min(jnp.where(valid, uv[:, 1], big))
    hi_v = jnp.max(jnp.where(valid, uv[:, 1], -big))
    du, dv = hi_u - lo_u, hi_v - lo_v
    dom_bb = jnp.stack([
        lo_u - margin * du, hi_u + margin * du,
        lo_v - margin * dv, hi_v + margin * dv,
    ])
    ok = (
        (jnp.sum(valid) >= 4) & (du >= min_extent) & (dv >= min_extent)
    )
    return jnp.where(ok, dom_bb, fallback)


@functools.partial(jax.jit, static_argnames=("cfg",))
def integrate_surface(
    retina: jnp.ndarray,  # (K, 2) ref-KF keypoint retina coords
    k_vals: jnp.ndarray,  # (K, 2) per-keypoint (k1, k2)
    mask: jnp.ndarray,  # (K,) bool valid normals
    dom: jnp.ndarray,
    bending: jnp.ndarray,
    cfg: Config,
    ext_dom: jnp.ndarray | None = None,
) -> sfn.SfNResult:
    normals = nrm.normal_from_k(k_vals, retina)
    return sfn.solve(
        retina, normals, mask, dom,
        cfg.mapping.sfn_ctrl_u, cfg.mapping.sfn_ctrl_v,
        bending, cfg.mapping.bending, mean_depth=1.0,
        flat_extension=cfg.mapping.sfn_flat_extension,
        tilt_extension=cfg.mapping.sfn_tilt_extension,
        ext_dom=ext_dom,
    )


@jax.jit
def registration_pairs(
    surf_xyz: jnp.ndarray,  # (K, 3) SfN surface at the KF keypoints
    pid_row: jnp.ndarray,  # (K,) kp->point
    kp_xyz: jnp.ndarray,  # (K, 3) positions REGISTERED at KF insertion
    kp_xyz_valid: jnp.ndarray,  # (K,)
    norm_valid: jnp.ndarray,  # (K,) normal reliability (covNorm gate)
    points_valid: jnp.ndarray,  # (P,)
    points_facet: jnp.ndarray,  # (P,)
    kf_pose: jnp.ndarray,  # (4, 4)
):
    """Gather (surface, registered-map) 3D pairs in the KF camera frame
    for Sim(3) registration — SurfaceRegistration.cc:48-105: uses the
    positions stored at keyframe insertion (DefMapPoint::PosesKeyframes,
    not the current re-posed positions), requires the point embedded
    (getFacet) and its normal reliably estimated (covNorm)."""
    p_cap = points_valid.shape[0]
    pid = jnp.clip(pid_row, 0, p_cap - 1)
    embedded = (
        (pid_row >= 0)
        & points_valid[pid]
        & (points_facet[pid] >= 0)
        & kp_xyz_valid
    )
    mask = embedded & norm_valid
    map_cam = se3.transform(kf_pose, kp_xyz)
    # `mask` (covNorm-gated) drives the Sim3 registration, mirroring the
    # reference; `embedded` additionally keeps pairs whose normal did NOT
    # solve this round — exactly the newly-explored region where the SfN
    # surface is extrapolation.  polish_surface anchors on `embedded` so
    # the old registered map depth there survives the swap instead of
    # every point being dragged onto the extrapolated spline (the round-5
    # diagnosed per-swap scale-ratchet mechanism, see BASELINE.md).
    return surf_xyz, jnp.where(embedded[:, None], map_cam, 0.0), mask, embedded


def polish_surface(
    ctrl: jnp.ndarray,  # (nu, nv) SfN control depths
    reg: registration.RegistrationResult,
    retina: jnp.ndarray,  # (K, 2) keyframe keypoints (retina)
    map_cam: jnp.ndarray,  # (K, 3) registered map positions, camera frame
    pair_mask: jnp.ndarray,  # (K,) registration pairs
    dom: jnp.ndarray,
    bend: jnp.ndarray,
    cfg: Config,
    grid_dom: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Map-consistency polish (see MappingConfig.consistency_polish): re-fit
    the surface control depths so the registered surface passes through the
    existing inlier map points while grid anchors keep the SfN shape where
    no pairs exist.  One ridge-regularized linear solve; the Sim(3) removes
    the gauge, this removes the spline-shaped residual the Sim(3) cannot.

    grid_dom: region covered by the shape anchors (defaults to ``dom``,
    the spline's own domain); with per-KF bbox domains it is the
    camera-wide domain so the polished spline stays anchored over the full
    region downstream template regeneration evaluates."""
    lam = cfg.mapping.consistency_polish
    if lam <= 0.0:
        return ctrl
    gdom = dom if grid_dom is None else grid_dom
    nu, nv = ctrl.shape
    u, v = retina[:, 0], retina[:, 1]
    # target depths along each keypoint ray, pulled into the surface frame:
    # x_surf = (1/s) R^T (m - t)  =>  d = <x_surf, ray> / |ray|^2
    x_t = (map_cam - reg.t) @ reg.R / jnp.maximum(reg.s, 1e-9)
    ray2 = u * u + v * v + 1.0
    d_tgt = (x_t[:, 0] * u + x_t[:, 1] * v + x_t[:, 2]) / ray2
    # inlier gate: current surface->map residual within 2.5x median
    d_cur = bspline.evaluate(ctrl, u, v, dom)
    surf = jnp.stack([u * d_cur, v * d_cur, d_cur], axis=-1)
    r = jnp.linalg.norm(reg.s * surf @ reg.R.T + reg.t - map_cam, axis=-1)
    med = masked_median(r, pair_mask)
    w_t = (
        pair_mask & (r <= 2.5 * med + 1e-9) & (d_tgt > 1e-3)
    ).astype(ctrl.dtype) * lam
    # SfN-shape anchors on a static grid (weight 1)
    g = 16
    gu = jnp.linspace(gdom[0], gdom[1], g)
    gv = jnp.linspace(gdom[2], gdom[3], g)
    GU, GV = jnp.meshgrid(gu, gv, indexing="ij")
    gu, gv = GU.reshape(-1), GV.reshape(-1)
    d_grid = bspline.evaluate(ctrl, gu, gv, dom)

    uu = jnp.concatenate([u, gu])
    vv = jnp.concatenate([v, gv])
    vals = jnp.concatenate([d_tgt, d_grid])
    wts = jnp.concatenate([w_t, jnp.ones(g * g, ctrl.dtype)])
    A = bspline.coloc_2d(uu, vv, dom, nu, nv)  # (N, nu*nv)
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.einsum("n,ni,nj->ij", wts, A, A, precision=hp) + 1e-3 * bend
    k = nu * nv
    AtA = AtA + (1e-6 * jnp.trace(AtA) / k) * jnp.eye(k, dtype=ctrl.dtype)
    Aty = jnp.einsum("n,ni,n->i", wts, A, vals, precision=hp)
    return jnp.linalg.solve(AtA, Aty).reshape(nu, nv)


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


@functools.partial(jax.jit, donate_argnums=(0,))
def apply_densify(
    point_id: jnp.ndarray,  # (F, K) the full kp->point tables
    n_obs: jnp.ndarray,  # (P,)
    slot: jnp.ndarray,  # () int32 — the new keyframe
    kf_idx: jnp.ndarray,  # (NP,) covisible keyframe per pair
    best: jnp.ndarray,  # (NP, K) best kp2 index per new-KF kp, -1 none
):
    """Merge densified matches into the observation tables, one fused update
    (the reference mutates MapPoint/KeyFrame objects one at a time,
    DefORBmatcher.cc:270-292).

    Rules per (pair pi, kp k) with match j = best[pi, k]:
      new-KF kp has a point, other hasn't -> other gains the observation
      other has a point, new-KF kp hasn't -> new KF gains the observation
    """
    n_pairs, k_cap = best.shape
    p_cap = n_obs.shape[0]
    pid_new = point_id[slot]  # (K,)

    j = jnp.clip(best, 0, k_cap - 1)
    matched = best >= 0
    pid_other = jnp.take_along_axis(point_id[kf_idx], j, axis=1)  # (NP, K)

    give_other = matched & (pid_new[None, :] >= 0) & (pid_other < 0)
    give_new = matched & (pid_new[None, :] < 0) & (pid_other >= 0)

    # other keyframes gain observations of the new KF's points
    flat_rows = jnp.repeat(kf_idx, k_cap)
    flat_cols = jnp.where(give_other, j, k_cap).reshape(-1)  # k_cap = dropped
    flat_vals = jnp.broadcast_to(pid_new[None, :], best.shape).reshape(-1)
    point_id = point_id.at[flat_rows, flat_cols].set(
        flat_vals, mode="drop"
    )
    # the new KF gains observations of other keyframes' points (first pair
    # providing one wins; later scatters overwrite harmlessly)
    new_cols = jnp.where(give_new, jnp.arange(k_cap)[None, :], k_cap).reshape(-1)
    point_id = point_id.at[jnp.broadcast_to(slot, new_cols.shape), new_cols].set(
        pid_other.reshape(-1), mode="drop"
    )
    delta = jnp.zeros(p_cap, jnp.int32)
    delta = delta.at[jnp.where(give_other, flat_vals.reshape(best.shape), p_cap).reshape(-1)].add(
        1, mode="drop"
    )
    delta = delta.at[jnp.where(give_new, pid_other, p_cap).reshape(-1)].add(
        1, mode="drop"
    )
    return point_id, n_obs + delta


@jax.jit
def write_normals(
    norm_k: jnp.ndarray,  # (F, K, 2)
    norm_valid: jnp.ndarray,  # (F, K)
    slot: jnp.ndarray,  # ()
    pid_row: jnp.ndarray,  # (K,) kp->point of the new KF
    k_solved: jnp.ndarray,  # (P, 2)
    solved_ok: jnp.ndarray,  # (P,) bool
):
    """Write solved per-point normals into the keyframe's per-keypoint slots
    (Surface::setNormalSurfacePoint equivalent), one fused scatter."""
    p_cap = k_solved.shape[0]
    pid = jnp.clip(pid_row, 0, p_cap - 1)
    has = (pid_row >= 0) & solved_ok[pid]
    vals = k_solved[pid]
    norm_k = norm_k.at[slot].set(
        jnp.where(has[:, None], vals, norm_k[slot])
    )
    norm_valid = norm_valid.at[slot].set(norm_valid[slot] | has)
    return norm_k, norm_valid, jnp.sum(has)


@jax.jit
def propagate_normals(
    norm_k: jnp.ndarray,  # (F, K, 2)
    norm_valid: jnp.ndarray,  # (F, K)
    cp: "CovisPairs",
    dps,  # warp.DiffProps of the fitted pairs
    k_solved: jnp.ndarray,  # (P, 2) solved (k1, k2) at the NEW keyframe
    solved_ok: jnp.ndarray,  # (P,)
):
    """Propagate solved normals to the covisible keyframes through the warp
    Jacobians (NormalEstimator.cc:173-224: the normal estimated at the
    anchor view is transferred to every other observing keyframe with the
    infinitesimal-planarity transfer formula) — one batched transfer +
    scatter over all (pair, point) observations."""
    from defslam_tpu.mapping import normals as nrm

    p_cap = k_solved.shape[0]
    f_cap, k_cap = norm_valid.shape
    pid = jnp.clip(cp.pid_table, 0, p_cap - 1)
    has = (
        (cp.pid_table >= 0)
        & solved_ok[pid]
        & dps.mask
        & (cp.kp_other >= 0)
    )
    k_t = nrm.transfer_k(k_solved[pid], nrm.pair_obs(dps))  # (NP, C, 2)
    rows = jnp.where(has, cp.pair_kf[:, None], f_cap).reshape(-1)
    cols = jnp.clip(cp.kp_other, 0, k_cap - 1).reshape(-1)
    norm_k = norm_k.at[rows, cols].set(k_t.reshape(-1, 2), mode="drop")
    norm_valid = norm_valid.at[rows, cols].set(True, mode="drop")
    return norm_k, norm_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def exploration_count(
    kp_xy: jnp.ndarray,  # (K, 2) pixel coords of the new KF's keypoints
    kp_valid: jnp.ndarray,  # (K,)
    pid_row: jnp.ndarray,  # (K,) kp->point (-1 = unmatched)
    cfg: Config,
) -> jnp.ndarray:
    """needNewTemplate's exploration test (DefLocalMapping.cc:355-404):
    rasterize matched keypoints into an occupancy image, dilate with a
    (width/20)^2 box (the reference's filter2D + threshold), and count the
    unmatched keypoints OUTSIDE the dilated mask — keypoints in genuinely
    new image regions.  Returns the count (int32 scalar)."""
    h, w = cfg.camera.height, cfg.camera.width
    x = jnp.clip(kp_xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(kp_xy[:, 1].astype(jnp.int32), 0, h - 1)
    matched = kp_valid & (pid_row >= 0)
    occ = jnp.zeros((h, w), jnp.float32).at[y, x].max(
        matched.astype(jnp.float32)
    )
    k = max(w // 20, 1)
    dil = jax.lax.reduce_window(
        occ, 0.0, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    outside = dil[y, x] < 0.5
    return jnp.sum(kp_valid & (pid_row < 0) & outside).astype(jnp.int32)


@jax.jit
def select_ref_keyframe(
    pid_row: jnp.ndarray,  # (K,) the new KF's kp->point table
    point_ref_kf: jnp.ndarray,  # (P,) creating keyframe of each point
    point_valid: jnp.ndarray,  # (P,)
    kf_valid: jnp.ndarray,  # (F,)
    slot: jnp.ndarray,  # () the new KF (fallback)
) -> jnp.ndarray:
    """selectKeyframe (DefLocalMapping.cc:411-441): among the map points the
    new keyframe observes, vote for each point's reference (creating)
    keyframe; the argmax wins, the new KF itself if no votes."""
    p_cap = point_ref_kf.shape[0]
    f_cap = kf_valid.shape[0]
    pid = jnp.clip(pid_row, 0, p_cap - 1)
    ok = (pid_row >= 0) & point_valid[pid]
    ref = jnp.clip(point_ref_kf[pid], 0, f_cap - 1)
    votes = jnp.zeros(f_cap, jnp.int32).at[
        jnp.where(ok, ref, f_cap)
    ].add(1, mode="drop")
    votes = jnp.where(kf_valid, votes, 0)
    best = jnp.argmax(votes).astype(jnp.int32)
    return jnp.where(votes[best] > 0, best, slot)


class TemplateRegen(NamedTuple):
    template: meshmod.Template
    point_xyz: jnp.ndarray  # (K, 3) world positions of ref-KF keypoints
    point_facet: jnp.ndarray  # (K,) facet of each ref-KF keypoint
    point_bary: jnp.ndarray  # (K, 3)
    point_inside: jnp.ndarray  # (K,) bool — keypoint inside mesh domain


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def rebuild_points(
    points,  # PointStore (donated)
    regen: "TemplateRegen",
    kf_pose: jnp.ndarray,  # (4, 4)
    K: jnp.ndarray,
    pid_row: jnp.ndarray,  # (K,) kp->point of the reference keyframe
    kp_valid: jnp.ndarray,  # (K,)
    kp_desc: jnp.ndarray,  # (K, 8)
    kp_angle: jnp.ndarray,  # (K,)
    slot: jnp.ndarray,  # () int32
    dom: jnp.ndarray,
    cfg: Config,
    kf_counter: jnp.ndarray | int = 0,  # () int32 birth stamp of new points
):
    """CreateNewMapPoints (DefLocalMapping.cc:240-347) as ONE fused update:

    1. points observed by the reference KF move onto the new surface;
    2. every point is re-embedded into the new template via its projection
       into the reference keyframe's retina;
    3. unmatched keypoints inside the mesh become new map points, allocated
       into free store slots by a cumsum ranking (no host loop).

    Returns (new PointStore, updated pid_row).
    """
    from defslam_tpu.geometry import camera as cammod

    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    p_cap = points.capacity
    k_cap = pid_row.shape[0]

    # --- 1. reposition observed points onto the registered surface
    cond = (pid_row >= 0) & regen.point_inside & kp_valid
    tgt = jnp.where(cond, jnp.clip(pid_row, 0, p_cap - 1), p_cap)
    xyz = points.xyz.at[tgt].set(regen.point_xyz, mode="drop")

    # --- 2. re-embed all points through the ref-KF projection
    pc = se3.transform(kf_pose, xyz)
    retina_p = jnp.stack(
        [pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6), pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6)],
        axis=-1,
    )
    facet_all, bary_all, inside_all = meshmod.embed_uv(retina_p, dom, topo)
    embeddable = inside_all & (pc[:, 2] > 1e-6) & points.valid
    facet = jnp.where(embeddable, facet_all, -1)
    bary = jnp.where(embeddable[:, None], bary_all, 0.0)

    # --- 3. allocate new points for unmatched keypoints inside the mesh
    new_mask = kp_valid & (pid_row < 0) & regen.point_inside
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # (K,)
    free_order = jnp.argsort(points.valid.astype(jnp.int32), stable=True)
    n_free = jnp.sum(~points.valid)
    can = new_mask & (rank < n_free)
    dest = jnp.where(can, free_order[jnp.clip(rank, 0, p_cap - 1)], p_cap)

    xyz = xyz.at[dest].set(regen.point_xyz, mode="drop")
    desc = points.desc.at[dest].set(kp_desc, mode="drop")
    angle = points.angle.at[dest].set(kp_angle, mode="drop")
    facet = facet.at[dest].set(regen.point_facet, mode="drop")
    bary = bary.at[dest].set(regen.point_bary, mode="drop")
    ref_kf = points.ref_kf.at[dest].set(slot.astype(jnp.int32), mode="drop")
    ref_kp = points.ref_kp.at[dest].set(
        jnp.arange(k_cap, dtype=jnp.int32), mode="drop"
    )
    valid = points.valid.at[dest].set(True, mode="drop")
    n_obs = points.n_obs.at[dest].set(1, mode="drop")
    # lifecycle counters of new points: Found/Visible start at 1/1
    # (MapPoint ctor) and the birth keyframe is stamped for the
    # found-ratio culling window (LocalMapping.cc:173-199)
    ones = jnp.ones(k_cap, jnp.int32)
    n_visible = points.n_visible.at[dest].set(ones, mode="drop")
    n_found = points.n_found.at[dest].set(ones, mode="drop")
    first_kf = points.first_kf.at[dest].set(
        jnp.asarray(kf_counter, jnp.int32), mode="drop"
    )
    norm_k0 = points.norm_k0.at[dest].set(jnp.zeros((k_cap, 2)), mode="drop")

    pid_row_new = jnp.where(can, dest.astype(jnp.int32), pid_row)
    new_points = points._replace(
        xyz=xyz, desc=desc, angle=angle, facet=facet, bary=bary,
        ref_kf=ref_kf, ref_kp=ref_kp, valid=valid, n_obs=n_obs,
        n_visible=n_visible, n_found=n_found, first_kf=first_kf,
        norm_k0=norm_k0,
    )
    return new_points, pid_row_new


@functools.partial(jax.jit, donate_argnums=(0,))
def cull_points(points, point_id: jnp.ndarray, kf_valid: jnp.ndarray,
                kf_counter: jnp.ndarray | int = 1 << 30):
    """MapPointCulling (LocalMapping.cc:173-199, run inside the deformable
    pipeline by DefLocalMapping.cc:115-130):

    - a point is dropped when no valid keyframe references it AND it is not
      embedded in the template (the reference's SetBadFlag reachability);
    - RECENT points (born within the last 3 keyframes) are additionally
      culled by the found/visible ratio < 0.25 rule and by the
      age>=2 && observations<=2 rule — exactly the reference's two tests
      (mnFirstKFid window, GetFoundRatio).

    Returns (points, n_culled).  Pass kf_counter = the current keyframe
    counter; the default (huge) disables the recency rules for callers that
    only want the reachability sweep."""
    p_cap = points.capacity
    ids = jnp.where(
        kf_valid[:, None] & (point_id >= 0), point_id, p_cap
    ).reshape(-1)
    referenced = (
        jnp.zeros(p_cap, bool).at[ids].set(True, mode="drop")
    )
    keep = points.valid & (referenced | (points.facet >= 0))
    age = jnp.asarray(kf_counter, jnp.int32) - points.first_kf
    recent = age < 3
    ratio = points.n_found.astype(jnp.float32) / jnp.maximum(
        points.n_visible, 1
    ).astype(jnp.float32)
    bad_recent = recent & (
        (ratio < 0.25) | ((age >= 2) & (points.n_obs <= 2))
    )
    keep = keep & ~bad_recent
    n_culled = jnp.sum(points.valid & ~keep).astype(jnp.int32)
    return points._replace(valid=keep), n_culled


@jax.jit
def distinctive_descriptors(
    point_id: jnp.ndarray,  # (F, K) kp->point tables
    kf_valid: jnp.ndarray,  # (F,)
    kp_valid: jnp.ndarray,  # (F, K)
    kf_desc: jnp.ndarray,  # (F, K, 8) uint32
    points_desc: jnp.ndarray,  # (P, 8) current distinctive descriptors
):
    """MapPoint::ComputeDistinctiveDescriptors, batched: for every map point
    gather up to OBS_CAP observed descriptors from the keyframes that see it
    (same sort-scatter as accumulate_obs_device) and keep the MEDOID — the
    descriptor minimizing the summed Hamming distance to the others.  Points
    with < 2 gathered observations keep their current descriptor."""
    f_cap, k_cap = point_id.shape
    p_cap = points_desc.shape[0]
    pidf = jnp.where(
        kf_valid[:, None] & kp_valid & (point_id >= 0), point_id, p_cap
    ).reshape(-1)
    order = jnp.argsort(pidf, stable=True)
    ks = pidf[order]
    first = jnp.searchsorted(ks, ks, side="left")
    rank = jnp.arange(ks.shape[0]) - first
    store_ok = (ks < p_cap) & (rank < OBS_CAP)
    dest = jnp.where(store_ok, ks * OBS_CAP + rank, p_cap * OBS_CAP)
    src = kf_desc.reshape(-1, 8)[order]
    buf = jnp.zeros((p_cap * OBS_CAP + 1, 8), jnp.uint32).at[dest].set(
        src, mode="drop"
    )[:-1].reshape(p_cap, OBS_CAP, 8)
    got = jnp.zeros(p_cap * OBS_CAP + 1, bool).at[dest].set(
        store_ok, mode="drop"
    )[:-1].reshape(p_cap, OBS_CAP)
    # pairwise Hamming between the gathered descriptors, (P, O, O)
    x = buf[:, :, None, :] ^ buf[:, None, :, :]
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    pair_ok = got[:, :, None] & got[:, None, :]
    sums = jnp.sum(jnp.where(pair_ok, d, 0), axis=-1)  # (P, O)
    sums = jnp.where(got, sums, jnp.iinfo(jnp.int32).max)
    best = jnp.argmin(sums, axis=-1)  # (P,)
    medoid = jnp.take_along_axis(buf, best[:, None, None], axis=1)[:, 0]
    n_got = jnp.sum(got, axis=1)
    return jnp.where((n_got >= 2)[:, None], medoid, points_desc)


class MappingDiag(NamedTuple):
    """Host-relevant scalars of one keyframe mapping step — read back ONCE,
    deferred by a frame (System._pending_map)."""

    slot: jnp.ndarray  # () int32 keyframe slot used
    kf_t: jnp.ndarray  # () int32 template-source keyframe
    accepted: jnp.ndarray  # () bool — template was regenerated + swapped
    exploring: jnp.ndarray  # () bool
    n_pairs: jnp.ndarray  # () int32 covisible warp pairs
    n_new: jnp.ndarray  # () int32 exploration count
    n_norm: jnp.ndarray  # () int32 normals on the template keyframe
    n_culled: jnp.ndarray  # () int32 points culled this step
    obs_dropped: jnp.ndarray  # () int32 observations past OBS_CAP
    pair_dropped: jnp.ndarray  # () int32 eligible pairs past max_warp_pairs
    pt_dropped: jnp.ndarray  # () int32 shared points past PAIR_CAP
    reg_scale: jnp.ndarray  # () f32 accepted Sim3 scale (1.0 when no swap)
    # reg_scale is the surface->map scale of the accepted registration;
    # since SfN median-normalizes the surface to depth 1, its trace across
    # swaps IS the map's absolute-scale trajectory (the on-line analogue of
    # the reference's ScaleVariation.txt stream, Tracking.cc:150-167)


class KFCarry(NamedTuple):
    """Decision scalars handed from keyframe_step_a to keyframe_step_b when
    the chain runs as two interleaved dispatches (tracking.
    split_keyframe_dispatch): everything else B needs lives in the stores."""

    slot: jnp.ndarray  # () int32
    kf_t: jnp.ndarray  # () int32 template-source keyframe
    gate: jnp.ndarray  # () bool — NRSfM chain runs
    exploring: jnp.ndarray  # () bool
    n_new: jnp.ndarray  # () int32
    n_norm: jnp.ndarray  # () int32
    n_pairs: jnp.ndarray  # () int32
    obs_dropped: jnp.ndarray  # () int32
    pair_dropped: jnp.ndarray  # () int32
    pt_dropped: jnp.ndarray  # () int32


def _kf_step_a(
    kfs,
    points,
    pose: jnp.ndarray,
    feats,
    kp_of_point: jnp.ndarray,
    inlier: jnp.ndarray,
    K: jnp.ndarray,
    dom: jnp.ndarray,
    bend_warp: jnp.ndarray,
    tmpl_ref_kf: jnp.ndarray,
    frame_id: jnp.ndarray,
    cfg: Config,
):
    """First half of the keyframe chain: slot selection + insertion +
    warps -> densify -> distinctive descriptors -> normals -> template
    decision scalars.  Returns (kfs, points, KFCarry)."""
    c = cfg
    f_cap = kfs.capacity
    p_cap = points.capacity

    # ---- keyframe slot: first free, else redundancy-aware eviction
    # (KeyFrameCulling's >=90%-redundant rule, LocalMapping.cc:645-725,
    # applied lazily at capacity instead of proactively — a deliberate
    # deviation: fixed-capacity stores make eager deletion pointless; the
    # template-source keyframe is never evicted)
    free = ~kfs.valid
    any_free = jnp.any(free)
    first_free = jnp.argmax(free).astype(jnp.int32)
    pid_ok = kfs.point_id >= 0
    pidc = jnp.clip(kfs.point_id, 0, p_cap - 1)
    redundant = pid_ok & (points.n_obs[pidc] >= 4)
    red_ratio = jnp.sum(redundant, axis=1) / jnp.maximum(
        jnp.sum(pid_ok, axis=1), 1
    )
    evictable = kfs.valid & (jnp.arange(f_cap) != tmpl_ref_kf)
    red_ratio = jnp.where(evictable, red_ratio, -1.0)
    most_red = jnp.argmax(red_ratio).astype(jnp.int32)
    fid_masked = jnp.where(
        evictable, kfs.frame_id, jnp.iinfo(jnp.int32).max
    )
    oldest = jnp.argmin(fid_masked).astype(jnp.int32)
    evict = jnp.where(red_ratio[most_red] > 0.9, most_red, oldest)
    slot = jnp.where(any_free, first_free, evict)

    # ---- insert the keyframe (fused scatter, bumps n_obs)
    from defslam_tpu.mapstore import state as store

    kfs, n_obs2 = store.insert_keyframe_from_matches(
        kfs, points.n_obs, slot, pose, feats, kp_of_point, inlier, K,
        frame_id, points.xyz,
    )
    points = points._replace(n_obs=n_obs2)

    # ---- covisible pairs + batched warp fits
    cp = covis_pairs(
        kfs.point_id, kfs.retina, kfs.valid, points.valid, slot, c
    )
    batch = WarpBatch(
        uv1=cp.uv1, uv2=cp.uv2, mask=cp.mask, pair_valid=cp.pair_valid
    )
    # per-KF warp domain (DefKeyFrame.cc:94-133): all warps in the batch
    # share the NEW keyframe as source, so ONE bbox domain serves the whole
    # batched fit; the bending matrix is the exact affine rescale of three
    # unit-domain constants (no host round trip)
    if c.mapping.per_kf_domain:
        dom_w = bbox_domain(
            kfs.retina[slot], kfs.kp_valid[slot], dom,
            margin=c.mapping.kf_domain_margin,
        )
        bend_w = bspline.bending_matrix_dyn(
            dom_w, c.mapping.warp_ctrl_u, c.mapping.warp_ctrl_v
        )
    else:
        dom_w, bend_w = dom, bend_warp
    dps, ctrls = fit_warps(batch, dom_w, bend_w, c)

    # ---- warp-guided densification + observation-table merge
    best, _dist = densify_matches(
        ctrls, kfs.retina[slot], kfs.kp_valid[slot], kfs.desc[slot],
        kfs.retina[cp.pair_kf], kfs.kp_valid[cp.pair_kf],
        kfs.desc[cp.pair_kf], dom_w, cp.pair_valid, c,
    )
    best = jnp.where(cp.pair_valid[:, None], best, -1)
    point_id2, n_obs3 = apply_densify(
        kfs.point_id, points.n_obs, slot, cp.pair_kf, best
    )
    kfs = kfs._replace(point_id=point_id2)
    points = points._replace(n_obs=n_obs3)
    # distinctive-descriptor refresh now that observations changed
    points = points._replace(
        desc=distinctive_descriptors(
            kfs.point_id, kfs.valid, kfs.kp_valid, kfs.desc, points.desc
        )
    )

    # ---- per-point normal solves (warm-started, covNorm-gated)
    obs, obs_dropped = accumulate_obs_device(
        cp.pid_table, dps.mask, cp.uv1, dps.warped, dps.J12,
        dps.Huu, dps.Hvv, p_cap, OBS_CAP,
    )
    nres = solve_normals_compact(
        obs, points.norm_k0, min(feats.capacity, p_cap),
        num_iters=c.mapping.normal_lm_iterations,
    )
    # covNorm reliability gate (NormalEstimator.cc:159: the covariance
    # diagonal must be below Regularizer.Reliability before a normal is
    # accepted; gated normals also never enter Sim3 registration,
    # SurfaceRegistration.cc:69-77, via norm_valid)
    solved_ok = normal_reliability_gate(nres, c.regularizer.reliability)
    points = points._replace(
        norm_k0=jnp.where(solved_ok[:, None], nres.k, points.norm_k0)
    )
    pid_row = kfs.point_id[slot]
    norm_k, norm_valid, _n_dev = write_normals(
        kfs.norm_k, kfs.norm_valid, slot, pid_row, nres.k, solved_ok
    )
    norm_k, norm_valid = propagate_normals(
        norm_k, norm_valid, cp, dps, nres.k, solved_ok
    )
    kfs = kfs._replace(norm_k=norm_k, norm_valid=norm_valid)

    # ---- template decision, fully on device (needNewTemplate 355-404,
    # selectKeyframe 411-441, enoughNormals Surface.cc:62-67)
    n_new = exploration_count(
        kfs.xy[slot], kfs.kp_valid[slot], pid_row, c
    )
    sel = select_ref_keyframe(
        pid_row, points.ref_kf, points.valid, kfs.valid, slot
    )
    exploring = n_new > c.mapping.points_to_template
    kf_t = jnp.where(exploring, slot, sel).astype(jnp.int32)
    n_norm_t = jnp.sum(kfs.norm_valid[kf_t]).astype(jnp.int32)
    gate = (cp.n_pairs > 0) & (n_norm_t >= c.mapping.min_normals)
    carry = KFCarry(
        slot=slot, kf_t=kf_t, gate=gate, exploring=exploring, n_new=n_new,
        n_norm=n_norm_t, n_pairs=cp.n_pairs, obs_dropped=obs_dropped,
        pair_dropped=cp.n_pair_dropped, pt_dropped=cp.n_pt_dropped,
    )
    return kfs, points, carry


def _kf_step_b(
    kfs,
    points,
    tmpl: meshmod.Template,
    pose: jnp.ndarray,
    feats,
    carry: KFCarry,
    K: jnp.ndarray,
    dom: jnp.ndarray,
    bend_sfn: jnp.ndarray,
    kf_counter: jnp.ndarray,
    cfg: Config,
    split: bool = False,
):
    """Second half of the keyframe chain: SfN + Sim3 registration +
    re-template + re-anchor SfT + lifecycle culling.
    Returns (kfs, points, template, pose, diag, gauge); ``split`` selects
    the re-anchor formulation (see the comment in _apply)."""
    from defslam_tpu.tracking import tracker

    c = cfg
    kf_t = carry.kf_t

    def _retemplate(args):
        kfs, points = args
        retina_t = kfs.retina[kf_t]
        pose_t = kfs.pose[kf_t]
        pid_t = kfs.point_id[kf_t]
        # per-KF SfN domain: the depth spline lives on the reference KF's
        # keypoint bbox (full control-grid resolution on the feature
        # cloud); the extension prior + polish anchors + template grid
        # stay on the camera-wide `dom` the template must cover
        if c.mapping.per_kf_domain:
            dom_s = bbox_domain(
                retina_t, kfs.kp_valid[kf_t], dom,
                margin=c.mapping.kf_domain_margin,
            )
            bend_s = bspline.bending_matrix_dyn(
                dom_s, c.mapping.sfn_ctrl_u, c.mapping.sfn_ctrl_v
            )
        else:
            dom_s, bend_s = dom, bend_sfn
        res_sfn = integrate_surface(
            retina_t, kfs.norm_k[kf_t], kfs.norm_valid[kf_t],
            dom_s, bend_s, c, ext_dom=dom,
        )
        surf_xyz, map_xyz, mask, embedded = registration_pairs(
            res_sfn.xyz, pid_t, kfs.kp_xyz[kf_t], kfs.kp_xyz_valid[kf_t],
            kfs.norm_valid[kf_t], points.valid, points.facet, pose_t,
        )
        reg = register_surface(surf_xyz, map_xyz, mask, c)
        acc = res_sfn.ok & reg.accepted

        def _apply(args2):
            kfs, points = args2
            ctrl_p = polish_surface(
                res_sfn.ctrl, reg, retina_t, map_xyz, embedded, dom_s,
                bend_s, c, grid_dom=dom,
            )
            regen = regen_template(
                ctrl_p, reg, pose_t, retina_t, dom, c, spline_dom=dom_s
            )
            points2, pid_row_new = rebuild_points(
                points, regen, pose_t, K, pid_t, kfs.kp_valid[kf_t],
                kfs.desc[kf_t], kfs.angle[kf_t], kf_t, dom, c,
                kf_counter,
            )
            kfs2 = kfs._replace(
                point_id=kfs.point_id.at[kf_t].set(pid_row_new),
                surf_ctrl=kfs.surf_ctrl.at[kf_t].set(ctrl_p),
                surf_valid=kfs.surf_valid.at[kf_t].set(True),
                surf_dom=kfs.surf_dom.at[kf_t].set(dom_s),
            )
            tmpl2 = regen.template
            # re-anchor camera + new mesh against the KEYFRAME's features
            # with the temporal term off (DefTracking.cc:115-117:
            # DefPoseOptimization(..., RegTemp=0) after updateTemplate).
            # In the FUSED dispatch the keyframe IS the current frame: the
            # solve starts from `pose` and its result replaces the live
            # pose directly (bit-exact round-4 behavior — the fused stress
            # ATE is sensitive to even the float noise of composing
            # pose @ inv(pose) here).  In the SPLIT dispatch the system
            # has moved on a frame: the solve anchors on the KEYFRAME's
            # stored pose and the swap's gauge change is returned as a
            # right-multiplied delta M (pose_kf -> re-anchored pose) that
            # the host applies to the LIVE pose and motion model instead
            # of rewinding to the keyframe's viewpoint.
            pose_kf = kfs.pose[carry.slot] if split else pose
            m2 = tracker.match_points_to_frame(points2, pose_kf, K, feats, c)
            res2 = tracker.sft_track(
                points2, m2, feats, tmpl2, pose_kf, K, c, reg_temp=0.0
            )
            tmpl2 = tmpl2._replace(nodes=res2.nodes)
            points2 = tracker.reposition_points(points2, res2.nodes, c)
            gauge = se3.inverse(pose_kf) @ res2.T
            pose2 = pose @ gauge if split else res2.T
            return kfs2, points2, tmpl2, pose2, gauge

        kfs, points, tmpl2, pose2, gauge = jax.lax.cond(
            acc, _apply,
            lambda a: (a[0], a[1], tmpl, pose, jnp.eye(4)), (kfs, points)
        )
        reg_s = jnp.where(acc, reg.s, 1.0).astype(jnp.float32)
        return kfs, points, tmpl2, pose2, gauge, acc, reg_s

    def _skip(args):
        kfs, points = args
        return (kfs, points, tmpl, pose, jnp.eye(4), jnp.asarray(False),
                jnp.asarray(1.0, jnp.float32))

    kfs, points, tmpl_out, pose_out, gauge, accepted, reg_s = jax.lax.cond(
        carry.gate, _retemplate, _skip, (kfs, points)
    )

    # ---- MapPoint lifecycle culling (reachability + found-ratio rules)
    points, n_culled = cull_points(
        points, kfs.point_id, kfs.valid, kf_counter
    )
    diag = MappingDiag(
        slot=carry.slot, kf_t=kf_t, accepted=accepted,
        exploring=carry.exploring, n_pairs=carry.n_pairs, n_new=carry.n_new,
        n_norm=carry.n_norm, n_culled=n_culled,
        obs_dropped=carry.obs_dropped, pair_dropped=carry.pair_dropped,
        pt_dropped=carry.pt_dropped, reg_scale=reg_s,
    )
    return kfs, points, tmpl_out, pose_out, diag, gauge


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def keyframe_step(
    kfs,  # KeyframeStore (donated)
    points,  # PointStore (donated)
    tmpl: meshmod.Template,
    pose: jnp.ndarray,  # (4, 4) current frame pose (the new KF's pose)
    feats,  # Features of the keyframe frame
    kp_of_point: jnp.ndarray,  # (P,) frame match per point
    inlier: jnp.ndarray,  # (P,) SfT inlier gate
    K: jnp.ndarray,
    dom: jnp.ndarray,
    bend_warp: jnp.ndarray,
    bend_sfn: jnp.ndarray,
    tmpl_ref_kf: jnp.ndarray,  # () int32 — current template's source KF
    kf_counter: jnp.ndarray,  # () int32
    frame_id: jnp.ndarray,  # () int32
    cfg: Config,
):
    """The ENTIRE keyframe step as one device-resident computation with NO
    host readback: slot selection (redundancy-aware eviction), keyframe
    insertion, warps -> densify -> distinctive descriptors -> normals
    (covNorm-gated, warm-started) -> template decision -> SfN + Sim3 +
    re-template -> re-anchor SfT -> lifecycle culling.

    This is the reference's PARALLEL-mode semantics (System.cc:140-142:
    DefLocalMapping runs beside tracking) re-expressed for an accelerator:
    instead of a mapping thread, the whole step is dispatched asynchronously
    and the ONE decision scalar bundle (MappingDiag) is read back a frame
    later — the host never blocks on the mapping chain.  The round-2 design
    had two blocking syncs here (template decision + Sim3 accept).

    Control flow that the reference runs on the CPU (needNewTemplate,
    selectKeyframe, chi gates, DefLocalMapping.cc:138-234) is computed with
    jnp.where / lax.cond on device; the expensive re-template + re-anchor
    branch only executes when its gate passes (lax.cond executes a single
    branch).

    Returns (kfs, points, template, pose, diag).  The same computation is
    available as TWO dispatches (keyframe_step_a / keyframe_step_b) so the
    host can interleave a frame between the halves
    (tracking.split_keyframe_dispatch) — no single dispatch then exceeds
    ~half the chain's device time, which is what bounds keyframe-adjacent
    p95/p99 frame latency."""
    kfs, points, carry = _kf_step_a(
        kfs, points, pose, feats, kp_of_point, inlier, K, dom, bend_warp,
        tmpl_ref_kf, frame_id, cfg,
    )
    # the fused dispatch keeps the 5-tuple contract (gauge == the pose
    # replacement itself here: the keyframe IS the current frame)
    kfs, points, tmpl_out, pose_out, diag, _gauge = _kf_step_b(
        kfs, points, tmpl, pose, feats, carry, K, dom, bend_sfn,
        kf_counter, cfg,
    )
    return kfs, points, tmpl_out, pose_out, diag


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def keyframe_step_a(
    kfs, points, pose, feats, kp_of_point, inlier, K, dom, bend_warp,
    tmpl_ref_kf, frame_id, cfg: Config,
):
    """First half of the split keyframe chain (insert + warps + densify +
    normals + decision scalars); see keyframe_step."""
    return _kf_step_a(
        kfs, points, pose, feats, kp_of_point, inlier, K, dom, bend_warp,
        tmpl_ref_kf, frame_id, cfg,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def keyframe_step_b(
    kfs, points, tmpl, pose, feats, carry, K, dom, bend_sfn, kf_counter,
    cfg: Config,
):
    """Second half of the split keyframe chain (SfN + Sim3 + re-template +
    re-anchor + culling); see keyframe_step.  NO buffer donation: the
    pre-B stores double as the interleaved frame's rollback snapshot
    (system._dispatch_pending_kf_b)."""
    return _kf_step_b(
        kfs, points, tmpl, pose, feats, carry, K, dom, bend_sfn,
        kf_counter, cfg, split=True,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def regen_template(
    surf_ctrl: jnp.ndarray,  # (nu, nv) SfN control depths
    reg: registration.RegistrationResult,
    kf_pose: jnp.ndarray,  # (4, 4) world->camera of the reference KF
    retina: jnp.ndarray,  # (K, 2) ref-KF keypoints (retina)
    dom: jnp.ndarray,
    cfg: Config,
    spline_dom: jnp.ndarray | None = None,
) -> TemplateRegen:
    """Reference updateTemplate (DefLocalMapping.cc:138-153 + 3.4):
    sample the registered surface on the node grid, build the Laplacian
    template in world frame, and embed the keyframe's keypoints.

    spline_dom: the SfN spline's own domain (defaults to ``dom``); the
    template node grid and the keypoint embedding always use the
    camera-wide ``dom``."""
    sdom = dom if spline_dom is None else spline_dom
    topo = meshmod.grid_topology(cfg.mesh.nodes_u, cfg.mesh.nodes_v)
    T_cw = se3.inverse(kf_pose)

    def surf_xyz_fn(u, v):
        d = bspline.evaluate(surf_ctrl, u, v, sdom)
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
