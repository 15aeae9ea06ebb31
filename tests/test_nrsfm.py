"""Synthetic isometric-NRSfM pipeline tests.

A rigid motion is an isometry, so viewing the *same* curved surface from two
cameras gives an exactly isometric image pair: the warp-differential normal
constraints (eqs 13/14) must recover the analytic surface normals, and
shape-from-normals must re-integrate them to the true depth (up to scale).
"""

import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.geometry import se3
from defslam_tpu.mapping import normals as nrm
from defslam_tpu.mapping import registration, sfn, warp
from defslam_tpu.ops import bspline

NU, NV = 13, 15


def _surface_pair(motion, n_pts=500, amp=0.15, seed=0):
    """Curved surface z = 1 + amp*sin(2x)*cos(y) seen from I and from
    `motion` (4x4).  Returns retina matches + analytic (k1,k2) in view 1."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.35, 0.35, n_pts)
    y = rng.uniform(-0.25, 0.25, n_pts)
    z = 1.0 + amp * np.sin(2 * x) * np.cos(y)
    P1 = jnp.asarray(np.stack([x, y, z], 1), jnp.float32)
    P2 = se3.transform(motion, P1)
    uv1 = P1[:, :2] / P1[:, 2:3]
    uv2 = P2[:, :2] / P2[:, 2:3]
    # analytic normal of z - 1 - amp sin(2x)cos(y): (-h_x, -h_y, 1)
    hx = 2 * amp * np.cos(2 * x) * np.cos(y)
    hy = -amp * np.sin(2 * x) * np.sin(y)
    N = np.stack([-hx, -hy, np.ones_like(hx)], 1)
    eta = np.stack([np.asarray(uv1[:, 0]), np.asarray(uv1[:, 1]), np.ones(n_pts)], 1)
    k_true = N[:, :2] / np.sum(N * eta, axis=1, keepdims=True)
    return uv1, uv2, P1, jnp.asarray(k_true, jnp.float32)


def _fit_warp(uv1, uv2, dom, refine=True):
    B = bspline.bending_matrix(dom, NU, NV)
    w = jnp.ones(uv1.shape[0])
    ctrl = warp.fit_initial(uv1, uv2, w, dom, NU, NV, B, 1e-5)
    if refine:
        ctrl = warp.refine(ctrl, uv1, uv2, w, dom, 0.05, 500.0, 500.0, 3)
    return ctrl


def _dom(uv, margin=0.15):
    lo = np.asarray(uv).min(0)
    hi = np.asarray(uv).max(0)
    d = hi - lo
    return jnp.asarray(
        [lo[0] - margin * d[0], hi[0] + margin * d[0],
         lo[1] - margin * d[1], hi[1] + margin * d[1]],
        jnp.float32,
    )


def test_warp_fit_accuracy():
    motion = se3.se3_exp(jnp.asarray([0.05, -0.03, 0.08, 0.06, -0.04, 0.02]))
    uv1, uv2, _, _ = _surface_pair(motion)
    dom = _dom(uv1)
    ctrl = _fit_warp(uv1, uv2, dom)
    dp = warp.diff_props(
        ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
    )
    err_px = np.linalg.norm(np.asarray(dp.warped - uv2), axis=1) * 500.0
    assert np.median(err_px) < 0.5, f"median warp error {np.median(err_px):.3f}px"
    assert float(dp.mask.mean()) > 0.95


def test_homography_projectivity_residual_zero():
    # the projectivity (Schwarzian-equivalent) residual must vanish for a
    # homography warp and fire for a non-projective warp
    dom = jnp.asarray([-0.5, 0.5, -0.4, 0.4], jnp.float32)
    gu = np.linspace(-0.5, 0.5, 60)
    gv = np.linspace(-0.4, 0.4, 50)
    U, V = np.meshgrid(gu, gv, indexing="ij")
    u, v = U.ravel(), V.ravel()
    H = np.array([[1.02, 0.03, 0.01], [-0.02, 0.98, 0.02], [0.05, -0.04, 1.0]])
    den = H[2, 0] * u + H[2, 1] * v + H[2, 2]
    uv1 = jnp.asarray(np.stack([u, v], 1), jnp.float32)
    uv2_h = jnp.asarray(
        np.stack(
            [(H[0, 0] * u + H[0, 1] * v + H[0, 2]) / den,
             (H[1, 0] * u + H[1, 1] * v + H[1, 2]) / den], 1),
        jnp.float32,
    )
    uv2_n = jnp.asarray(
        np.stack([u + 0.15 * u * u + 0.1 * v * v, v + 0.12 * u * v], 1),
        jnp.float32,
    )
    B = bspline.bending_matrix(dom, NU, NV)
    ones = jnp.ones(len(u))
    ctrl_h = warp.fit_initial(uv1, uv2_h, ones, dom, NU, NV, B, 1e-7)
    ctrl_n = warp.fit_initial(uv1, uv2_n, ones, dom, NU, NV, B, 1e-7)
    qu, qv = warp._coloc_grid(dom, NU, NV)
    inner = (np.abs(np.asarray(qu)) < 0.35) & (np.abs(np.asarray(qv)) < 0.28)
    r_h = np.asarray(warp.projectivity_residuals(ctrl_h, qu, qv, dom)).reshape(len(qu), -1)
    r_n = np.asarray(warp.projectivity_residuals(ctrl_n, qu, qv, dom)).reshape(len(qu), -1)
    assert np.abs(r_h[inner]).mean() < 0.01 * np.abs(r_n[inner]).mean()


def _stack_pair_obs(dps):
    obs = [nrm.pair_obs(dp) for dp in dps]
    return nrm.PairObs(*[jnp.stack(x, axis=1) for x in zip(*obs)])


def test_metric_residual_zero_at_truth():
    # with *analytic* warp derivatives the pullback identity is exact for a
    # plane (transfer is exact for planes): residual at k_true ~ 0
    motion = se3.se3_exp(jnp.asarray([0.03, 0.01, -0.06, 0.04, 0.06, 0.01]))
    uv1, uv2, _, k_true = _surface_pair(motion, amp=0.0, n_pts=50)
    dom = _dom(uv1)
    ctrl = _fit_warp(uv1, uv2, dom)
    dp = warp.diff_props(
        ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
    )
    r = nrm.metric_residuals(k_true, nrm.pair_obs(dp))
    assert float(jnp.abs(r).mean()) < 5e-3


def test_normals_plane():
    motion = se3.se3_exp(jnp.asarray([0.03, 0.01, -0.06, 0.04, 0.06, 0.01]))
    uv1, uv2, _, k_true = _surface_pair(motion, amp=0.0, n_pts=300)
    dom = _dom(uv1)
    ctrl = _fit_warp(uv1, uv2, dom)
    dp = warp.diff_props(
        ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
    )
    res = nrm.solve_k1k2(
        _stack_pair_obs([dp]), jnp.zeros((len(uv1), 2))
    )
    # plane: k1 = k2 = 0
    k = np.asarray(res.k)
    assert np.median(np.abs(k)) < 0.05, f"plane k medians {np.median(np.abs(k), 0)}"


def test_normals_curved_surface_two_views():
    m1 = se3.se3_exp(jnp.asarray([0.06, -0.02, 0.05, 0.08, -0.05, 0.02]))
    m2 = se3.se3_exp(jnp.asarray([-0.04, 0.05, 0.09, -0.06, 0.07, -0.04]))
    uv1, uv2a, P1, k_true = _surface_pair(m1, n_pts=400)
    _, uv2b, _, _ = _surface_pair(m2, n_pts=400)
    dom = _dom(uv1)
    dps = []
    for uv2 in (uv2a, uv2b):
        ctrl = _fit_warp(uv1, uv2, dom)
        dps.append(
            warp.diff_props(
                ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
            )
        )
    res = nrm.solve_k1k2(_stack_pair_obs(dps), jnp.zeros((len(uv1), 2)))

    n_est = np.asarray(nrm.normal_from_k(res.k, uv1))
    n_true = np.asarray(nrm.normal_from_k(k_true, uv1))
    cos = np.abs(
        np.sum(n_est * n_true, 1)
        / (np.linalg.norm(n_est, axis=1) * np.linalg.norm(n_true, axis=1))
    )
    ang = np.degrees(np.arccos(np.clip(cos, 0, 1)))
    # interior points (spline derivatives are accurate away from the rim)
    inner = (
        (np.abs(np.asarray(uv1[:, 0])) < 0.25) & (np.abs(np.asarray(uv1[:, 1])) < 0.18)
    )
    assert np.median(ang[inner]) < 6.0, f"median normal error {np.median(ang[inner]):.2f} deg"


def test_cov_gate_scale_separates_populations():
    """Pin COV_GATE_SCALE (mapper.py): the covNorm reliability gate must
    pass well-conditioned normals (diverse-baseline observations) and
    reject degenerate ones (near-identity warps constrain (k1,k2) only
    through float noise).  The two-populations claim — conditioned cov
    diag O(1), degenerate >> gate — was previously a docstring assertion;
    this test constructs both and checks the default gate (reliability
    0.7 -> 70) lands between them."""
    from defslam_tpu.mapping import mapper

    # population A: two genuinely different viewpoints
    m1 = se3.se3_exp(jnp.asarray([0.06, -0.02, 0.05, 0.08, -0.05, 0.02]))
    m2 = se3.se3_exp(jnp.asarray([-0.04, 0.05, 0.09, -0.06, 0.07, -0.04]))
    uv1, uv2a, _, _ = _surface_pair(m1, n_pts=200)
    _, uv2b, _, _ = _surface_pair(m2, n_pts=200)
    dom = _dom(uv1)
    dps = []
    for uv2 in (uv2a, uv2b):
        ctrl = _fit_warp(uv1, uv2, dom)
        dps.append(
            warp.diff_props(
                ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
            )
        )
    res_good = nrm.solve_k1k2(_stack_pair_obs(dps), jnp.zeros((len(uv1), 2)))

    # population B: two nearly-identical viewpoints (short baseline)
    eps1 = se3.se3_exp(jnp.asarray([1e-4, -5e-5, 8e-5, 1e-4, -8e-5, 5e-5]))
    eps2 = se3.se3_exp(jnp.asarray([-8e-5, 9e-5, 5e-5, -6e-5, 1e-4, -9e-5]))
    _, uv2c, _, _ = _surface_pair(eps1, n_pts=200)
    _, uv2d, _, _ = _surface_pair(eps2, n_pts=200)
    dps_bad = []
    for uv2 in (uv2c, uv2d):
        ctrl = _fit_warp(uv1, uv2, dom)
        dps_bad.append(
            warp.diff_props(
                ctrl, uv1, uv2, jnp.ones(len(uv1), bool), dom, 500.0, 500.0, 10.0
            )
        )
    res_bad = nrm.solve_k1k2(_stack_pair_obs(dps_bad), jnp.zeros((len(uv1), 2)))

    reliability = 0.7  # the shipped YAML value (Regularizer.Reliability)
    # NOTE: this test CALIBRATES mapper.COV_GATE_SCALE — if the normal
    # solver's residual scaling changes, re-derive the constant from the
    # printed populations instead of loosening the margins.
    pass_good = np.asarray(mapper.normal_reliability_gate(res_good, reliability))
    pass_bad = np.asarray(mapper.normal_reliability_gate(res_bad, reliability))
    # interior points (spline derivatives degrade at the rim)
    inner = (
        (np.abs(np.asarray(uv1[:, 0])) < 0.25)
        & (np.abs(np.asarray(uv1[:, 1])) < 0.18)
    )
    assert pass_good[inner].mean() > 0.9, (
        f"gate rejects conditioned normals: {pass_good[inner].mean():.2f}"
    )
    assert pass_bad[inner].mean() < 0.1, (
        f"gate passes degenerate normals: {pass_bad[inner].mean():.2f}"
    )
    # the populations must be separated by ORDERS of magnitude, not sit
    # near the gate: median conditioned cov << gate << median degenerate
    cd_good = np.median(np.asarray(res_good.cov)[inner, 0, 0])
    cd_bad = np.median(np.asarray(res_bad.cov)[inner, 0, 0])
    gate = reliability * mapper.COV_GATE_SCALE
    assert cd_good < gate / 10, f"conditioned cov {cd_good:.2f} too close to gate {gate}"
    assert cd_bad > gate * 10, f"degenerate cov {cd_bad:.2f} too close to gate {gate}"


def test_sfn_recovers_depth():
    # exact normals of the analytic surface -> depth up to scale
    rng = np.random.default_rng(2)
    n_pts = 400
    x = rng.uniform(-0.35, 0.35, n_pts)
    y = rng.uniform(-0.25, 0.25, n_pts)
    amp = 0.15
    z = 1.0 + amp * np.sin(2 * x) * np.cos(y)
    uv = jnp.asarray(np.stack([x / z, y / z], 1), jnp.float32)
    hx = 2 * amp * np.cos(2 * x) * np.cos(y)
    hy = -amp * np.sin(2 * x) * np.sin(y)
    N = jnp.asarray(np.stack([-hx, -hy, np.ones_like(hx)], 1), jnp.float32)
    dom = _dom(uv)
    B = bspline.bending_matrix(dom, NU, NV)
    res = sfn.solve(
        uv, N, jnp.ones(n_pts, bool), dom, NU, NV, B, bending_weight=0.1,
        mean_depth=1.0,
    )
    assert bool(res.ok)
    depth_true = z  # gamma = z since point = gamma*[u,v,1], z-comp = gamma
    ratio = np.asarray(res.depth) / depth_true
    # up-to-scale: relative spread of the ratio is the real error measure
    rel = np.std(ratio) / np.mean(ratio)
    assert rel < 0.03, f"depth shape error {rel:.4f}"


def test_registration_recovers_sim3():
    rng = np.random.default_rng(3)
    surf = jnp.asarray(rng.normal(0, 0.3, (200, 3)) + [0, 0, 1.0], jnp.float32)
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_rotvec([0.1, -0.05, 0.08]).as_matrix().astype(np.float32)
    s_true = 2.2
    t_true = np.array([0.1, -0.2, 0.35], np.float32)
    mapped = s_true * np.asarray(surf) @ R_true.T + t_true
    mask = np.ones(200, bool)
    mapped[180:] += rng.normal(0, 1.0, (20, 3))  # 10% outliers
    res = registration.register(
        surf, jnp.asarray(mapped), jnp.asarray(mask), chi_limit=0.07
    )
    assert bool(res.accepted)
    np.testing.assert_allclose(float(res.s), s_true, rtol=0.05)
    np.testing.assert_allclose(np.asarray(res.R), R_true, atol=0.03)


def test_registration_rejects_garbage():
    rng = np.random.default_rng(4)
    surf = jnp.asarray(rng.normal(0, 0.3, (100, 3)) + [0, 0, 1.0], jnp.float32)
    garbage = jnp.asarray(rng.normal(0, 1.0, (100, 3)) + [0, 0, 2.0], jnp.float32)
    res = registration.register(
        surf, garbage, jnp.ones(100, bool), chi_limit=0.07
    )
    assert not bool(res.accepted)
    # and with too few pairs
    res2 = registration.register(
        surf, surf, jnp.asarray(np.arange(100) < 5), chi_limit=0.07
    )
    assert not bool(res2.accepted)


def test_obs_cap_8_adequate_vs_32():
    """OBS_CAP sensitivity (round-3 VERDICT weak #9): on a 10-warp
    covisibility neighborhood (the reference's lifelong SchwarpDatabase
    accumulates every pair, SchwarpDatabase.cc:83-118; we cap per-step
    observation tables), normals solved with the shipped cap of 8 must
    match normals solved with cap 32 within a fraction of a degree."""
    from defslam_tpu.mapping import mapper

    rng = np.random.default_rng(11)
    n_pts = 200
    uv1 = uv2s = None
    dps = []
    for i in range(10):
        xi = rng.normal(0, 0.05, 6)
        motion = se3.se3_exp(jnp.asarray(xi, jnp.float32))
        uv1_i, uv2, _, k_true = _surface_pair(motion, n_pts=n_pts, seed=11)
        uv1 = uv1_i
        dom = _dom(uv1)
        ctrl = _fit_warp(uv1, uv2, dom)
        dps.append(
            warp.diff_props(
                ctrl, uv1, uv2, jnp.ones(n_pts, bool), dom, 500.0, 500.0, 10.0
            )
        )

    # pair-major observation tables (10 pairs x n_pts observations each)
    pid = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32)[None], (10, 1))
    mask = jnp.stack([dp.mask for dp in dps])
    uv1_t = jnp.stack([dp.uv1 for dp in dps])
    warped = jnp.stack([dp.warped for dp in dps])
    J12 = jnp.stack([dp.J12 for dp in dps])
    Huu = jnp.stack([dp.Huu for dp in dps])
    Hvv = jnp.stack([dp.Hvv for dp in dps])

    def solve_at_cap(cap):
        obs, dropped = mapper.accumulate_obs_device(
            pid, mask, uv1_t, warped, J12, Huu, Hvv, n_pts, obs_cap=cap
        )
        res = nrm.solve_k1k2(obs, jnp.zeros((n_pts, 2)))
        n_est = np.asarray(nrm.normal_from_k(res.k, uv1))
        n_true = np.asarray(nrm.normal_from_k(k_true, uv1))
        cos = np.abs(
            np.sum(n_est * n_true, 1)
            / (np.linalg.norm(n_est, axis=1) * np.linalg.norm(n_true, axis=1)
               + 1e-12)
        )
        return np.degrees(np.arccos(np.clip(cos, 0, 1))), int(dropped)

    inner = (
        (np.abs(np.asarray(uv1[:, 0])) < 0.25)
        & (np.abs(np.asarray(uv1[:, 1])) < 0.18)
    )
    ang8, dropped8 = solve_at_cap(8)
    ang32, dropped32 = solve_at_cap(32)
    assert dropped8 > 0  # the cap actually binds in this construction
    assert dropped32 == 0
    m8, m32 = np.median(ang8[inner]), np.median(ang32[inner])
    assert m32 < 8.0, f"cap-32 normals bad ({m32:.2f} deg): test construction broken"
    assert m8 - m32 < 1.0, (
        f"OBS_CAP=8 costs {m8 - m32:.2f} deg over cap 32 ({m8:.2f} vs {m32:.2f})"
    )


def test_shared_vs_bbox_retina_domain_offcenter():
    """Retina-domain sensitivity (round-3 VERDICT missing #3): the
    reference derives each keyframe's warp domain from its keypoint
    bounding box + 0.10 margin (DefKeyFrame::NormaliseKeypoints,
    DefKeyFrame.cc:94-133); we use one shared camera-wide domain
    (mapper.py docstring).  On an endoscopy-like OFF-CENTER cloud filling
    ~1/8 of the field of view, quantify the cost: warp prediction error
    and normal accuracy under both domains."""
    rng = np.random.default_rng(7)
    n_pts = 300
    # off-center cloud: u in [0.05, 0.33], v in [-0.28, -0.08] of a camera
    # whose full retina spans roughly [-0.4, 0.4] x [-0.3, 0.3]
    x = rng.uniform(0.05, 0.33, n_pts)
    y = rng.uniform(-0.28, -0.08, n_pts)
    amp = 0.15
    z = 1.0 + amp * np.sin(2 * x) * np.cos(y)
    P1 = jnp.asarray(np.stack([x, y, z], 1), jnp.float32)
    motion = se3.se3_exp(jnp.asarray([0.06, -0.02, 0.05, 0.08, -0.05, 0.02]))
    P2 = se3.transform(motion, P1)
    uv1 = P1[:, :2] / P1[:, 2:3]
    uv2 = P2[:, :2] / P2[:, 2:3]
    hx = 2 * amp * np.cos(2 * x) * np.cos(y)
    hy = -amp * np.sin(2 * x) * np.sin(y)
    N = np.stack([-hx, -hy, np.ones_like(hx)], 1)
    eta = np.stack(
        [np.asarray(uv1[:, 0]), np.asarray(uv1[:, 1]), np.ones(n_pts)], 1
    )
    k_true = jnp.asarray(
        N[:, :2] / np.sum(N * eta, axis=1, keepdims=True), jnp.float32
    )

    dom_camera = jnp.asarray([-0.4, 0.4, -0.3, 0.3], jnp.float32)
    dom_bbox = _dom(uv1, margin=0.10)  # the reference's +0.10 margin

    def errors_for(dom):
        ctrl = _fit_warp(uv1, uv2, dom)
        dp = warp.diff_props(
            ctrl, uv1, uv2, jnp.ones(n_pts, bool), dom, 500.0, 500.0, 10.0
        )
        warp_px = float(np.median(
            np.linalg.norm(np.asarray(dp.warped - uv2), axis=1) * 500.0
        ))
        res = nrm.solve_k1k2(
            nrm.PairObs(*[a[:, None] if a.ndim == 1 else a[:, None, ...]
                          for a in nrm.pair_obs(dp)]),
            jnp.zeros((n_pts, 2)),
        )
        n_est = np.asarray(nrm.normal_from_k(res.k, uv1))
        n_true = np.asarray(nrm.normal_from_k(k_true, uv1))
        cos = np.abs(
            np.sum(n_est * n_true, 1)
            / (np.linalg.norm(n_est, axis=1)
               * np.linalg.norm(n_true, axis=1) + 1e-12)
        )
        ang = np.degrees(np.arccos(np.clip(cos, 0, 1)))
        return warp_px, float(np.median(ang))

    warp_cam, ang_cam = errors_for(dom_camera)
    warp_bb, ang_bb = errors_for(dom_bbox)
    # the bbox domain concentrates the full 13x15 control grid on the
    # cloud; the shared domain gives it ~a quarter of the control points.
    # Bound the cost: shared-domain warp error within 1 px and normals
    # within 3 deg of the bbox domain (if this fails, per-KF domains must
    # be implemented, not documented)
    assert warp_bb < 1.0, f"bbox-domain warp fit broken ({warp_bb:.2f} px)"
    assert warp_cam - warp_bb < 1.0, (
        f"shared domain costs {warp_cam - warp_bb:.2f} px warp error "
        f"({warp_cam:.2f} vs {warp_bb:.2f})"
    )
    assert ang_cam - ang_bb < 3.0, (
        f"shared domain costs {ang_cam - ang_bb:.2f} deg normal error "
        f"({ang_cam:.2f} vs {ang_bb:.2f})"
    )


def test_polish_surface_pulls_depths_to_map():
    """mapping.consistency_polish: with a positive weight the polished
    surface passes (closer) through the map targets at pair locations while
    grid anchors keep the original shape elsewhere; weight 0 is identity."""
    import dataclasses

    from defslam_tpu.config import Config, MappingConfig
    from defslam_tpu.mapping import mapper, registration as regmod

    nu, nv = 13, 15
    dom = jnp.asarray([-0.4, 0.4, -0.3, 0.3], jnp.float32)
    ctrl = jnp.ones((nu, nv), jnp.float32)  # flat surface at depth 1
    rng = np.random.default_rng(2)
    n = 120
    u = jnp.asarray(rng.uniform(-0.1, 0.35, n), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.25, 0.0, n), jnp.float32)
    retina = jnp.stack([u, v], axis=1)
    # identity Sim3; targets 5% deeper than the surface in the pair region
    reg = regmod.RegistrationResult(
        s=jnp.asarray(1.0), R=jnp.eye(3), t=jnp.zeros(3),
        residual=jnp.asarray(0.0), accepted=jnp.asarray(True),
        n_pairs=jnp.asarray(n),
    )
    d_tgt = 1.05
    map_cam = jnp.stack([u * d_tgt, v * d_tgt, jnp.full(n, d_tgt)], axis=1)
    mask = jnp.ones(n, bool)
    bend = mapper.bending_for(np.asarray(dom), nu, nv)

    cfg0 = Config(mapping=MappingConfig(consistency_polish=0.0))
    assert mapper.polish_surface(
        ctrl, reg, retina, map_cam, mask, dom, bend, cfg0
    ) is ctrl  # weight 0: untouched (reference behavior)

    cfg4 = Config(mapping=MappingConfig(consistency_polish=4.0))
    ctrl_p = mapper.polish_surface(
        ctrl, reg, retina, map_cam, mask, dom, bend, cfg4
    )
    from defslam_tpu.ops import bspline as bsp

    d_in = np.asarray(bsp.evaluate(ctrl_p, u, v, dom))
    # inside the pair region: pulled most of the way to 1.05
    assert np.median(np.abs(d_in - d_tgt)) < 0.02
    # far corner (no pairs): anchored near the original depth 1.0
    fu = jnp.asarray([-0.35], jnp.float32)
    fv = jnp.asarray([0.25], jnp.float32)
    d_far = float(bsp.evaluate(ctrl_p, fu, fv, dom)[0])
    assert abs(d_far - 1.0) < 0.02


def test_per_kf_bbox_domain_machinery():
    """Round-4 VERDICT #7: per-keyframe bbox retina domains
    (mapping.per_kf_domain).  (a) EQUIVALENCE at camera-wide coverage:
    when keypoints span the full view, mapper.bbox_domain ~ camera domain
    and the warp fit over it matches the shared-domain fit.  (b)
    IMPROVEMENT on the off-center fixture: the implemented machinery
    (bbox_domain + bending_matrix_dyn) reaches the bbox-domain warp
    accuracy the sensitivity test measures (off-center warp error parity
    with the hand-built bbox domain)."""
    from defslam_tpu.mapping import mapper

    rng = np.random.default_rng(7)
    n_pts = 300

    def warp_err(uv1, uv2, dom, bend=None):
        B = bend if bend is not None else bspline.bending_matrix(dom, NU, NV)
        w = jnp.ones(uv1.shape[0])
        ctrl = warp.fit_initial(uv1, uv2, w, dom, NU, NV, B, 1e-5)
        ctrl = warp.refine(ctrl, uv1, uv2, w, dom, 0.05, 500.0, 500.0, 3)
        dp = warp.diff_props(
            ctrl, uv1, uv2, jnp.ones(n_pts, bool), dom, 500.0, 500.0, 10.0
        )
        return float(np.median(
            np.linalg.norm(np.asarray(dp.warped - uv2), axis=1) * 500.0
        ))

    dom_camera = jnp.asarray([-0.4, 0.4, -0.3, 0.3], jnp.float32)

    # (a) camera-wide cloud: bbox domain ~ camera domain, results match
    x = rng.uniform(-0.38, 0.38, n_pts)
    y = rng.uniform(-0.28, 0.28, n_pts)
    z = 1.0 + 0.15 * np.sin(2 * x) * np.cos(y)
    P1 = jnp.asarray(np.stack([x, y, z], 1), jnp.float32)
    motion = se3.se3_exp(jnp.asarray([0.06, -0.02, 0.05, 0.08, -0.05, 0.02]))
    P2 = se3.transform(motion, P1)
    uv1, uv2 = P1[:, :2] / P1[:, 2:3], P2[:, :2] / P2[:, 2:3]
    dom_bb = mapper.bbox_domain(
        uv1, jnp.ones(n_pts, bool), dom_camera, margin=0.10
    )
    bend_bb = bspline.bending_matrix_dyn(dom_bb, NU, NV)
    e_cam = warp_err(uv1, uv2, dom_camera)
    e_bb = warp_err(uv1, uv2, dom_bb, bend_bb)
    assert abs(e_cam - e_bb) < 0.3, (
        f"camera-wide equivalence broken: {e_cam:.3f} vs {e_bb:.3f} px"
    )

    # (b) off-center cloud (the sensitivity fixture): machinery parity
    # with the hand-built bbox domain of the sensitivity test
    x = rng.uniform(0.05, 0.33, n_pts)
    y = rng.uniform(-0.28, -0.08, n_pts)
    z = 1.0 + 0.15 * np.sin(2 * x) * np.cos(y)
    P1 = jnp.asarray(np.stack([x, y, z], 1), jnp.float32)
    P2 = se3.transform(motion, P1)
    uv1, uv2 = P1[:, :2] / P1[:, 2:3], P2[:, :2] / P2[:, 2:3]
    dom_hand = _dom(uv1, margin=0.10)
    dom_mach = mapper.bbox_domain(
        uv1, jnp.ones(n_pts, bool), dom_camera, margin=0.10
    )
    np.testing.assert_allclose(
        np.asarray(dom_mach), np.asarray(dom_hand), atol=1e-5
    )
    e_hand = warp_err(uv1, uv2, dom_hand)
    e_mach = warp_err(
        uv1, uv2, dom_mach, bspline.bending_matrix_dyn(dom_mach, NU, NV)
    )
    assert e_mach < e_hand + 0.1, (e_mach, e_hand)
    # fallback: degenerate/empty clouds return the camera domain
    deg = mapper.bbox_domain(
        uv1, jnp.zeros(n_pts, bool), dom_camera, margin=0.10
    )
    np.testing.assert_allclose(np.asarray(deg), np.asarray(dom_camera))


def test_sfn_tilt_extension_continues_slope():
    """Round-5 tilt-regularized extension (mapping.sfn_tilt_extension): on
    a TILTED plane observed only in half the domain, the flat extension
    (tilt 0) forces constant depth into the unsupported half (the round-4
    stress-run bias), while the tilt continuation extends the supported
    slope — reconstructing the unsupported region's true depth much
    better.  The reference's free extrapolation has no defined behavior
    there at all (ShapeFromNormals.cc:81-171)."""
    from defslam_tpu.mapping import sfn

    rng = np.random.default_rng(3)
    n = 250
    dom = jnp.asarray([-0.4, 0.4, -0.3, 0.3], jnp.float32)
    # keypoints only in the LEFT half (u < 0); plane z = 1 + 0.5 x - 0.2 y
    u = rng.uniform(-0.38, -0.02, n).astype(np.float32)
    v = rng.uniform(-0.28, 0.28, n).astype(np.float32)
    a_x, a_y = 0.5, -0.2
    # surface z(x, y) = 1 + a_x x + a_y y; along ray [u,v,1]:
    # gamma (1 - a_x u - a_y v) = 1
    gamma = 1.0 / (1.0 - a_x * u - a_y * v)
    normals = jnp.asarray(
        np.stack([-a_x * np.ones(n), -a_y * np.ones(n), np.ones(n)], 1),
        jnp.float32,
    )
    uv = jnp.asarray(np.stack([u, v], 1))
    B = bspline.bending_matrix(dom, 13, 15)

    def recon_err(tilt):
        res = sfn.solve(
            uv, normals, jnp.ones(n, bool), dom, 13, 15, B,
            bending_weight=0.3, flat_extension=0.3, tilt_extension=tilt,
        )
        # evaluate in the UNSUPPORTED right half; compare shape up to the
        # solver's global scale (median-normalized): fit one scale
        uq = np.linspace(0.05, 0.38, 24, dtype=np.float32)
        vq = np.linspace(-0.25, 0.25, 12, dtype=np.float32)
        UQ, VQ = np.meshgrid(uq, vq, indexing="ij")
        uqf, vqf = jnp.asarray(UQ.reshape(-1)), jnp.asarray(VQ.reshape(-1))
        d_est = np.asarray(bspline.evaluate(res.ctrl, uqf, vqf, dom))
        d_true = 1.0 / (1.0 - a_x * UQ.reshape(-1) - a_y * VQ.reshape(-1))
        s = np.median(d_true / np.maximum(d_est, 1e-9))
        return float(np.median(np.abs(s * d_est - d_true) / d_true))

    e_flat = recon_err(0.0)
    e_tilt = recon_err(1.0)
    assert e_tilt < 0.5 * e_flat, (
        f"tilt continuation should at least halve the unsupported-region "
        f"depth error vs flat: flat {e_flat:.4f}, tilt {e_tilt:.4f}"
    )
    assert e_tilt < 0.05, f"tilt-extended depth err {e_tilt:.4f}"
