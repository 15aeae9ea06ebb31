"""SfT solver tests on synthetic deformations — the reference's own notion of
a testable seam: inject known correspondences, check the recovered mesh+pose
(DefOptimizer.h:55-61 'for testing shape-from-template ... by giving it the
matches')."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from defslam_tpu.config import Config, SfTConfig
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.template import mesh as meshmod
from defslam_tpu.tracking import sft

K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
DOM = jnp.asarray([-0.4, 0.4, -0.3, 0.3])


def _setup(n_pts=200, deform=0.08, seed=0, noise=0.3):
    topo = meshmod.grid_topology(10, 10)
    nodes_rest = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1), DOM, topo
    )
    tmpl = meshmod.make_template(nodes_rest, topo)

    rng = np.random.default_rng(seed)
    uv_param = np.stack(
        [rng.uniform(-0.38, 0.38, n_pts), rng.uniform(-0.28, 0.28, n_pts)], axis=1
    ).astype(np.float32)
    facet, bary, inside = meshmod.embed_uv(jnp.asarray(uv_param), DOM, topo)
    assert bool(jnp.all(inside))

    # smooth synthetic deformation of the node grid
    gu = np.linspace(-0.4, 0.4, 10)
    gv = np.linspace(-0.3, 0.3, 10)
    U, V = np.meshgrid(gu, gv, indexing="ij")
    dz = deform * np.sin(2 * np.pi * U / 0.8) * np.cos(np.pi * V / 0.6)
    nodes_true = nodes_rest + jnp.asarray(
        np.stack([np.zeros_like(dz), np.zeros_like(dz), dz], -1).reshape(-1, 3),
        jnp.float32,
    )
    T_true = se3.se3_exp(
        jnp.asarray([0.02, -0.01, 0.03, 0.01, -0.02, 0.005], jnp.float32)
    )
    pts_true = meshmod.facet_positions(nodes_true, topo, facet, bary)
    obs = cam.project(K, se3.transform(T_true, pts_true))
    obs = obs + jnp.asarray(rng.normal(0, noise, obs.shape), jnp.float32)

    data = sft.data_from_template(
        tmpl, K, jnp.eye(4),
        obs_uv=obs,
        obs_face=facet,
        obs_bary=bary,
        obs_invsigma2=jnp.ones(n_pts),
        obs_mask=jnp.ones(n_pts, bool),
        n_kp=float(n_pts),
    )
    return topo, data, T_true, nodes_true, pts_true, facet, bary


def _cfg(iters=40):
    return Config(sft=SfTConfig(lm_iterations=iters))


def test_sft_recovers_deformation():
    topo, data, T_true, nodes_true, pts_true, facet, bary = _setup()
    res = sft.solve(data, topo, _cfg())
    # reprojection residual at the solution (the reference-parity rest-shape
    # temporal anchor + mean-value curvature prior bias the px fit slightly
    # on large synthetic deformations; 3D accuracy is asserted below)
    assert float(jnp.sqrt(jnp.mean(res.chi2))) < 1.7
    assert int(res.inlier.sum()) > 180
    # 3D accuracy in the *camera* frame (the SE3 gauge lives between camera
    # and mesh; camera-frame structure is what is observable)
    pts_est = meshmod.facet_positions(res.nodes, topo, facet, bary)
    pc_est = se3.transform(res.T, pts_est)
    pc_true = se3.transform(T_true, pts_true)
    err = np.linalg.norm(np.asarray(pc_est - pc_true), axis=1)
    assert np.median(err) < 0.03, f"median 3D error {np.median(err):.4f}"


def test_sft_flags_outliers():
    topo, data, T_true, nodes_true, pts_true, facet, bary = _setup(seed=1)
    rng = np.random.default_rng(9)
    obs = np.array(data.obs_uv)
    bad = rng.choice(len(obs), 15, replace=False)
    obs[bad] += rng.uniform(25, 60, (15, 2)) * rng.choice([-1, 1], (15, 2))
    data = data._replace(obs_uv=jnp.asarray(obs))
    res = sft.solve(data, topo, _cfg())
    inl = np.asarray(res.inlier)
    assert inl[bad].sum() <= 2, "gross outliers not gated"
    good = np.setdiff1d(np.arange(len(obs)), bad)
    assert inl[good].mean() > 0.85
    # solution still accurate despite outliers
    pts_est = meshmod.facet_positions(res.nodes, topo, facet, bary)
    pc_est = se3.transform(res.T, pts_est)
    pc_true = se3.transform(T_true, pts_true)
    err = np.linalg.norm(np.asarray(pc_est - pc_true), axis=1)[good]
    assert np.median(err) < 0.03


def test_sft_respects_mask():
    topo, data, *_ = _setup(seed=2)
    # masking out half the observations must not use them
    mask = np.ones(200, bool)
    mask[100:] = False
    obs = np.array(data.obs_uv)
    obs[100:] = 1e5  # poison masked-out entries
    data = data._replace(obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask))
    res = sft.solve(data, topo, _cfg(iters=20))
    assert np.isfinite(float(res.cost))
    assert int(res.inlier[:100].sum()) > 70
    assert int(res.inlier[100:].sum()) == 0


def test_analytic_jacobian_matches_autodiff():
    """The dense analytic Jacobian (solver fast path) vs jacfwd of the
    residual vector — they must agree to float tolerance everywhere."""
    import jax

    topo, data, *_ = _setup(n_pts=60, seed=4)
    # knock out some observations so LocalZone/fixed-node masking is active
    mask = np.ones(60, bool)
    mask[40:] = False
    data = data._replace(obs_mask=jnp.asarray(mask))
    cfg = _cfg()
    rng = np.random.default_rng(7)
    # a perturbed linearization point (T, nodes)
    T = se3.se3_exp(jnp.asarray(rng.normal(0, 0.01, 6), jnp.float32))
    nodes = data.nodes0 + jnp.asarray(
        rng.normal(0, 0.005, (100, 3)), jnp.float32
    )
    rt = cfg.regularizer.temporal
    pre = sft._prepare(data, topo, cfg, rt)
    r, J = sft.assemble(T, nodes, data, topo, cfg, rt)

    def res_of_delta(delta):
        T_d = se3.se3_exp(delta[:6]) @ T
        nodes_d = nodes + delta[6:].reshape(100, 3)
        return sft.residuals(T_d, nodes_d, data, topo, cfg, rt)

    J_ad = jax.jacfwd(res_of_delta)(jnp.zeros(306, jnp.float32))
    # autodiff sees all coords; the analytic J zeroes fixed-node columns
    J_ad = J_ad * np.asarray(pre.col_free)[None, :]
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=2e-4)


def test_block_normal_equations_match_dense():
    """The production block assembly (obs/reg_normal_eq -> dense_system)
    must equal J^T W J / J^T W r of the dense-Jacobian test seam with the
    solver's IRLS Huber weights."""
    import jax

    topo, data, *_ = _setup(n_pts=80, seed=5)
    mask = np.ones(80, bool)
    mask[60:] = False  # exercise masked observations + LocalZone pinning
    data = data._replace(obs_mask=jnp.asarray(mask))
    cfg = _cfg()
    rt = cfg.regularizer.temporal
    rng = np.random.default_rng(11)
    T = se3.se3_exp(jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32))
    nodes = data.nodes0 + jnp.asarray(
        rng.normal(0, 0.01, (100, 3)), jnp.float32
    )

    H, g, cost = sft.normal_equations(T, nodes, data, topo, cfg, rt)

    pre = sft._prepare(data, topo, cfg, rt)
    r, J = sft.assemble(T, nodes, data, topo, cfg, rt)
    n_reproj = 2 * 80
    rb = r[:n_reproj].reshape(-1, 2)
    nrm = np.sqrt(np.sum(np.asarray(rb) ** 2, axis=-1) + 1e-12) * np.sqrt(
        float(data.n_kp)
    )
    hub = np.minimum(1.0, cfg.sft.huber_delta / nrm)
    W = np.concatenate([np.repeat(hub, 2), np.ones(r.shape[0] - n_reproj)])
    H_ref = np.einsum("ri,r,rj->ij", np.asarray(J), W, np.asarray(J))
    # block path pins fixed coordinates with a unit diagonal inside
    # dense_system; apply the same to the dense reference
    pin = 1.0 - np.asarray(pre.col_free)
    H_ref = H_ref + np.diag(pin)
    g_ref = np.einsum("ri,r->i", np.asarray(J), W * np.asarray(r))
    cost_ref = 0.5 * float(np.sum(W * np.asarray(r) ** 2))
    scale = max(1.0, np.abs(H_ref).max())
    np.testing.assert_allclose(np.asarray(H), H_ref, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(g), g_ref, atol=2e-3, rtol=2e-4)
    assert abs(float(cost) - cost_ref) < 1e-3 * max(1.0, cost_ref)


def test_localzone_masks_far_nodes():
    """Nodes outside viewed+local_zone rings must not move (setMeshNodes
    fixes all vertices, only OptLap is un-fixed, DefOptimizer.cc:388-406)."""
    topo, data, *_ = _setup(n_pts=30, seed=6)
    # observations only in one corner of the domain
    rng = np.random.default_rng(6)
    uv_corner = np.stack(
        [rng.uniform(-0.38, -0.2, 30), rng.uniform(-0.28, -0.15, 30)], 1
    ).astype(np.float32)
    facet, bary, inside = meshmod.embed_uv(jnp.asarray(uv_corner), DOM, topo)
    nodes_rest = data.nodes0
    pts = meshmod.facet_positions(nodes_rest, topo, facet, bary)
    obs = cam.project(K, pts) + 2.0  # constant offset forces a real solve
    data = data._replace(
        obs_uv=obs, obs_face=facet, obs_bary=bary,
        obs_invsigma2=jnp.ones(30), obs_mask=jnp.ones(30, bool),
        n_kp=jnp.asarray(30.0),
    )
    res = sft.solve(data, topo, _cfg(iters=15))
    pre = sft._prepare(data, topo, _cfg(), 0.05)
    moved = np.linalg.norm(
        np.asarray(res.nodes) - np.asarray(nodes_rest), axis=1
    )
    optlap = np.asarray(pre.optlap)
    assert moved[~optlap].max() < 1e-7, "fixed nodes moved"
    assert optlap.sum() < 100, "corner observations should not free all nodes"


def test_embed_uv_roundtrip():
    topo = meshmod.grid_topology(10, 10)
    nodes = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, 1.0 + 0.1 * u * v], axis=-1), DOM, topo
    )
    rng = np.random.default_rng(3)
    uv = jnp.asarray(
        np.stack([rng.uniform(-0.4, 0.4, 100), rng.uniform(-0.3, 0.3, 100)], 1),
        jnp.float32,
    )
    facet, bary, inside = meshmod.embed_uv(uv, DOM, topo)
    assert bool(jnp.all(inside))
    assert np.allclose(np.asarray(bary).sum(1), 1.0, atol=1e-5)
    assert (np.asarray(bary) >= -1e-5).all()
    # barycentric reconstruction of the (u, v) coordinates themselves
    uv_nodes = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.zeros_like(u)], axis=-1), DOM, topo
    )
    rec = meshmod.facet_positions(uv_nodes, topo, facet, bary)
    np.testing.assert_allclose(rec[:, :2], uv, atol=1e-5)


def test_embed_uv_outside_flag():
    topo = meshmod.grid_topology(10, 10)
    uv = jnp.asarray([[0.0, 0.0], [0.6, 0.0], [0.0, -0.5]], jnp.float32)
    _, _, inside = meshmod.embed_uv(uv, DOM, topo)
    assert bool(inside[0]) and not bool(inside[1]) and not bool(inside[2])
