"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from defslam_tpu.config import (CapacityConfig, Config, MappingConfig,
                                OrbConfig, ParallelConfig, SfTConfig,
                                TrackingConfig)
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.mapping import mapper
from defslam_tpu.mapping import normals as nrm
from defslam_tpu.ops import bspline
from defslam_tpu.parallel import sharded
from defslam_tpu.template import mesh as meshmod
from defslam_tpu.tracking import sft


def test_mesh_has_8_devices():
    mesh = sharded.make_mesh()
    assert mesh.devices.size == 8


def _toy_obs(p=64, o=2, seed=0):
    rng = np.random.default_rng(seed)
    return nrm.PairObs(
        uv1=jnp.asarray(rng.uniform(-0.2, 0.2, (p, o, 2)), jnp.float32),
        uv2=jnp.asarray(rng.uniform(-0.2, 0.2, (p, o, 2)), jnp.float32),
        J12=jnp.tile(jnp.eye(2), (p, o, 1, 1))
        + jnp.asarray(rng.normal(0, 0.05, (p, o, 2, 2)), jnp.float32),
        Huu=jnp.asarray(rng.normal(0, 0.1, (p, o, 2)), jnp.float32),
        Hvv=jnp.asarray(rng.normal(0, 0.1, (p, o, 2)), jnp.float32),
        mask=jnp.ones((p, o), bool),
    )


def test_sharded_normals_match_single_device():
    obs = _toy_obs()
    k0 = jnp.zeros((64, 2))
    ref = nrm.solve_k1k2(obs, k0)
    mesh = sharded.make_mesh()
    out = sharded.sharded_normal_solves(mesh, obs, k0)
    # the per-point LMs are independent (no collectives) but the sharded
    # compilation vectorizes/fuses differently; the accept/reject while-loop
    # amplifies those ulp-level differences for a few points, so the
    # tolerance is looser than exact-parity tests
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(ref.k), atol=3e-3)


def test_sharded_warp_fits_match_single_device():
    cfg = Config()
    dom = jnp.asarray([-0.5, 0.5, -0.4, 0.4], jnp.float32)
    B = bspline.bending_matrix(dom, cfg.mapping.warp_ctrl_u, cfg.mapping.warp_ctrl_v)
    rng = np.random.default_rng(1)
    n_pairs = 8
    uv1 = rng.uniform(-0.4, 0.4, (n_pairs, mapper.PAIR_CAP, 2)).astype(np.float32)
    uv2 = uv1 + 0.01 * rng.normal(size=uv1.shape).astype(np.float32)
    batch = mapper.WarpBatch(
        uv1=jnp.asarray(uv1), uv2=jnp.asarray(uv2),
        mask=jnp.ones((n_pairs, mapper.PAIR_CAP), bool),
        pair_valid=jnp.ones(n_pairs, bool),
    )
    ref, _ = mapper.fit_warps(batch, dom, B, cfg)
    mesh = sharded.make_mesh()
    out, _ = sharded.sharded_warp_fits(mesh, batch, dom, B, cfg)
    np.testing.assert_allclose(
        np.asarray(out.warped), np.asarray(ref.warped), atol=1e-4
    )


def test_sharded_sft_solves():
    # same synthetic setup as test_sft, solved on the 8-device mesh
    cfg = Config(sft=SfTConfig(lm_iterations=30))
    topo = meshmod.grid_topology(10, 10)
    DOM = jnp.asarray([-0.4, 0.4, -0.3, 0.3])
    K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    nodes_rest = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1), DOM, topo
    )
    tmpl = meshmod.make_template(nodes_rest, topo)
    rng = np.random.default_rng(0)
    n = 256  # divisible by 8
    uvp = np.stack(
        [rng.uniform(-0.38, 0.38, n), rng.uniform(-0.28, 0.28, n)], 1
    ).astype(np.float32)
    facet, bary, _ = meshmod.embed_uv(jnp.asarray(uvp), DOM, topo)
    gu = np.linspace(-0.4, 0.4, 10)
    gv = np.linspace(-0.3, 0.3, 10)
    U, V = np.meshgrid(gu, gv, indexing="ij")
    dz = 0.06 * np.sin(2 * np.pi * U / 0.8) * np.cos(np.pi * V / 0.6)
    nodes_true = nodes_rest + jnp.asarray(
        np.stack([0 * dz, 0 * dz, dz], -1).reshape(-1, 3), jnp.float32
    )
    T_true = se3.se3_exp(jnp.asarray([0.01, -0.01, 0.02, 0.008, -0.01, 0.004]))
    pts_true = meshmod.facet_positions(nodes_true, topo, facet, bary)
    obs = cam.project(K, se3.transform(T_true, pts_true))
    data = sft.data_from_template(
        tmpl, K, jnp.eye(4), obs_uv=obs, obs_face=facet, obs_bary=bary,
        obs_invsigma2=jnp.ones(n), obs_mask=jnp.ones(n, bool), n_kp=float(n),
    )
    mesh = sharded.make_mesh()
    res = sharded.sft_solve_sharded(mesh, data, cfg)
    T, nodes = res.T, res.nodes
    pts_est = meshmod.facet_positions(nodes, topo, facet, bary)
    pc_est = np.asarray(se3.transform(T, pts_est))
    pc_true = np.asarray(se3.transform(T_true, pts_true))
    err = np.linalg.norm(pc_est - pc_true, axis=1)
    assert np.median(err) < 0.03, f"sharded SfT median error {np.median(err):.4f}"


def test_sharded_sft_matches_single_chip():
    """The distributed solver must take the SAME update sequence as
    sft.solve (psum reduction order is the only numerical difference)."""
    cfg = Config(sft=SfTConfig(lm_iterations=15))
    topo = meshmod.grid_topology(10, 10)
    DOM = jnp.asarray([-0.4, 0.4, -0.3, 0.3])
    K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    nodes_rest = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1), DOM, topo
    )
    tmpl = meshmod.make_template(nodes_rest, topo)
    rng = np.random.default_rng(5)
    n = 128
    uvp = np.stack(
        [rng.uniform(-0.38, 0.38, n), rng.uniform(-0.28, 0.28, n)], 1
    ).astype(np.float32)
    facet, bary, _ = meshmod.embed_uv(jnp.asarray(uvp), DOM, topo)
    pts = meshmod.facet_positions(nodes_rest, topo, facet, bary)
    obs = cam.project(K, pts) + jnp.asarray(
        rng.normal(0, 1.0, (n, 2)), jnp.float32
    )
    mask = jnp.asarray(rng.uniform(size=n) > 0.1)
    data = sft.data_from_template(
        tmpl, K, jnp.eye(4), obs_uv=obs, obs_face=facet, obs_bary=bary,
        obs_invsigma2=jnp.ones(n), obs_mask=mask, n_kp=float(n),
    )
    ref = sft.solve(data, topo, cfg)
    mesh = sharded.make_mesh()
    res = sharded.sft_solve_sharded(mesh, data, cfg)
    np.testing.assert_allclose(np.asarray(res.T), np.asarray(ref.T), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.nodes), np.asarray(ref.nodes), atol=1e-4
    )
    # the two-stage chi2 gate must agree with the single-chip inlier set
    assert (np.asarray(res.inlier) == np.asarray(ref.inlier)).mean() > 0.99


# ------------------------------------------------ System-level integration --


def test_system_parallel_matches_single_device():
    """The PRODUCTION System in Config.parallel mode (observation-sharded
    frame SfT + pair/point-sharded mapping) must track the same trajectory
    as the single-device System — psum reduction order is the only
    numerical difference (VERDICT: multi-chip must run in the product,
    not as a leaf library)."""
    from defslam_tpu.io.synthetic import make_sequence
    from defslam_tpu.system import System, TrackingState

    seq = make_sequence(n_frames=9, height=96, width=128, max_amp=0.04,
                        seed=2)

    def run(parallel: bool):
        cfg = Config(
            camera=seq.camera,
            orb=OrbConfig(n_features=160, n_levels=2, max_keypoints=192),
            sft=SfTConfig(lm_iterations=10),
            tracking=TrackingConfig(keyframe_period=4),
            capacity=CapacityConfig(max_map_points=512, max_keyframes=8),
            mapping=MappingConfig(schwarp_lm_iterations=1,
                                  points_to_template=60, chi_limit=0.2),
            parallel=ParallelConfig(enabled=parallel),
        )
        sys_ = System(cfg)
        poses = []
        for t in range(seq.frames.shape[0]):
            p = sys_.track_monocular(seq.frames[t], float(t))
            poses.append(np.asarray(p) if p is not None else None)
        return sys_, poses

    sys_a, poses_a = run(parallel=False)
    sys_b, poses_b = run(parallel=True)
    assert sys_b.mesh is not None and sys_b.mesh.devices.size == 8
    assert sys_a.state == sys_b.state == TrackingState.OK
    # psum reduction-order noise is amplified frame-to-frame by the
    # constant-velocity motion model (the prediction feeds the next
    # solve), so per-element agreement degrades with sequence position —
    # a looser absolute tolerance than a single solve would need
    for t, (pa, pb) in enumerate(zip(poses_a, poses_b)):
        assert (pa is None) == (pb is None), f"frame {t} tracked differently"
        if pa is not None:
            np.testing.assert_allclose(pa, pb, atol=2e-2)


def test_schur_node_partition_matches_dense():
    """Mesh-axis scaling (SURVEY 5.7): on a LARGE template (16x16 = 256
    nodes, past the 10x10 the reference hard-codes, TriangularMesh.cc:63-65)
    the sharded solver node-block-partitions the damped-normal solve (Schur
    reduction to the camera+boundary system, psum'd over the mesh).  The
    result must match the single-chip dense solve."""
    from defslam_tpu.config import MeshConfig

    cfg = Config(sft=SfTConfig(lm_iterations=12),
                 mesh=MeshConfig(nodes_u=16, nodes_v=16))
    topo = meshmod.grid_topology(16, 16)
    DOM = jnp.asarray([-0.4, 0.4, -0.3, 0.3])
    K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    nodes_rest = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1), DOM, topo
    )
    tmpl = meshmod.make_template(nodes_rest, topo)
    rng = np.random.default_rng(7)
    n = 512
    uvp = np.stack(
        [rng.uniform(-0.38, 0.38, n), rng.uniform(-0.28, 0.28, n)], 1
    ).astype(np.float32)
    facet, bary, _ = meshmod.embed_uv(jnp.asarray(uvp), DOM, topo)
    pts = meshmod.facet_positions(nodes_rest, topo, facet, bary)
    obs = cam.project(K, pts) + jnp.asarray(
        rng.normal(0, 0.8, (n, 2)), jnp.float32
    )
    data = sft.data_from_template(
        tmpl, K, jnp.eye(4), obs_uv=obs, obs_face=facet, obs_bary=bary,
        obs_invsigma2=jnp.ones(n), obs_mask=jnp.ones(n, bool), n_kp=float(n),
    )
    ref = sft.solve(data, topo, cfg)
    mesh = sharded.make_mesh()
    # the partition must actually engage on this shape
    assert cfg.mesh.n_nodes >= 256 and cfg.mesh.nodes_u % mesh.devices.size == 0
    res = sharded.sft_solve_sharded(mesh, data, cfg)
    np.testing.assert_allclose(np.asarray(res.T), np.asarray(ref.T), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.nodes), np.asarray(ref.nodes), atol=2e-4
    )


def test_nonsquare_mesh_solves():
    """mesh.nodes_u / nodes_v are real knobs: a non-square 12x8 template
    tracks a deformed observation set (the reference cannot vary its grid,
    TriangularMesh.cc:63-65)."""
    from defslam_tpu.config import MeshConfig

    cfg = Config(sft=SfTConfig(lm_iterations=15),
                 mesh=MeshConfig(nodes_u=12, nodes_v=8))
    topo = meshmod.grid_topology(12, 8)
    DOM = jnp.asarray([-0.4, 0.4, -0.3, 0.3])
    K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    nodes_rest = meshmod.grid_nodes_from_surface(
        lambda u, v: jnp.stack([u, v, jnp.ones_like(u)], axis=-1), DOM, topo
    )
    tmpl = meshmod.make_template(nodes_rest, topo)
    rng = np.random.default_rng(3)
    n = 256
    uvp = np.stack(
        [rng.uniform(-0.38, 0.38, n), rng.uniform(-0.28, 0.28, n)], 1
    ).astype(np.float32)
    facet, bary, _ = meshmod.embed_uv(jnp.asarray(uvp), DOM, topo)
    pts = meshmod.facet_positions(nodes_rest, topo, facet, bary)
    obs = cam.project(K, pts)
    data = sft.data_from_template(
        tmpl, K, jnp.eye(4), obs_uv=obs, obs_face=facet, obs_bary=bary,
        obs_invsigma2=jnp.ones(n), obs_mask=jnp.ones(n, bool), n_kp=float(n),
    )
    res = sft.solve(data, topo, cfg)
    pts_est = meshmod.facet_positions(res.nodes, topo, facet, bary)
    err = np.linalg.norm(
        np.asarray(se3.transform(res.T, pts_est)) - np.asarray(pts), axis=1
    )
    assert np.median(err) < 0.01
