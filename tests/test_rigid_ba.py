"""Rigid optimizer suite: Schur BA, Sim3 refinement, essential graph,
keyframe culling (reference Optimizer.cc / LocalMapping.cc:645-725)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from defslam_tpu.geometry import se3
from defslam_tpu.rigid import ba, culling


def _make_scene(rng, n_cams=6, n_pts=120, noise_px=0.3):
    K = jnp.array([[400.0, 0.0, 160.0], [0.0, 400.0, 120.0], [0.0, 0.0, 1.0]])
    pts = jnp.asarray(
        rng.uniform([-1.0, -0.8, 3.0], [1.0, 0.8, 5.0], size=(n_pts, 3)),
        jnp.float32,
    )
    poses = []
    for c in range(n_cams):
        xi = jnp.array(
            [0.25 * c, 0.02 * c, 0.01 * c, 0.0, 0.04 * c, 0.01 * c], jnp.float32
        )
        poses.append(se3.se3_exp(xi))
    poses = jnp.stack(poses)
    pc = jnp.einsum("cij,pj->cpi", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    uv = jnp.stack(
        [
            K[0, 0] * pc[..., 0] / pc[..., 2] + K[0, 2],
            K[1, 1] * pc[..., 1] / pc[..., 2] + K[1, 2],
        ],
        axis=-1,
    )
    uv = uv + jnp.asarray(rng.normal(0, noise_px, uv.shape), jnp.float32)
    return K, poses, pts, uv


def test_ba_recovers_perturbed_scene():
    rng = np.random.default_rng(0)
    K, poses_gt, pts_gt, uv = _make_scene(rng)
    C, P = poses_gt.shape[0], pts_gt.shape[0]
    # every camera observes every point: pid[c, k] = k
    pid = jnp.broadcast_to(jnp.arange(P)[None], (C, P)).astype(jnp.int32)
    prob = ba.BAProblem(
        poses=jnp.stack(
            [
                se3.se3_exp(
                    jnp.asarray(rng.normal(0, 0.02, 6), jnp.float32)
                    * (1.0 if c >= 2 else 0.0)
                )
                @ poses_gt[c]
                for c in range(C)
            ]
        ),
        xyz=pts_gt + jnp.asarray(rng.normal(0, 0.05, (P, 3)), jnp.float32),
        pid=pid,
        uv=uv,
        inv_sigma2=jnp.ones((C, P)),
        obs_mask=jnp.ones((C, P), bool),
        cam_free=jnp.arange(C) >= 2,  # two fixed cams pin pose + scale gauge
        point_free=jnp.ones((P,), bool),
    )
    res = jax.jit(ba.ba_solve)(prob, K)
    assert int(res.n_inliers) > 0.95 * C * P
    # reprojection residual at solution ~ noise level
    chi2 = ba._chi2_of(prob._replace(obs_mask=res.inlier), K, res.poses, res.xyz)
    rms = float(jnp.sqrt(jnp.mean(jnp.where(res.inlier, chi2, 0.0))))
    assert rms < 1.0, rms
    # structure close to ground truth (gauge is pinned by the 2 fixed cams)
    err = float(jnp.median(jnp.linalg.norm(res.xyz - pts_gt, axis=-1)))
    assert err < 0.02, err
    pose_err = float(
        jnp.max(jnp.linalg.norm(se3.se3_log(res.poses @ se3.inverse(poses_gt)), axis=-1))
    )
    assert pose_err < 0.01, pose_err


def test_ba_gates_outliers():
    rng = np.random.default_rng(1)
    K, poses_gt, pts_gt, uv = _make_scene(rng, noise_px=0.2)
    C, P = poses_gt.shape[0], pts_gt.shape[0]
    # corrupt camera 3's observations of 10 points (inconsistent with the
    # other views, so BA cannot absorb it by moving the points)
    uv = uv.at[3, :10].add(40.0)
    pid = jnp.broadcast_to(jnp.arange(P)[None], (C, P)).astype(jnp.int32)
    prob = ba.BAProblem(
        poses=poses_gt,
        xyz=pts_gt,
        pid=pid,
        uv=uv,
        inv_sigma2=jnp.ones((C, P)),
        obs_mask=jnp.ones((C, P), bool),
        cam_free=jnp.arange(C) >= 2,
        point_free=jnp.ones((P,), bool),
    )
    res = jax.jit(ba.ba_solve)(prob, K)
    assert not bool(jnp.any(res.inlier[3, :10]))
    assert int(res.n_inliers) > 0.9 * (C * P - 10)


def test_optimize_sim3_recovers_alignment():
    rng = np.random.default_rng(2)
    K = jnp.array([[400.0, 0.0, 160.0], [0.0, 400.0, 120.0], [0.0, 0.0, 1.0]])
    n = 80
    x2 = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 6], (n, 3)), jnp.float32)
    s_gt = jnp.asarray(1.4, jnp.float32)
    R_gt = se3.so3_exp(jnp.array([0.1, -0.2, 0.05], jnp.float32))
    t_gt = jnp.array([0.3, -0.1, 0.2], jnp.float32)
    x1 = se3.sim3_apply(s_gt[None], R_gt, t_gt, x2[None])[0]
    uv1 = jnp.stack(
        [K[0, 0] * x1[:, 0] / x1[:, 2] + K[0, 2], K[1, 1] * x1[:, 1] / x1[:, 2] + K[1, 2]],
        axis=-1,
    )
    uv2 = jnp.stack(
        [K[0, 0] * x2[:, 0] / x2[:, 2] + K[0, 2], K[1, 1] * x2[:, 1] / x2[:, 2] + K[1, 2]],
        axis=-1,
    )
    # seed from the closed-form Horn alignment on noisy 3D-3D pairs, like the
    # reference seeds OptimizeSim3 from Sim3Solver RANSAC (LoopClosing.cc)
    x1_noisy = x1 + jnp.asarray(rng.normal(0, 0.05, x1.shape), jnp.float32)
    s0, R0, t0 = se3.horn_alignment(x2, x1_noisy, jnp.ones(n))
    res = jax.jit(ba.optimize_sim3)(
        K,
        s0,
        R0,
        t0,
        x1,
        x2,
        uv1,
        uv2,
        jnp.ones(n),
        jnp.ones(n),
        jnp.ones(n, bool),
    )
    assert float(jnp.abs(res.s - s_gt)) < 1e-2
    assert float(jnp.linalg.norm(res.t - t_gt)) < 2e-2
    assert float(jnp.linalg.norm(res.R - R_gt)) < 1e-2
    assert int(res.n_inliers) == n


def test_essential_graph_closes_loop():
    # ground truth: 8 cameras on a circle; drifted estimate accumulates
    # error; measurements come from ground-truth relative poses, loop edge
    # 7->0 pulls the chain back.
    F = 8
    angles = np.linspace(0, 2 * np.pi * 7 / 8, F)
    T_gt = []
    for a in angles:
        xi = jnp.array([np.cos(a), np.sin(a), 0.0, 0.0, 0.0, a], jnp.float32)
        T_gt.append(se3.se3_exp(xi))
    T_gt = jnp.stack(T_gt)
    s_gt, R_gt, t_gt = ba.sim3_from_se3(T_gt)
    # drifted initial guess: growing perturbation + scale drift
    rng = np.random.default_rng(3)
    drift = jnp.cumsum(
        jnp.asarray(rng.normal(0, 0.02, (F, 7)), jnp.float32), axis=0
    ).at[0].set(0.0)
    ds, dR, dt = jax.vmap(se3.sim3_exp)(drift)
    s0, R0, t0 = ba._sim3_compose(ds, dR, dt, s_gt, R_gt, t_gt)

    edge_i = jnp.array(list(range(F - 1)) + [7], jnp.int32)
    edge_j = jnp.array(list(range(1, F)) + [0], jnp.int32)
    graph = ba.build_edges_from_poses(
        edge_i,
        edge_j,
        s_gt,
        R_gt,
        t_gt,
        jnp.ones(F, bool),
        fixed=jnp.arange(F) == 0,
    )
    s, R, t = jax.jit(ba.optimize_essential_graph)(graph, s0, R0, t0)
    # residual edge errors vanish and poses return to ground truth
    assert float(jnp.max(jnp.abs(s - s_gt))) < 5e-3
    assert float(jnp.max(jnp.abs(t - t_gt))) < 1e-2
    assert float(jnp.max(jnp.abs(R - R_gt))) < 1e-2


def test_keyframe_culling_flags_redundant_kf():
    P = 40
    F, Kk = 4, P
    # KFs 0..2 see all points at level 0; KF 3 sees a subset also at level 0
    point_id = jnp.full((F, Kk), -1, jnp.int32)
    for f in range(3):
        point_id = point_id.at[f].set(jnp.arange(P))
    point_id = point_id.at[3, :30].set(jnp.arange(30))
    level = jnp.zeros((F, Kk), jnp.int32)
    kp_valid = point_id >= 0
    ratios = culling.redundancy_ratios(
        point_id, level, kp_valid, jnp.ones(F, bool), jnp.ones(P, bool)
    )
    # every KF's points are covered by the 3 others
    assert float(ratios[3]) == pytest.approx(1.0)
    slot = culling.pick_cull(ratios, protect=jnp.arange(F) == 0)
    assert int(slot) in (1, 2, 3)
    # with only 2 observers nothing is redundant
    ratios2 = culling.redundancy_ratios(
        point_id.at[0].set(-1),
        level,
        kp_valid.at[0].set(False),
        jnp.ones(F, bool),
        jnp.ones(P, bool),
    )
    assert float(jnp.max(ratios2)) == 0.0
    assert int(culling.pick_cull(ratios2, protect=jnp.arange(F) == 0)) == -1
