"""Pose-only optimization and relocalization."""

import numpy as np
import jax.numpy as jnp

from defslam_tpu.config import (
    CapacityConfig, Config, OrbConfig, SfTConfig, TrackingConfig,
)
from defslam_tpu.geometry import camera as cam
from defslam_tpu.geometry import se3
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System, TrackingState
from defslam_tpu.tracking import pose_opt

K = jnp.asarray([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]])


def test_solve_pose_recovers_camera():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (120, 3)) + [0, 0, 2.0], jnp.float32)
    T_true = se3.se3_exp(jnp.asarray([0.1, -0.05, 0.08, 0.04, -0.06, 0.02]))
    obs = cam.project(K, se3.transform(T_true, pts))
    obs = obs + jnp.asarray(rng.normal(0, 0.4, obs.shape), jnp.float32)
    # 15 gross outliers
    obs = obs.at[:15].add(40.0)
    cfg = Config()
    res = pose_opt.solve_pose(
        K, jnp.eye(4), pts, obs, jnp.ones(120), jnp.ones(120, bool), cfg
    )
    assert int(res.n_inliers) > 90
    err = np.asarray(se3.se3_log(res.T @ se3.inverse(T_true)))
    assert np.abs(err).max() < 5e-3, f"pose error {err}"
    assert not bool(res.inlier[:15].any())


def test_relocalization_after_interruption():
    seq = make_sequence(n_frames=14, height=120, width=160, max_amp=0.05)
    cfg = Config(
        camera=seq.camera,
        orb=OrbConfig(n_features=400, n_levels=3, max_keypoints=512),
        sft=SfTConfig(lm_iterations=20),
        tracking=TrackingConfig(keyframe_period=4),
        capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
    )
    sys_ = System(cfg)
    for t in range(8):
        sys_.track_monocular(seq.frames[t], float(t))
    assert sys_.state == TrackingState.OK
    n_kf = int(np.asarray(sys_.kfs.valid).sum())
    # feed garbage frames -> tracking must fail...
    rng = np.random.default_rng(1)
    sys_.track_monocular(rng.uniform(0, 255, seq.frames[0].shape).astype(np.float32), 99.0)
    # ...then a real frame again: relocalization should recover WITHOUT a map
    # reset (keyframes survive)
    sys_.track_monocular(seq.frames[8], 100.0)
    sys_.track_monocular(seq.frames[9], 101.0)
    assert sys_.state == TrackingState.OK
    assert int(np.asarray(sys_.kfs.valid).sum()) >= n_kf, "map was reset"
