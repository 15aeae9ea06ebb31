"""Template regeneration (NRSfM -> Sim3 -> re-template) end-to-end.

A laterally moving camera exposes new surface area; once enough unmatched
keypoints accumulate (needNewTemplate, DefLocalMapping.cc:355-404) the
system must estimate the keyframe surface, register it to the metric map,
swap the template, and keep tracking with new map points created in the
newly seen region."""

import numpy as np
import pytest

from defslam_tpu.config import (
    CapacityConfig, Config, MappingConfig, OrbConfig, SfTConfig, TrackingConfig,
)
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System, TrackingState


@pytest.fixture(scope="module")
def tracked():
    seq = make_sequence(
        n_frames=22, height=120, width=160, max_amp=0.05, camera_motion=0.5,
        seed=5,
    )
    cfg = Config(
        camera=seq.camera,
        orb=OrbConfig(n_features=400, n_levels=3, max_keypoints=512),
        sft=SfTConfig(lm_iterations=25),
        tracking=TrackingConfig(keyframe_period=4),
        capacity=CapacityConfig(max_map_points=2048, max_keyframes=10),
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
    )
    sys_ = System(cfg)
    for t in range(len(seq.frames)):
        sys_.track_monocular(seq.frames[t], timestamp=float(t))
    return sys_, seq


def test_survives_camera_motion(tracked):
    sys_, seq = tracked
    ok = [m for m in sys_._metrics if m["state"] == "OK"]
    assert len(ok) >= len(seq.frames) - 3, (
        f"too many lost frames: {[m['state'] for m in sys_._metrics]}"
    )


def test_ate_rmse_bounded(tracked):
    """Sim3-aligned absolute trajectory error against the synthetic GT
    camera poses (the BASELINE.json north-star metric)."""
    from defslam_tpu.groundtruth.gt import ate_rmse_trajectory

    sys_, seq = tracked
    sys_.flush()
    ate = ate_rmse_trajectory(sys_.trajectory, seq.poses)
    # camera travels 0.5 world units at scene depth ~1 over 22 frames with
    # 5 template swaps; each swap's Sim3 re-registration is a gauge jump
    # that contributes most of the residual (~0.08 observed).  Regression
    # guard: without the constant-velocity motion model this diverges to
    # >0.14 (camera motion absorbed by mesh deformation).
    assert ate < 0.12, f"ATE RMSE {ate:.4f}"


def test_ate_rmse_sim3_invariance():
    """ate_rmse must be exactly zero for trajectories differing only by a
    global Sim3 (the monocular gauge), and positive under real drift."""
    from defslam_tpu.groundtruth.gt import ate_rmse
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    T = 25
    centers = np.cumsum(rng.normal(0, 0.1, (T, 3)), axis=0)
    poses = np.tile(np.eye(4), (T, 1, 1))
    Rw = Rotation.random(T, random_state=1).as_matrix()
    poses[:, :3, :3] = Rw
    poses[:, :3, 3] = -np.einsum("tij,tj->ti", Rw, centers)
    # apply a global similarity to the camera centers: c' = s R c + t
    s, Rg, tg = 2.3, Rotation.random(1, random_state=2).as_matrix()[0], \
        np.array([0.4, -1.0, 2.0])
    c_est = s * centers @ Rg.T + tg
    est2 = np.tile(np.eye(4), (T, 1, 1))
    est2[:, :3, :3] = Rw @ Rg.T
    est2[:, :3, 3] = -np.einsum("tij,tj->ti", est2[:, :3, :3], c_est)
    assert ate_rmse(est2, poses) < 1e-9
    drift = est2.copy()
    drift[:, :3, 3] += np.linspace(0, 0.5, T)[:, None] * np.array([1.0, 0, 0])
    assert ate_rmse(drift, poses) > 1e-3


def test_template_was_regenerated(tracked):
    sys_, _ = tracked
    regen = [m for m in sys_._metrics if m["template"]]
    assert len(regen) >= 1, "re-templating never triggered"
    assert sys_.template_ref_kf > 0  # template anchored to a later keyframe


def test_new_points_created(tracked):
    sys_, _ = tracked
    n_points = int(np.asarray(sys_.points.valid).sum())
    # more points than the initial embedding (new area was mapped)
    first_kf_points = int((np.asarray(sys_.points.ref_kf) == 0).sum())
    assert n_points > first_kf_points
    # points created by later keyframes exist
    assert int((np.asarray(sys_.points.ref_kf) > 0).sum()) > 20


def test_surfaces_estimated(tracked):
    sys_, _ = tracked
    assert int(np.asarray(sys_.kfs.surf_valid).sum()) >= 1


def test_exploration_count_mask():
    """needNewTemplate's dilated-occupancy count (DefLocalMapping.cc:355-404):
    unmatched keypoints NEAR matched ones are inside the dilated mask and do
    not count; far ones do."""
    import jax.numpy as jnp
    import numpy as np
    from defslam_tpu.config import CameraConfig, Config
    from defslam_tpu.mapping import mapper

    cfg = Config(camera=CameraConfig(width=200, height=100))
    # 3 matched keypoints on the left side; kernel = 200//20 = 10 px
    xy = jnp.asarray(
        [[20.0, 50.0], [30.0, 50.0], [40.0, 50.0],
         [24.0, 52.0],    # unmatched, inside dilation -> not counted
         [150.0, 50.0], [180.0, 20.0]],  # unmatched, far -> counted
        jnp.float32,
    )
    valid = jnp.ones(6, bool)
    pid = jnp.asarray([1, 2, 3, -1, -1, -1], jnp.int32)
    n = int(mapper.exploration_count(xy, valid, pid, cfg))
    assert n == 2, f"expected 2 exploration points, got {n}"


def test_select_ref_keyframe_votes():
    """selectKeyframe (DefLocalMapping.cc:411-441): the keyframe that
    created the most currently-observed points wins."""
    import jax.numpy as jnp
    from defslam_tpu.mapping import mapper

    pid_row = jnp.asarray([0, 1, 2, 3, -1, -1], jnp.int32)
    point_ref_kf = jnp.asarray([2, 2, 2, 1, 0, 0], jnp.int32)
    point_valid = jnp.ones(6, bool)
    kf_valid = jnp.asarray([True, True, True, False], bool)
    slot = jnp.asarray(3, jnp.int32)
    sel = int(mapper.select_ref_keyframe(
        pid_row, point_ref_kf, point_valid, kf_valid, slot
    ))
    assert sel == 2
    # no votes -> fall back to the new keyframe
    sel2 = int(mapper.select_ref_keyframe(
        jnp.full(6, -1, jnp.int32), point_ref_kf, point_valid, kf_valid, slot
    ))
    assert sel2 == 3
