"""Checkpoint / resume — SoA state round-trips through one npz file."""

import numpy as np

from defslam_tpu.config import (
    CapacityConfig, Config, MappingConfig, OrbConfig, SfTConfig, TrackingConfig,
)
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System


def _cfg(cam):
    return Config(
        camera=cam,
        orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
        sft=SfTConfig(lm_iterations=15),
        tracking=TrackingConfig(keyframe_period=4),
        capacity=CapacityConfig(max_map_points=512, max_keyframes=8),
        # re-templating ON (points_to_template at a reachable value): the
        # checkpoint must round-trip the full NRSfM/re-template machinery
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
    )


def test_checkpoint_roundtrip_and_resume(tmp_path):
    seq = make_sequence(n_frames=12, height=120, width=160, max_amp=0.05)
    cfg = _cfg(seq.camera)
    s1 = System(cfg)
    for t in range(6):
        s1.track_monocular(seq.frames[t], float(t))
    ckpt = str(tmp_path / "state.npz")
    s1.save_state(ckpt)

    s2 = System(cfg)
    s2.load_state(ckpt)
    np.testing.assert_array_equal(np.asarray(s1.pose), np.asarray(s2.pose))
    np.testing.assert_array_equal(
        np.asarray(s1.points.xyz), np.asarray(s2.points.xyz)
    )
    assert s2.frame_id == s1.frame_id

    # both continue identically on the same next frames
    for t in range(6, 12):
        p1 = s1.track_monocular(seq.frames[t], float(t))
        p2 = s2.track_monocular(seq.frames[t], float(t))
        np.testing.assert_allclose(p1, p2, atol=1e-5)
