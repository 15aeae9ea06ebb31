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


def test_resume_continues_metric_streams(tmp_path):
    """Round-3 VERDICT #6 criterion: run N frames, checkpoint, reload in a
    FRESH System, run N more — the written Matches/Trajectory/ErrorGTs
    files must equal an uninterrupted 2N-frame run (resume must not
    truncate the metric pipeline's history)."""
    seq = make_sequence(n_frames=20, height=120, width=160, max_amp=0.05)
    cfg = _cfg(seq.camera)
    import dataclasses

    cfg = dataclasses.replace(cfg, save_results=True)

    # uninterrupted reference run
    full = System(dataclasses.replace(cfg, output_dir=str(tmp_path / "full")))
    for t in range(20):
        full.track_monocular_ct(seq.frames[t], seq.depths[t], float(t))
    full.write_metrics()

    # split run: 10 frames -> checkpoint -> fresh System -> 10 more
    a = System(dataclasses.replace(cfg, output_dir=str(tmp_path / "split")))
    for t in range(10):
        a.track_monocular_ct(seq.frames[t], seq.depths[t], float(t))
    ckpt = str(tmp_path / "ck.npz")
    a.save_state(ckpt)
    b = System(dataclasses.replace(cfg, output_dir=str(tmp_path / "split")))
    b.load_state(ckpt)
    for t in range(10, 20):
        b.track_monocular_ct(seq.frames[t], seq.depths[t], float(t))
    b.write_metrics()

    # FULL-row equality (round-4 VERDICT #6: timestamp-only comparison
    # under-asserts — match/inlier counts could silently diverge after
    # resume).  Integer columns must be exact; float columns (poses in
    # Trajectory, errors in ErrorGTs) compare with a tolerance.
    def rows_equal(name, atol):
        fa = (tmp_path / "full" / name).read_text().splitlines()
        fb = (tmp_path / "split" / name).read_text().splitlines()
        assert len(fa) == len(fb), f"{name}: {len(fa)} vs {len(fb)} rows"
        for i, (ra, rb) in enumerate(zip(fa, fb)):
            ca, cb = ra.split(), rb.split()
            assert len(ca) == len(cb), f"{name} row {i} column count"
            for x, y in zip(ca, cb):
                try:
                    xa, ya = float(x), float(y)
                except ValueError:
                    assert x == y, f"{name} row {i}: {x!r} vs {y!r}"
                    continue
                # keep integer-formatted columns exactly equal
                if "." not in x and "." not in y:
                    assert x == y, f"{name} row {i}: {x!r} vs {y!r}"
                else:
                    assert abs(xa - ya) <= atol, (
                        f"{name} row {i}: {xa} vs {ya}"
                    )

    rows_equal("Matches.txt", atol=0.0)
    rows_equal("StatusTracking.txt", atol=0.0)
    rows_equal("Trajectory.txt", atol=1e-5)
    # GT accumulator continued: ErrorGTs has one row per evaluated frame,
    # and the 10 pre-checkpoint rows round-trip bit-identically
    rows_equal("ErrorGTs0.txt", atol=1e-6)
    ea = (tmp_path / "full" / "ErrorGTs0.txt").read_text().splitlines()
    assert len(ea) == 20
