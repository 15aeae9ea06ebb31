"""End-to-end tracking on a synthetic deforming sequence.

The smoke-level equivalent of the reference's Mandala runs: initialize from
the plane template, track a breathing surface, insert keyframes, run the
NRSfM mapping step, and check the tracked 3D structure against GT depth.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from defslam_tpu.config import (
    CapacityConfig, Config, MappingConfig, OrbConfig, SfTConfig, TrackingConfig,
)
from defslam_tpu.io.synthetic import make_sequence, surface_depth
from defslam_tpu.system import System, TrackingState


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=16, height=120, width=160, max_amp=0.08)


@pytest.fixture(scope="module")
def tracked(seq):
    cam = seq.camera
    cfg = Config(
        camera=cam,
        orb=OrbConfig(n_features=400, n_levels=3, max_keypoints=512),
        sft=SfTConfig(lm_iterations=25),
        tracking=TrackingConfig(keyframe_period=5),
        capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
        # re-templating ON: the depth-accuracy assertion below covers the
        # full NRSfM -> Sim3 -> re-embed -> re-anchor path, not just SfT
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
    )
    sys_ = System(cfg)
    results = []
    for t in range(len(seq.frames)):
        pose = sys_.track_monocular(seq.frames[t], timestamp=t / 10.0)
        results.append((pose, sys_.get_tracking_state()))
    sys_.flush()  # finalize in-flight pipelined frames (incl. keyframes)
    return sys_, results


def test_tracks_whole_sequence(tracked):
    sys_, results = tracked
    states = [s for _, s in results]
    assert states[0] == TrackingState.OK  # initialized on frame 0
    assert all(s == TrackingState.OK for s in states), states
    m = sys_._metrics
    # after init, tracking should keep a healthy inlier count
    inl = [r["inliers"] for r in m[1:]]
    assert min(inl) > 30, f"inliers dropped: {inl}"


def test_keyframes_inserted(tracked):
    sys_, _ = tracked
    assert int(np.asarray(sys_.kfs.valid).sum()) >= 3


def test_structure_matches_gt_depth(tracked, seq):
    # tracked template surface should follow the GT deformation: compare
    # depth of map points (projected along their retina ray) with GT
    sys_, results = tracked
    from defslam_tpu.geometry import se3
    pts = np.asarray(sys_.points.xyz)
    valid = np.asarray(sys_.points.valid) & (np.asarray(sys_.points.facet) >= 0)
    pose = jnp.asarray(results[-1][0])
    pc = np.asarray(se3.transform(pose, jnp.asarray(pts)))[valid]
    u, v = pc[:, 0] / pc[:, 2], pc[:, 1] / pc[:, 2]
    gt = surface_depth(u, v, seq.amps[len(seq.frames) - 1])
    rel = np.abs(pc[:, 2] - gt) / gt
    assert np.median(rel) < 0.05, f"median depth error {np.median(rel):.3f}"


def test_localization_mode_inserts_no_keyframes(seq):
    cam = seq.camera
    cfg = Config(
        camera=cam,
        orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
        sft=SfTConfig(lm_iterations=15),
        tracking=TrackingConfig(keyframe_period=3),
        capacity=CapacityConfig(max_map_points=512, max_keyframes=8),
    )
    sys_ = System(cfg)
    sys_.track_monocular(seq.frames[0])
    sys_.activate_localization_mode()
    for t in range(1, 8):
        sys_.track_monocular(seq.frames[t])
    assert int(np.asarray(sys_.kfs.valid).sum()) == 1  # only the init KF


def test_metrics_written(tracked, tmp_path_factory):
    sys_, _ = tracked
    out = tmp_path_factory.mktemp("metrics")
    sys_.write_metrics(str(out))
    lines = (out / "Matches.txt").read_text().strip().splitlines()
    assert len(lines) == len(sys_._metrics)
    traj = (out / "Trajectory.txt").read_text().strip().splitlines()
    assert len(traj) == len(sys_.trajectory)


def test_pipelined_matches_synchronous(seq):
    """The depth-D optimistic pipeline is an execution strategy, not a
    semantic change: a pipelined run must produce the same per-frame
    metrics rows and trajectory as a synchronous run (round-2 VERDICT: the
    optimistic rows used to keep -1 sentinels and reorder)."""
    cam = seq.camera

    def run(pipelined: bool, depth: int = 2):
        cfg = Config(
            camera=cam,
            orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
            sft=SfTConfig(lm_iterations=15),
            tracking=TrackingConfig(keyframe_period=4, pipelined=pipelined,
                                    pipeline_depth=depth),
            capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
            mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
        )
        sys_ = System(cfg)
        for t in range(10):
            sys_.track_monocular(seq.frames[t], timestamp=float(t))
        sys_.flush()
        return sys_

    a = run(False)
    b = run(True)
    assert len(a._metrics) == len(b._metrics)
    for ma, mb in zip(a._metrics, b._metrics):
        assert ma == mb, (ma, mb)
    assert len(a.trajectory) == len(b.trajectory)
    for (tsa, ta), (tsb, tb) in zip(a.trajectory, b.trajectory):
        assert tsa == tsb
        np.testing.assert_allclose(ta, tb, atol=1e-6)


def test_pipelined_keyframe_rollback_matches_synchronous(seq):
    """A frame that fails validation AT the keyframe cadence slot: the
    optimistic keyframe insertion (store donation + async mapping chain)
    must be rolled back so the final state equals the synchronous run's."""
    cam = seq.camera

    def run(pipelined: bool):
        cfg = Config(
            camera=cam,
            orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
            sft=SfTConfig(lm_iterations=15),
            tracking=TrackingConfig(keyframe_period=4, pipelined=pipelined),
            capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
            mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
        )
        sys_ = System(cfg)
        for t in range(9):
            img = seq.frames[t]
            if t == 8:  # the second keyframe slot: blank -> must fail
                img = np.full_like(img, 128.0)
            sys_.track_monocular(img, timestamp=float(t))
        sys_.flush()
        return sys_

    a = run(False)
    b = run(True)
    assert len(a._metrics) == len(b._metrics)
    for ma, mb in zip(a._metrics, b._metrics):
        assert ma == mb, (ma, mb)
    # the rolled-back keyframe must not exist in either store
    assert int(np.asarray(a.kfs.valid).sum()) == int(np.asarray(b.kfs.valid).sum())
    assert a.kf_counter == b.kf_counter
    assert a.template_ref_kf == b.template_ref_kf
    assert len(a.template_history) == len(b.template_history)


def test_split_keyframe_dispatch_tracks_and_retemplates(seq):
    """tracking.split_keyframe_dispatch: the two-dispatch keyframe chain
    (mapper.keyframe_step_a/_b with a frame interleaved) must track the
    whole sequence, re-template, and land within a small accuracy envelope
    of the fused dispatch (exact equality is not expected: the template
    swap becomes visible one frame later, the reference PARALLEL-mode
    asynchrony)."""
    import dataclasses

    from defslam_tpu.groundtruth.gt import ate_rmse_trajectory

    cam = seq.camera

    def run(split: bool):
        cfg = Config(
            camera=cam,
            orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
            sft=SfTConfig(lm_iterations=15),
            tracking=TrackingConfig(keyframe_period=4,
                                    split_keyframe_dispatch=split),
            capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
            mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
        )
        sys_ = System(cfg)
        for t in range(len(seq.frames)):
            sys_.track_monocular(seq.frames[t], timestamp=float(t))
        sys_.flush()
        return sys_

    fused = run(False)
    split = run(True)
    ok_f = sum(1 for m in fused._metrics if m["state"] == "OK")
    ok_s = sum(1 for m in split._metrics if m["state"] == "OK")
    assert ok_s == len(split._metrics), "split dispatch lost tracking"
    assert ok_s == ok_f
    # both re-templated
    assert sum(1 for m in split._metrics if m["template"]) >= 1
    ate_f = float(ate_rmse_trajectory(fused.trajectory, seq.poses))
    ate_s = float(ate_rmse_trajectory(split.trajectory, seq.poses))
    assert ate_s < max(2.0 * ate_f, ate_f + 0.02), (ate_s, ate_f)


def test_split_keyframe_dispatch_rollback(seq):
    """A validation failure of the frame interleaved between the two chain
    halves must roll back coherently: the pre-B stores (B does not donate)
    are that frame's snapshot, and the undispatched/landed B is discarded.
    The run must recover and keep tracking."""
    cam = seq.camera
    cfg = Config(
        camera=cam,
        orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
        sft=SfTConfig(lm_iterations=15),
        tracking=TrackingConfig(keyframe_period=4,
                                split_keyframe_dispatch=True),
        capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
    )
    sys_ = System(cfg)
    for t in range(12):
        img = seq.frames[t]
        if t == 5:  # the frame right after the keyframe at t=4: blank
            img = np.full_like(img, 128.0)
        sys_.track_monocular(img, timestamp=float(t))
    sys_.flush()
    by_t = {m["t"]: m for m in sys_._metrics}
    assert by_t[5.0]["state"] != "OK"
    # recovery: later frames track again and stores stay consistent
    assert by_t[11.0]["state"] == "OK"
    pid = np.asarray(sys_.kfs.point_id)
    pv = np.asarray(sys_.points.valid)
    bound = pid[pid >= 0]
    assert (bound < sys_.points.capacity).all()
    # most observations reference live points (culling may retire a few)
    assert pv[bound].mean() > 0.5
