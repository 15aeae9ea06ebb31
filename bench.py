#!/usr/bin/env python
"""Benchmark: tracked frames/s of the full per-frame pipeline.

Measures the end-to-end System.track_monocular loop (ORB extraction +
projection matching + SfT camera/mesh solve + point reposing, with keyframe
insertion + the NRSfM mapping step at the reference cadence of every 10th
frame) on a synthetic 640x480 sequence at the reference's feature budget
(1200 ORB features, ~100-node mesh, 50 LM iterations per frame —
BASELINE.md).

Baseline: the reference DefSLAM is "real-time" on a desktop i7 at the
shipped 7 fps camera rate (README.md:30, stereo0_template.yaml); we take
7 fps as the reference CPU throughput.  vs_baseline = ours / 7.0, so the
BASELINE.json north star (>= 3x reference on one chip) corresponds to
vs_baseline >= 3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REF_FPS = 7.0


def main():
    quick = "--quick" in sys.argv
    # persistent compilation cache: first-ever run pays the compiles, every
    # later run (and later rounds) starts hot
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from defslam_tpu.config import (
        CapacityConfig, Config, OrbConfig, SfTConfig, TrackingConfig,
        MappingConfig,
    )
    from defslam_tpu.io.synthetic import make_sequence
    from defslam_tpu.system import System

    if quick:
        seq = make_sequence(n_frames=8, height=120, width=160, max_amp=0.06,
                            camera_motion=0.10)
        cfg = Config(
            camera=seq.camera,
            orb=OrbConfig(n_features=300, n_levels=3, max_keypoints=384),
            sft=SfTConfig(lm_iterations=20),
            tracking=TrackingConfig(keyframe_period=5),
            capacity=CapacityConfig(max_map_points=512, max_keyframes=8),
            mapping=MappingConfig(points_to_template=100000),
        )
        n_warm, n_meas = 6, 6  # warmup must cover a keyframe+mapping step
    else:
        # the reference's eval regime is handheld 6-DoF (Mandala/Hamlyn,
        # README.md section 5): rotation_deg sweeps ±10 deg yaw (+pitch/
        # roll), three superposed deformation modes, 10% brightness drift
        seq = make_sequence(n_frames=24, height=480, width=640, max_amp=0.08,
                            camera_motion=0.35, rotation_deg=20,
                            deform_modes=3, brightness_drift=0.1)
        cfg = Config(
            camera=seq.camera,
            orb=OrbConfig(n_features=1200, n_levels=6, max_keypoints=1536),
            sft=SfTConfig(lm_iterations=50),
            # depth 2 measured best for p95/p99 (sweep r5: depth 3/4 gain
            # ~0.7 fps but push p99 81 -> 121/137 ms — longer drains);
            # split keyframe dispatch halves the largest single dispatch
            tracking=TrackingConfig(
                keyframe_period=10,
                pipeline_depth=int(os.environ.get("DEFSLAM_BENCH_DEPTH", 2)),
                split_keyframe_dispatch=os.environ.get(
                    "DEFSLAM_BENCH_SPLIT", "1") == "1",
            ),
            capacity=CapacityConfig(max_map_points=4096, max_keyframes=16),
        )
        n_warm, n_meas = 12, 12

    sys_ = System(cfg)
    # prefetch pipeline: frames live on device as uint8 before the loop
    # (the role of the native FramePipeline + async upload in deployment —
    # the tracker never waits on host->device image transfer)
    import jax
    import jax.numpy as jnp

    frames_dev = [
        jax.device_put(f.astype(np.uint8)) for f in seq.frames
    ]
    jax.block_until_ready(frames_dev)
    # warmup phase compiles every kernel incl. one keyframe+mapping step
    for t in range(n_warm):
        sys_.track_monocular(frames_dev[t], timestamp=float(t))
    sys_.flush()  # drain warmup backlog: measure steady state, not compile/queue debt

    frame_ms = []
    t0 = time.perf_counter()
    for t in range(n_warm, n_warm + n_meas):
        tf = time.perf_counter()
        pose = sys_.track_monocular(frames_dev[t % len(frames_dev)],
                                    timestamp=float(t))
        frame_ms.append((time.perf_counter() - tf) * 1e3)
    tl = time.perf_counter()
    sys_.flush()  # the last pipelined frame's compute counts too
    frame_ms[-1] += (time.perf_counter() - tl) * 1e3
    elapsed = time.perf_counter() - t0
    fps = n_meas / elapsed

    ok_frames = sum(1 for m in sys_._metrics if m["state"] == "OK")
    # accuracy gate: tracked structure vs the synthetic GT depth of the last
    # frame processed (median relative depth error of matched map points).
    # Guards the perf number against "fast because it stopped tracking".
    frame_idx = (n_warm + n_meas - 1) % len(seq.frames)
    acc = _accuracy(sys_, seq, frame_idx)
    # ATE (north-star metric): Sim3-aligned trajectory RMSE vs the GT camera
    # poses, paired by frame timestamp (sequences replay cyclically)
    from defslam_tpu.groundtruth.gt import ate_rmse_trajectory

    ate = ate_rmse_trajectory(sys_.trajectory, seq.poses)
    p50, p95, p99 = (
        float(np.percentile(frame_ms, q)) for q in (50, 95, 99)
    )
    stages = _stage_breakdown(sys_, frames_dev[0])
    result = {
        "metric": "track_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 3),
        "median_depth_err": round(acc, 4),
        "ate_rmse": round(ate, 5),
        "frames_ok": ok_frames,
        "p50_ms": round(p50, 2),
        "p95_ms": round(p95, 2),
        "p99_ms": round(p99, 2),
        "stages": stages,
    }
    print(json.dumps(result))
    assert ok_frames == len(sys_._metrics), "bench run lost tracking"
    assert acc < 0.10, f"accuracy regression: median depth error {acc:.3f}"
    # observed at full scale on the ROTATING-camera sequence (r5): depth
    # err ~0.01-0.03, ATE ~0.04; the gates are regression guards, not the
    # target — see BASELINE.md
    assert ate < 0.10, f"trajectory regression: ATE RMSE {ate:.4f}"
    if "--verbose" in sys.argv:
        print(
            f"# frames OK: {ok_frames}/{len(sys_._metrics)}, "
            f"measured {n_meas} frames in {elapsed:.2f}s, "
            f"median depth err {acc:.4f}, ate {ate:.5f}, "
            f"frame ms p50/p95/p99 = {p50:.1f}/{p95:.1f}/{p99:.1f}",
            file=sys.stderr,
        )


def _stage_breakdown(sys_, frame) -> dict:
    """Per-stage DEVICE time + XLA-reported flops + rough MFU for the
    per-frame pipeline stages (VERDICT r3: decide optimizations from data).

    Each stage is timed as its own dispatch (block_until_ready over n
    reps); in production they run fused in track_frame, so the sum here is
    an upper bound on the fused frame's device time.  MFU uses the XLA
    cost analysis flops over an f32 peak of ~49 TFLOP/s (TPU v5e MXU at
    fp32 accumulate) — a coarse utilization figure, not a measurement.
    """
    import time

    import jax
    import jax.numpy as jnp

    from defslam_tpu.frontend import extract_features
    from defslam_tpu.tracking import tracker

    cfg, K = sys_.cfg, sys_.K
    out = {}
    PEAK_F32 = 49e12

    def timeit(name, fn, lowered_args=None, n=5):
        r = fn()  # warm (all compiles are cached from the measured run)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1e3
        entry = {"ms": round(ms, 2)}
        if lowered_args is not None:
            try:
                an = lowered_args().cost_analysis()
                if isinstance(an, (list, tuple)):
                    an = an[0]
                fl = float(an.get("flops", 0.0))
                entry["gflops"] = round(fl / 1e9, 2)
                entry["mfu_pct"] = round(100.0 * fl / (ms / 1e3) / PEAK_F32, 3)
            except Exception:
                pass
        out[name] = entry
        return r

    img = jnp.asarray(frame)
    feats = timeit(
        "extract", lambda: extract_features(img, cfg),
        lambda: extract_features.lower(img, cfg).compile(),
    )
    pred = sys_.pose
    matches = timeit(
        "match",
        lambda: tracker.match_points_to_frame(sys_.points, pred, K, feats, cfg),
        lambda: tracker.match_points_to_frame.lower(
            sys_.points, pred, K, feats, cfg
        ).compile(),
    )
    timeit(
        "sft",
        lambda: tracker.sft_track(
            sys_.points, matches, feats, sys_.template, pred, K, cfg
        ),
        lambda: tracker.sft_track.lower(
            sys_.points, matches, feats, sys_.template, pred, K, cfg
        ).compile(),
    )
    # the whole mapping chain (covis pairs -> warps -> normals -> SfN ->
    # Sim3 -> re-template -> culling) as dispatched at every keyframe
    from defslam_tpu.mapping import mapper

    res = tracker.sft_track(
        sys_.points, matches, feats, sys_.template, pred, K, cfg
    )
    # keyframe_step DONATES the store buffers — copy them per call so the
    # probe never reuses a donated buffer (the copy is ~0.5 ms of the
    # chain's tens of ms)
    timeit(
        "keyframe_chain",
        lambda: mapper.keyframe_step(
            jax.tree.map(jnp.copy, sys_.kfs),
            jax.tree.map(jnp.copy, sys_.points),
            sys_.template, sys_.pose, feats,
            matches.kp_of_point, res.inlier, K, sys_.dom,
            sys_.bend_warp, sys_.bend_sfn,
            jnp.asarray(sys_.template_ref_kf, jnp.int32),
            jnp.asarray(sys_.kf_counter, jnp.int32),
            jnp.asarray(sys_.frame_id, jnp.int32), cfg,
        ),
        n=3,
    )
    return out


def _accuracy(sys_, seq, frame_idx: int) -> float:
    """Median relative depth error of the tracked map points against the
    synthetic sequence's GT depth map (the CT-GT metric of
    GroundTruthFrame.cc:124-266, scaled-depth form)."""
    import jax.numpy as jnp

    from defslam_tpu.geometry import camera as cam
    from defslam_tpu.geometry import se3

    depth_gt = np.asarray(seq.depths[frame_idx])
    pc = np.asarray(se3.transform(sys_.pose, sys_.points.xyz))
    uv = np.asarray(cam.project(jnp.asarray(sys_.K), jnp.asarray(pc)))
    valid = (
        np.asarray(sys_.points.valid)
        & (np.asarray(sys_.points.facet) >= 0)
        & (pc[:, 2] > 1e-6)
    )
    h, w = depth_gt.shape
    x = np.clip(uv[:, 0].round().astype(int), 0, w - 1)
    y = np.clip(uv[:, 1].round().astype(int), 0, h - 1)
    inb = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    m = valid & inb
    if m.sum() < 10:
        return float("inf")
    gt = depth_gt[y[m], x[m]]
    z = pc[m, 2]
    # scale-align (monocular scale gauge), then relative error
    s = np.median(gt / np.maximum(z, 1e-9))
    return float(np.median(np.abs(s * z - gt) / np.maximum(gt, 1e-9)))


if __name__ == "__main__":
    main()
