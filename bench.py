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
        seq = make_sequence(n_frames=8, height=120, width=160, max_amp=0.06)
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
        seq = make_sequence(n_frames=24, height=480, width=640, max_amp=0.08)
        cfg = Config(
            camera=seq.camera,
            orb=OrbConfig(n_features=1200, n_levels=6, max_keypoints=1536),
            sft=SfTConfig(lm_iterations=50),
            tracking=TrackingConfig(keyframe_period=10),
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

    t0 = time.perf_counter()
    for t in range(n_warm, n_warm + n_meas):
        pose = sys_.track_monocular(frames_dev[t % len(frames_dev)],
                                    timestamp=float(t))
    sys_.flush()  # the last pipelined frame's compute counts too
    elapsed = time.perf_counter() - t0
    fps = n_meas / elapsed

    ok_frames = sum(1 for m in sys_._metrics if m["state"] == "OK")
    # accuracy gate: tracked structure vs the synthetic GT depth of the last
    # frame processed (median relative depth error of matched map points).
    # Guards the perf number against "fast because it stopped tracking".
    frame_idx = (n_warm + n_meas - 1) % len(seq.frames)
    acc = _accuracy(sys_, seq, frame_idx)
    result = {
        "metric": "track_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 3),
        "median_depth_err": round(acc, 4),
        "frames_ok": ok_frames,
    }
    assert ok_frames == len(sys_._metrics), "bench run lost tracking"
    assert acc < 0.10, f"accuracy regression: median depth error {acc:.3f}"
    print(json.dumps(result))
    if "--verbose" in sys.argv:
        print(
            f"# frames OK: {ok_frames}/{len(sys_._metrics)}, "
            f"measured {n_meas} frames in {elapsed:.2f}s, "
            f"median depth err {acc:.4f}",
            file=sys.stderr,
        )


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
