#!/usr/bin/env python
"""Capacity scaling check (round-3 VERDICT #9): the reference handles
unbounded keyframe counts; our fixed-capacity SoA stores are adequate only
if raising the caps degrades gracefully.  Runs the full-scale bench loop at
the shipped capacity (16 KFs / 4096 points) and at 4x (64 / 8192), printing
fps + p50/p95 + the keyframe-chain stage time for each.

    python tools_capacity.py          # on the TPU (takes a few minutes)

Results are recorded in BASELINE.md.
"""

import json
import os
import time

import numpy as np


def run_at(max_kf: int, max_pts: int):
    import jax
    import jax.numpy as jnp

    from defslam_tpu.config import (
        CapacityConfig, Config, OrbConfig, SfTConfig, TrackingConfig,
    )
    from defslam_tpu.io.synthetic import make_sequence
    from defslam_tpu.system import System

    seq = make_sequence(n_frames=24, height=480, width=640, max_amp=0.08,
                        camera_motion=0.35)
    cfg = Config(
        camera=seq.camera,
        orb=OrbConfig(n_features=1200, n_levels=6, max_keypoints=1536),
        sft=SfTConfig(lm_iterations=50),
        tracking=TrackingConfig(keyframe_period=10),
        capacity=CapacityConfig(max_map_points=max_pts, max_keyframes=max_kf),
    )
    sys_ = System(cfg)
    frames_dev = [jax.device_put(f.astype(np.uint8)) for f in seq.frames]
    jax.block_until_ready(frames_dev)
    n_warm, n_meas = 12, 12
    for t in range(n_warm):
        sys_.track_monocular(frames_dev[t], timestamp=float(t))
    sys_.flush()
    frame_ms = []
    t0 = time.perf_counter()
    for t in range(n_warm, n_warm + n_meas):
        tf = time.perf_counter()
        sys_.track_monocular(frames_dev[t % len(frames_dev)],
                             timestamp=float(t))
        frame_ms.append((time.perf_counter() - tf) * 1e3)
    sys_.flush()
    elapsed = time.perf_counter() - t0
    ok = sum(1 for m in sys_._metrics if m["state"] == "OK")
    return {
        "max_keyframes": max_kf,
        "max_map_points": max_pts,
        "fps": round(n_meas / elapsed, 2),
        "p50_ms": round(float(np.percentile(frame_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(frame_ms, 95)), 1),
        "frames_ok": ok,
        "frames_total": len(sys_._metrics),
    }


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for kf, pts in ((16, 4096), (64, 8192)):
        print(json.dumps(run_at(kf, pts)), flush=True)


if __name__ == "__main__":
    main()
