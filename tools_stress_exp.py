"""Stress-fixture experiment loop: whole-run ATE + per-segment Sim3 scale
trace (the direct observable of accumulated per-swap registration scale
drift, BASELINE.md round-5 notes)."""
import os
import sys
import time

import numpy as np

import jax
# sitecustomize forces the axon TPU tunnel; env JAX_PLATFORMS is NOT enough
# (see tests/conftest.py) — honor DEFSLAM_EXP_PLATFORM=cpu via jax.config
if os.environ.get("DEFSLAM_EXP_PLATFORM", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from defslam_tpu.config import (
    CapacityConfig, Config, MappingConfig, OrbConfig, SfTConfig,
    TrackingConfig,
)
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System
from defslam_tpu.groundtruth.gt import ate_rmse, ate_rmse_trajectory

N_FRAMES = 240
OCCLUSION = (117, 121)


def run(**cfg_over):
    seq = make_sequence(
        n_frames=N_FRAMES, height=240, width=320, max_amp=0.07,
        camera_motion=0.9, seed=9, occlusion=OCCLUSION,
        rotation_deg=16, deform_modes=3, brightness_drift=0.1,
    )
    mapping_kw = dict(points_to_template=70, chi_limit=0.5)
    mapping_kw.update(cfg_over.pop("mapping", {}))
    cfg = Config(
        camera=seq.camera,
        orb=OrbConfig(n_features=600, n_levels=4, max_keypoints=768),
        sft=SfTConfig(lm_iterations=25),
        tracking=TrackingConfig(keyframe_period=10, **cfg_over.pop("tracking", {})),
        capacity=CapacityConfig(max_map_points=2048, max_keyframes=12),
        mapping=MappingConfig(**mapping_kw),
    )
    sys_ = System(cfg)
    t0 = time.perf_counter()
    for t in range(N_FRAMES):
        sys_.track_monocular(seq.frames[t], timestamp=float(t))
    sys_.flush()
    wall = time.perf_counter() - t0
    return sys_, seq, wall


def report(label, sys_, seq, wall):
    ate = ate_rmse_trajectory(sys_.trajectory, seq.poses)
    # per-segment alignment: 6 chunks, each Sim3-aligned independently;
    # the scale factors s_i expose gauge drift between segments
    traj = sys_.trajectory
    gt = np.asarray(seq.poses)
    idx = [int(round(ts)) % len(gt) for ts, _ in traj]
    est = np.stack([np.asarray(T) for _, T in traj])
    gts = gt[idx]
    n = len(traj)
    segs, scales = [], []
    k = 12
    for i in range(k):
        a, b = i * n // k, (i + 1) * n // k
        if b - a < 5:
            continue
        e, g = est[a:b], gts[a:b]
        segs.append(ate_rmse(e, g))
        ce = -np.einsum("tij,ti->tj", e[:, :3, :3], e[:, :3, 3])
        cg = -np.einsum("tij,ti->tj", g[:, :3, :3], g[:, :3, 3])
        X, Y = ce - ce.mean(0), cg - cg.mean(0)
        var = (X * X).sum() / len(X)
        S = Y.T @ X / len(X)
        U, D, Vt = np.linalg.svd(S)
        W = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            W[2, 2] = -1.0
        scales.append(float(np.trace(np.diag(D) @ W) / max(var, 1e-18)))
    n_tmpl = sum(1 for m in sys_._metrics if m["template"])
    sc = np.array(scales)
    regs = [m.get("reg_scale") for m in sys_._metrics
            if m.get("template") and m.get("reg_scale") is not None]
    print(
        f"{label:28s} ATE {ate:.4f}  segATE " +
        "/".join(f"{s:.3f}" for s in segs) +
        f"  segSCALE " + "/".join(f"{s:.2f}" for s in scales) +
        f"  scale-spread {sc.max()/max(sc.min(),1e-9):.3f}" +
        f"  templates {n_tmpl}  wall {wall:.0f}s",
        flush=True,
    )
    if regs:
        print("   reg_scale/swap: " + " ".join(f"{r:.3f}" for r in regs),
              flush=True)
    return ate


VARIANTS = {
    "base": {},
    "polish": dict(mapping=dict(consistency_polish=1.0)),
    "noext": dict(mapping=dict(sfn_tilt_extension=0.0, sfn_flat_extension=0.0)),
    "flat": dict(mapping=dict(sfn_tilt_extension=0.0)),
    "polish-flat": dict(mapping=dict(consistency_polish=1.0,
                                     sfn_tilt_extension=0.0)),
    "polish-noext": dict(mapping=dict(consistency_polish=1.0,
                                      sfn_tilt_extension=0.0,
                                      sfn_flat_extension=0.0)),
    "polish3": dict(mapping=dict(consistency_polish=3.0)),
}

if __name__ == "__main__":
    for which in sys.argv[1:] or ["base"]:
        s, q, w = run(**{k: dict(v) for k, v in VARIANTS[which].items()})
        report(which, s, q, w)
