"""Device-time (RTT-amortized) measurement of the split keyframe chain.

Dispatches each stage N times back-to-back and blocks once, so the axon
tunnel RTT (~15-30 ms) amortizes: wall/N ~= device time per call."""
import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from defslam_tpu.config import CapacityConfig, Config, OrbConfig, SfTConfig, TrackingConfig
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System
from defslam_tpu.tracking import tracker
from defslam_tpu.mapping import mapper
from defslam_tpu.frontend import extract_features

seq = make_sequence(n_frames=24, height=480, width=640, max_amp=0.08)
cfg = Config(
    camera=seq.camera,
    orb=OrbConfig(n_features=1200, n_levels=6, max_keypoints=1536),
    sft=SfTConfig(lm_iterations=50),
    tracking=TrackingConfig(keyframe_period=10, pipelined=False),
    capacity=CapacityConfig(max_map_points=4096, max_keyframes=16),
)
sys_ = System(cfg)
frames_dev = [jax.device_put(f.astype(np.uint8)) for f in seq.frames]
jax.block_until_ready(frames_dev)
for t in range(19):
    sys_.track_monocular(frames_dev[t], timestamp=float(t))
sys_.flush()

img = frames_dev[19]
c = cfg
feats = extract_features(img, c)
matches = tracker.match_points_to_frame(sys_.points, sys_.pose, sys_.K, feats, c)
res = tracker.sft_track(sys_.points, matches, feats, sys_.template, sys_.pose, sys_.K, c)
jax.block_until_ready(res)


def bench_amortized(label, fn, n=8):
    fn()
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:32s} {dt:8.2f} ms/call (amortized x{n})", flush=True)


kfs0 = jax.tree.map(lambda a: a.copy(), sys_.kfs)
pts0 = jax.tree.map(lambda a: a.copy(), sys_.points)
jax.block_until_ready((kfs0, pts0))

fid = jnp.asarray(99, jnp.int32)
tref = jnp.asarray(sys_.template_ref_kf, jnp.int32)
kctr = jnp.asarray(sys_.kf_counter, jnp.int32)


def run_a():
    return mapper.keyframe_step_a(
        jax.tree.map(lambda a: a.copy(), kfs0),
        jax.tree.map(lambda a: a.copy(), pts0),
        sys_.pose, feats, matches.kp_of_point, res.inlier,
        sys_.K, sys_.dom, sys_.bend_warp, tref, fid, c)


bench_amortized("tree copies only", lambda: (
    jax.tree.map(lambda a: a.copy(), kfs0),
    jax.tree.map(lambda a: a.copy(), pts0)))
bench_amortized("keyframe_step_a", run_a)
kfs_a, pts_a, carry = run_a()
jax.block_until_ready((kfs_a, pts_a, carry))
kfs_a0 = jax.tree.map(lambda a: a.copy(), kfs_a)
pts_a0 = jax.tree.map(lambda a: a.copy(), pts_a)
jax.block_until_ready((kfs_a0, pts_a0))


def run_b():
    return mapper.keyframe_step_b(
        kfs_a0, pts_a0,
        sys_.template, sys_.pose, feats, carry, sys_.K, sys_.dom,
        sys_.bend_sfn, kctr, c)


bench_amortized("keyframe_step_b", run_b)


def run_frame():
    return tracker.track_frame(
        img, pts0, sys_.pose, sys_.prev_pose, sys_.template, sys_.K, c)


bench_amortized("track_frame (steady)", run_frame)

# sub-pieces of A, amortized
cp = mapper.covis_pairs(kfs_a.point_id, kfs_a.retina, kfs_a.valid,
                        pts_a.valid, carry.slot, c)
jax.block_until_ready(cp)
batch = mapper.WarpBatch(uv1=cp.uv1, uv2=cp.uv2, mask=cp.mask,
                         pair_valid=cp.pair_valid)
bench_amortized("  covis_pairs", lambda: mapper.covis_pairs(
    kfs_a.point_id, kfs_a.retina, kfs_a.valid, pts_a.valid, carry.slot, c))
bench_amortized("  fit_warps", lambda: mapper.fit_warps(
    batch, sys_.dom, sys_.bend_warp, c))
dps, ctrls = mapper.fit_warps(batch, sys_.dom, sys_.bend_warp, c)
jax.block_until_ready((dps, ctrls))
bench_amortized("  densify_matches", lambda: mapper.densify_matches(
    ctrls, kfs_a.retina[carry.slot], kfs_a.kp_valid[carry.slot],
    kfs_a.desc[carry.slot], kfs_a.retina[cp.pair_kf],
    kfs_a.kp_valid[cp.pair_kf], kfs_a.desc[cp.pair_kf],
    sys_.dom, cp.pair_valid, c))
p_cap = c.capacity.max_map_points
obs, _ = mapper.accumulate_obs_device(
    cp.pid_table, dps.mask, cp.uv1, dps.warped, dps.J12, dps.Huu, dps.Hvv,
    p_cap, mapper.OBS_CAP)
jax.block_until_ready(obs)
bench_amortized("  accumulate_obs_device", lambda: mapper.accumulate_obs_device(
    cp.pid_table, dps.mask, cp.uv1, dps.warped, dps.J12, dps.Huu, dps.Hvv,
    p_cap, mapper.OBS_CAP))
from defslam_tpu.mapping import normals as nrm
from defslam_tpu.ops import matching as _matching
import functools


@functools.partial(jax.jit, static_argnames=("capacity", "num_iters", "unroll"))
def solve_compact_unroll(obs, k_init, capacity, num_iters, unroll):
    has = jnp.any(obs.mask, axis=1)
    sel, sel_ok, _ = _matching.compact_select(has, capacity)
    obs_c = jax.tree.map(lambda a: a[sel], obs)
    obs_c = obs_c._replace(mask=obs_c.mask & sel_ok[:, None])
    return nrm.solve_k1k2(obs_c, k_init[sel], num_iters=num_iters,
                          unroll=unroll)


for it in (12, 8, 6):
    for un in (0, 4, 12):
        bench_amortized(
            f"  solve_normals it={it} unroll={un}",
            lambda it=it, un=un: solve_compact_unroll(
                obs, pts_a.norm_k0, min(c.orb.max_keypoints, p_cap), it, un))
retina = kfs_a.retina[carry.slot]
bench_amortized("  integrate_surface", lambda: mapper.integrate_surface(
    retina, kfs_a.norm_k[carry.slot], kfs_a.norm_valid[carry.slot],
    sys_.dom, sys_.bend_sfn, c))
