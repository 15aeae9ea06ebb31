"""Sub-stage wall-time breakdown of the keyframe mapping step + steady frame."""
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
from defslam_tpu.mapstore import state as store

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

def bench(label, fn, n=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return out

img = frames_dev[19]
c = cfg
# ---------------- steady frame pieces
feats = bench("extract_features", lambda: extract_features(img, c))
matches = bench("match_points_to_frame", lambda: tracker.match_points_to_frame(
    sys_.points, sys_.pose, sys_.K, feats, c))
res = bench("sft_track", lambda: tracker.sft_track(
    sys_.points, matches, feats, sys_.template, sys_.pose, sys_.K, c))
bench("reposition", lambda: tracker.reposition_points(sys_.points, res.nodes, c))
bench("track_frame fused", lambda: tracker.track_frame(
    img, sys_.points, sys_.pose, sys_.prev_pose, sys_.template, sys_.K, c))

# ---------------- keyframe mapping pieces
slot = sys_._free_kf_slot()
slot_j = jnp.asarray(slot, jnp.int32)
kfs0, pts0 = sys_.kfs, sys_.points
new_kfs, new_n_obs = store.insert_keyframe_from_matches(
    jax.tree.map(lambda a: a.copy(), kfs0), pts0.n_obs, slot_j,
    sys_.pose, feats, matches.kp_of_point, res.inlier, sys_.K,
    jnp.asarray(99, jnp.int32), pts0.xyz)
jax.block_until_ready(new_kfs)
sys_.kfs = new_kfs
sys_.points = pts0._replace(n_obs=new_n_obs)

cp = bench("covis_pairs", lambda: mapper.covis_pairs(
    sys_.kfs.point_id, sys_.kfs.retina, sys_.kfs.valid,
    sys_.points.valid, slot_j, c))
batch = mapper.WarpBatch(uv1=cp.uv1, uv2=cp.uv2, mask=cp.mask, pair_valid=cp.pair_valid)
out_w = bench("fit_warps", lambda: mapper.fit_warps(batch, sys_.dom, sys_.bend_warp, c))
dps, ctrls = out_w
bench("densify_matches", lambda: mapper.densify_matches(
    ctrls, sys_.kfs.retina[slot_j], sys_.kfs.kp_valid[slot_j], sys_.kfs.desc[slot_j],
    sys_.kfs.retina[cp.pair_kf], sys_.kfs.kp_valid[cp.pair_kf], sys_.kfs.desc[cp.pair_kf],
    sys_.dom, cp.pair_valid, c))
p_cap = c.capacity.max_map_points
obs, _obs_dropped = bench("accumulate_obs_device", lambda: mapper.accumulate_obs_device(
    cp.pid_table, dps.mask, cp.uv1, dps.warped, dps.J12, dps.Huu, dps.Hvv,
    p_cap, mapper.OBS_CAP))
nres = bench("solve_normals (compact)", lambda: mapper.solve_normals_compact(
    obs, jnp.zeros((p_cap, 2)), min(c.orb.max_keypoints, p_cap)))
pid_row = sys_.kfs.point_id[slot]
solved_ok = mapper.normal_reliability_gate(nres, c.regularizer.reliability)
bench("write+propagate normals", lambda: mapper.propagate_normals(
    *mapper.write_normals(sys_.kfs.norm_k, sys_.kfs.norm_valid, slot_j, pid_row,
                          nres.k, solved_ok)[:2], cp, dps, nres.k, solved_ok))
bench("exploration+select", lambda: (
    mapper.exploration_count(sys_.kfs.xy[slot], sys_.kfs.kp_valid[slot], pid_row, c),
    mapper.select_ref_keyframe(pid_row, sys_.points.ref_kf, sys_.points.valid,
                               sys_.kfs.valid, slot_j)))
# retemplate pieces
retina = sys_.kfs.retina[slot]
res_sfn = bench("integrate_surface (SfN)", lambda: mapper.integrate_surface(
    retina, sys_.kfs.norm_k[slot], sys_.kfs.norm_valid[slot], sys_.dom, sys_.bend_sfn, c))
pose = sys_.kfs.pose[slot]
out_rp = bench("registration_pairs+register", lambda: mapper.register_surface(
    *mapper.registration_pairs(res_sfn.xyz, pid_row, sys_.kfs.kp_xyz[slot],
        sys_.kfs.kp_xyz_valid[slot], sys_.kfs.norm_valid[slot],
        sys_.points.valid, sys_.points.facet, pose)[:3], c))
reg = out_rp
regen = bench("regen_template", lambda: mapper.regen_template(
    res_sfn.ctrl, reg, pose, retina, sys_.dom, c))
bench("rebuild_points", lambda: mapper.rebuild_points(
    jax.tree.map(lambda a: a.copy(), sys_.points), regen, pose, sys_.K, pid_row,
    sys_.kfs.kp_valid[slot], sys_.kfs.desc[slot], sys_.kfs.angle[slot],
    slot_j, sys_.dom, c)[0])
# re-anchor
matches2 = tracker.match_points_to_frame(sys_.points, sys_.pose, sys_.K, feats, c)
bench("re-anchor sft (reg_temp=0)", lambda: tracker.sft_track(
    sys_.points, matches2, feats, sys_.template, sys_.pose, sys_.K, c, reg_temp=0.0))

# the fused single-dispatch keyframe step (what the System actually runs)
bench("keyframe_step FUSED", lambda: mapper.keyframe_step(
    jax.tree.map(lambda a: a.copy(), kfs0),
    jax.tree.map(lambda a: a.copy(), pts0),
    sys_.template, sys_.pose, feats, matches.kp_of_point, res.inlier,
    sys_.K, sys_.dom, sys_.bend_warp, sys_.bend_sfn,
    jnp.asarray(sys_.template_ref_kf, jnp.int32),
    jnp.asarray(sys_.kf_counter, jnp.int32),
    jnp.asarray(99, jnp.int32), c))
