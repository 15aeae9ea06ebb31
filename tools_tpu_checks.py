"""Hardware-only sanity checks, run manually on the real TPU chip
(the test suite forces the CPU backend; these paths differ on TPU).

1. pose_opt.relocalize drives ops.matching.masked_hamming -> the Pallas
   Hamming kernel UNDER jax.lax.map (the round-2 VERDICT flagged this
   combination as untested on hardware).
2. hamming_auto (Pallas) vs the XLA path: identical distances.

Usage: python tools_tpu_checks.py   (needs the axon TPU tunnel up)
"""
import numpy as np
import jax, jax.numpy as jnp
from defslam_tpu.config import CapacityConfig, Config, OrbConfig
from defslam_tpu.frontend import Features
from defslam_tpu.mapstore import state as store
from defslam_tpu.tracking import pose_opt

print("backend:", jax.default_backend())
cfg = Config(orb=OrbConfig(max_keypoints=256),
             capacity=CapacityConfig(max_map_points=512, max_keyframes=8))
rng = np.random.default_rng(0)
K = jnp.asarray(cfg.camera.K)
k_cap = 256
desc = rng.integers(0, 2**32, (k_cap, 8), dtype=np.uint32)
feats = Features(
    xy=jnp.asarray(rng.uniform(0, 600, (k_cap, 2)), jnp.float32),
    response=jnp.ones(k_cap), level=jnp.zeros(k_cap, jnp.int32),
    angle=jnp.zeros(k_cap), desc=jnp.asarray(desc),
    valid=jnp.ones(k_cap, bool),
)
kfs = store.empty_keyframes(cfg)
pts = store.empty_points(cfg)
# one valid keyframe observing points with the same descriptors
pid = np.arange(k_cap, dtype=np.int32)
kfs = kfs._replace(
    valid=kfs.valid.at[0].set(True),
    desc=kfs.desc.at[0].set(jnp.asarray(desc)),
    kp_valid=kfs.kp_valid.at[0].set(True),
    point_id=kfs.point_id.at[0].set(jnp.asarray(pid)),
    pose=kfs.pose.at[0].set(jnp.eye(4)),
)
xyz = np.zeros((512, 3), np.float32)
from defslam_tpu.geometry import camera as cam
xyz[:k_cap] = np.asarray(cam.backproject(K, feats.xy, jnp.full(k_cap, 2.0)))
valid = np.zeros(512, bool); valid[:k_cap] = True
pts = pts._replace(xyz=jnp.asarray(xyz), valid=jnp.asarray(valid))
ok, T, n = pose_opt.relocalize(feats, kfs, pts, K, cfg)
print("ok:", bool(ok), "inliers:", int(n))
assert bool(ok) and int(n) > 200
print("relocalize on TPU: PASS")

# ---- Pallas vs XLA Hamming parity on hardware
from defslam_tpu.ops import matching

da = jnp.asarray(rng.integers(0, 2**32, (512, 8), dtype=np.uint32))
db = jnp.asarray(rng.integers(0, 2**32, (384, 8), dtype=np.uint32))
d_pallas = np.asarray(matching.hamming_auto(da, db))
d_xla = np.asarray(matching.hamming_matrix(da, db))
assert (d_pallas == d_xla).all()
print("pallas/XLA hamming parity on TPU: PASS")
