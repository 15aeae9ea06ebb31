"""Per-frame wall-time breakdown of the bench loop."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from defslam_tpu.config import CapacityConfig, Config, OrbConfig, SfTConfig, TrackingConfig
from defslam_tpu.io.synthetic import make_sequence
from defslam_tpu.system import System

seq = make_sequence(n_frames=24, height=480, width=640, max_amp=0.08)
cfg = Config(
    camera=seq.camera,
    orb=OrbConfig(n_features=1200, n_levels=6, max_keypoints=1536),
    sft=SfTConfig(lm_iterations=50),
    tracking=TrackingConfig(keyframe_period=10),
    capacity=CapacityConfig(max_map_points=4096, max_keyframes=16),
)
sys_ = System(cfg)
frames_dev = [jax.device_put(f.astype(np.uint8)) for f in seq.frames]
jax.block_until_ready(frames_dev)
for t in range(12):
    sys_.track_monocular(frames_dev[t], timestamp=float(t))
sys_.flush()
print("--- measured frames ---", flush=True)
for t in range(12, 24):
    t0 = time.perf_counter()
    sys_.track_monocular(frames_dev[t], timestamp=float(t))
    print(f"frame {t}: {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)
sys_.flush()
