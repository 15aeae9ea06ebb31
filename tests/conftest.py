"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (shard_map/pjit over jax.sharding.Mesh) is validated on
host CPU with XLA's virtual-device flag — the standard JAX way to test pod
topologies without hardware.

Note: the machine's sitecustomize forces the experimental 'axon' TPU-tunnel
platform via JAX_PLATFORMS; per-op dispatch over that tunnel is far too slow
for a test suite, so we override it through jax.config (env vars alone are
not enough).
"""

import os

# DEFSLAM_TEST_PLATFORM=tpu opts selected runs (e.g. the full-scale
# long-haul stress e2e, DEFSLAM_STRESS_FULL=1) onto the real chip; the
# default stays the virtual 8-device CPU mesh.
_PLATFORM = os.environ.get("DEFSLAM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if _PLATFORM == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the fused keyframe kernel is a large graph
# compiled once per test config — cache hits make suite reruns fast.
# min_compile_time 0 caches EVERY compile: the XLA CPU compiler has
# segfaulted under heavy cold-cache compile load (see
# .claude/skills/verify/SKILL.md), and a cached entry skips the compiler
# entirely on the next run.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "multihost: spawns two jax.distributed processes over localhost",
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop compiled executables after every test module.

    The XLA CPU compiler segfaults once enough compiled programs have
    accumulated in one process (a full cold suite crashes deterministically
    ~78 tests in, while every half-suite subset passes) — bounding the live
    set avoids whatever code/constant-space limit it is hitting.  The
    persistent disk cache (min_compile_time 0 above) makes the re-loads
    cheap."""
    yield
    jax.clear_caches()
