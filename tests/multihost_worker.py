"""Worker process for the multi-host smoke test (not collected by pytest).

Each of two processes owns 4 virtual CPU devices; ``jax.distributed``
connects them through the coordinator (the DCN path of SURVEY 5.8).  The
sharded SfT solve then psums its normal-equation blocks across the process
boundary.  Usage: ``python multihost_worker.py <process_id> <port> <out>``.
"""

import os
import sys


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # the production multi-host entry (parallel.init_distributed wraps this
    # same call from Config.parallel.coordinator)
    from defslam_tpu.config import Config, ParallelConfig, SfTConfig
    from defslam_tpu.parallel import init_distributed

    cfg = Config(
        sft=SfTConfig(lm_iterations=5),
        parallel=ParallelConfig(
            enabled=True,
            coordinator=f"127.0.0.1:{port}",
            num_processes=2,
            process_id=pid,
        ),
    )
    init_distributed(cfg)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from defslam_tpu.parallel import sharded

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _toy_sft_data

    mesh = sharded.make_mesh()  # all 8 global devices
    data = _toy_sft_data(n_obs=64)
    res = sharded.sft_solve_sharded(mesh, data, cfg)
    T = np.asarray(res.T)  # replicated output: addressable on every process
    nodes = np.asarray(res.nodes)
    assert np.isfinite(T).all() and np.isfinite(nodes).all()
    np.savez(os.path.join(out, f"proc{pid}.npz"), T=T, nodes=nodes)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
