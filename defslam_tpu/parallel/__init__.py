"""Multi-chip / multi-host execution.

- :mod:`defslam_tpu.parallel.sharded` — mesh construction and the sharded
  kernels (pair-sharded warp fits, point-sharded normal solves,
  observation-sharded SfT with psum'd normal equations).
- :func:`init_distributed` — multi-host plumbing: one JAX process per host,
  ICI inside a host group, DCN between hosts (SURVEY 5.8; the reference has
  no distributed backend at all — its cross-component communication is
  mutex-protected shared memory, System.cc:140-169).
"""

from __future__ import annotations

_DISTRIBUTED_READY = False


def init_distributed(cfg) -> bool:
    """Initialize jax.distributed from Config.parallel when a coordinator
    address is configured.  Idempotent; returns True when the multi-host
    runtime is (already) up, False for single-process runs.

    Usage on an N-host pod slice: start the same program on every host with
    ``parallel.coordinator = "host0:1234"``, ``num_processes = N`` and a
    distinct ``process_id``; ``jax.devices()`` then spans the slice and the
    "dp" mesh axis rides ICI within hosts and DCN across them.
    """
    global _DISTRIBUTED_READY
    pc = cfg.parallel
    if not pc.coordinator:
        return False
    if _DISTRIBUTED_READY:
        return True
    import jax

    jax.distributed.initialize(
        coordinator_address=pc.coordinator,
        num_processes=pc.num_processes,
        process_id=pc.process_id,
    )
    _DISTRIBUTED_READY = True
    return True
