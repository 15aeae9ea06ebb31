"""Lightweight tracing/profiling (SURVEY aux 1: the reference has none —
only ad-hoc cv::getTickCount prints, GroundTruthFrame.cc:196-214).

- ``stage(name)``: context-manager timer accumulating per-stage wall time
  (synchronizes on device results when given).
- ``report()``: per-stage totals/counts/averages.
- ``device_trace(dir)``: wraps jax.profiler.trace for TensorBoard traces.

Enable with ``DEFSLAM_PROFILE=1`` (timers are no-ops otherwise — the hot
path must not pay for observability by default).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax

_ENABLED = os.environ.get("DEFSLAM_PROFILE", "0") not in ("0", "", "false")
_STAGES: dict[str, list[float]] = defaultdict(list)


def enabled() -> bool:
    return _ENABLED


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


@contextlib.contextmanager
def stage(name: str, sync=None):
    """Time a stage; pass a jax array/pytree as `sync` to block on it."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        _STAGES[name].append(time.perf_counter() - t0)


def report(reset: bool = False) -> dict[str, dict]:
    out = {}
    for name, times in sorted(_STAGES.items()):
        out[name] = dict(
            count=len(times),
            total_s=sum(times),
            mean_ms=1000.0 * sum(times) / max(len(times), 1),
            max_ms=1000.0 * max(times),
        )
    if reset:
        _STAGES.clear()
    return out


def print_report(reset: bool = False):
    rows = report(reset)
    if not rows:
        return
    width = max(len(n) for n in rows)
    print(f"{'stage':<{width}}  count   mean ms    max ms   total s")
    for name, r in rows.items():
        print(
            f"{name:<{width}}  {r['count']:5d}  {r['mean_ms']:8.1f}"
            f"  {r['max_ms']:8.1f}  {r['total_s']:8.2f}"
        )


@contextlib.contextmanager
def device_trace(logdir: str):
    """TensorBoard device trace around a region (jax.profiler)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
