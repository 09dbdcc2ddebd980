"""Profiling and throughput instrumentation.

The reference only prints per-iteration wall clock (train.py:199,218); here we
expose jax.profiler traces plus a throughput meter reporting the north-star
rays/sec/chip (SURVEY.md §5 tracing).
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Tracks items/sec (rays, attack iters) with warmup exclusion."""

    def __init__(self, warmup=1):
        self.warmup = warmup
        self.count = 0
        self.items = 0
        self.t0 = None

    def step(self, n_items):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
            self.items = 0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def rate(self):
        if self.t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.t0)


def device_memory_stats():
    """Per-device HBM stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = None
    return out
