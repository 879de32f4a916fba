"""Stage timing — replaces the reference's CUDA-event Wandber.log_time
(gaussian/wandb_utils.py:30-45) with host wall-clock around blocked device
work plus optional jax.profiler traces."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        lines = []
        for k in sorted(self.totals):
            n = max(self.counts[k], 1)
            lines.append(f"{k}: total {self.totals[k]:.2f}s, "
                         f"n={self.counts[k]}, "
                         f"avg {1e3 * self.totals[k] / n:.1f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(dirname):
    """jax.profiler trace context (view in TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path=None):
    """Persistent XLA compile cache for bench/driver runs (tests enable it
    in conftest; bench scripts call this). Saves the multi-minute tracker +
    mapper compiles across runs when the backend supports serialization."""
    import os
    import jax
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
