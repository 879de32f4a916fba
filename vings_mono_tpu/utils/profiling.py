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


TPU_V5E_PEAK_FLOPS = 197e12  # bf16 peak per chip; the honest denominator
# even for f32-heavy programs (MXU runs f32 through bf16 passes)


def device_events(trace_dir):
    """Parse a jax.profiler trace dir -> {event_name: (total_ms, count)}
    summed over TPU device tracks. Wall-clock timeit through the axon
    tunnel is dispatch-latency-dominated; traces are the only trustworthy
    device timing on this setup."""
    import glob
    import gzip
    import json
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return {}
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev = {p for p, n in pid_names.items()
           if "TPU" in n or "/device" in n.lower()}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        ms, n = agg.get(e["name"], (0.0, 0))
        agg[e["name"]] = (ms + e.get("dur", 0) / 1e3, n + 1)
    return agg


def compiled_flops(jitfn, *args, **kwargs):
    """FLOP count of the compiled program via XLA cost analysis (0 when the
    backend doesn't report)."""
    ca = jitfn.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


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
