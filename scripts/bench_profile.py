"""Instrumented variant of bench.py: per-stage wall times to find the
bottleneck on the real chip."""

import time

import numpy as np
import jax

from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.middleware import judge_and_package
from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.utils.profiling import StageTimer
from vings_mono_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

H, W = 240, 432
cfg = load_config(overrides={
    "mode": "vo",
    "frontend": {
        "buffer": 48, "warm_up": 8, "filter_thresh": -1.0,
        "keyframe_thresh": 0.0, "frontend_thresh": 1e9,
        "frontend_window": 12, "frontend_radius": 2, "frontend_nms": 1,
        "max_factors": 48, "edge_capacity": 64,
        "inactive_capacity": 128, "ba_window": 16,
        "iters1": 2, "iters2": 1, "active_window": 12, "max_age": 12,
        "rollup_at": 40, "rollup_n": 16, "save_buffer": 256,
    },
    "training_args": {"iters": 50, "num_keyframe": 5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 128, "side": 3, "visible_capacity": 1 << 16,
               "kf_capacity": 8,
               "points_per_frame": 20000, "points_first_frame": 30000},
})

tracker = Tracker(cfg, H, W)
mapper = GaussianMapper(cfg)
ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")


def frame(k):
    img = 0.5 + 0.3 * np.sin(0.05 * (xs + 4.0 * k)) * \
        np.cos(0.04 * (ys + 2.0 * k)) + 0.2 * np.sin(0.13 * xs + 0.1 * k)
    rgb = np.stack([img, img * 0.8, np.abs(np.sin(0.02 * xs + 0.2 * k))],
                   -1).astype(np.float32)
    return {"timestamp": float(k), "rgb": np.clip(rgb, 0, 1),
            "intrinsic": np.asarray([220.0, 220.0, W / 2, H / 2],
                                    np.float32)}


timer = StageTimer()
sub = StageTimer()
# monkeypatch fine-grained stages
import vings_mono_tpu.tracker.graph as graph_mod
orig_update = graph_mod.CovisibleGraph.update
orig_addprox = graph_mod.CovisibleGraph.add_proximity_factors
orig_add = graph_mod.CovisibleGraph.add_factors


def timed_update(self, *a, **k):
    with sub("graph.update"):
        r = orig_update(self, *a, **k)
        jax.block_until_ready(self.video.bufs.poses)
        return r


def timed_addprox(self, *a, **k):
    with sub("graph.add_proximity"):
        return orig_addprox(self, *a, **k)


def timed_add(self, *a, **k):
    with sub("graph.add_factors"):
        r = orig_add(self, *a, **k)
        jax.block_until_ready(self.edges.corr1)
        return r


graph_mod.CovisibleGraph.update = timed_update
graph_mod.CovisibleGraph.add_proximity_factors = timed_addprox
graph_mod.CovisibleGraph.add_factors = timed_add

import vings_mono_tpu.mapper.mapper as mm
orig_run = mm.GaussianMapper.run
orig_bin = None

for k in range(28):
    t0 = time.perf_counter()
    with timer("track"):
        tracker.track(frame(k))
        jax.block_until_ready(tracker.video.bufs.poses)
    with timer("package"):
        viz = judge_and_package(tracker, cfg)
    if viz is not None:
        with timer("map"):
            mapper.run(viz)
            jax.block_until_ready(mapper.state.xyz)
    dt = time.perf_counter() - t0
    print(f"frame {k}: {dt:.2f}s", flush=True)

print("== totals ==")
print(timer.report())
print(sub.report())
