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
    "training_args": {"iters": 50, "num_keyframe": 5, "coarse_frac": 0.5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 256, "side": 3, "visible_capacity": 1 << 16,
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
import vings_mono_tpu.mapper.train as mt
orig_run = mm.GaussianMapper.run
orig_refresh = mm.GaussianMapper._refresh_binned
orig_train = mt.train_loop
orig_addf = mm.add_frame
orig_storage = mm.storage_control


def timed_refresh(self, *a, **k):
    sfx = k.get("sfx", "")
    cached = getattr(self, "_binned" + sfx)
    with sub(f"map.refresh_binned{sfx}"):
        r = orig_refresh(self, *a, **k)
        jax.block_until_ready(r.pair_idx)
    kw = k.get("bin_kwargs") or self.bin_kwargs
    print(f"  refresh{sfx}: cache={'hit' if cached is not None else 'MISS'} "
          f"p_cap={kw['p_cap']} n_pairs={int(r.n_pairs.max())} "
          f"overflow={bool(r.overflow.any())}", flush=True)
    return r


def timed_train(*a, **k):
    with sub(f"map.train_loop[{k.get('iters')}]"
             f"@{k.get('height')}x{k.get('width')}"):
        r = orig_train(*a, **k)
        jax.block_until_ready(r[0].xyz)
        return r


def timed_addf(*a, **k):
    with sub("map.add_frame"):
        r = orig_addf(*a, **k)
        jax.block_until_ready(r[0].xyz)
        return r


def timed_storage(*a, **k):
    with sub("map.storage_control"):
        r = orig_storage(*a, **k)
        jax.block_until_ready(r[0].xyz)
        return r


orig_pack = mm.GaussianMapper._pack_batch


def timed_pack(self, viz_out):
    with sub("map.pack_batch"):
        r = orig_pack(self, viz_out)
        jax.block_until_ready(r.images)
        return r


mm.GaussianMapper._pack_batch = timed_pack
mm.GaussianMapper._refresh_binned = timed_refresh
mm.train_loop = timed_train
mm.add_frame = timed_addf
mm.storage_control = timed_storage

WARM = 14
for k in range(30):
    if k == WARM:   # drop compile-dominated warmup from the report
        timer.reset() if hasattr(timer, "reset") else None
        timer.__init__()
        sub.__init__()
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
    ps = mapper.last_metrics.get("psnr")
    print(f"frame {k}: {dt:.2f}s psnr={ps if ps is None else round(ps, 2)}",
          flush=True)

print("== totals ==")
print(timer.report())
print(sub.report())
