"""Device-time attribution for a full mapper.run keyframe: traces N
steady-state keyframes and sums device time per compiled program
(jit_train_loop, jit_add_frame, jit_bin_surfels, ...), dividing by N.
Finds where the non-train-loop mapper time goes."""

import glob
import gzip
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.middleware import judge_and_package
from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.utils.config import load_config
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
               "chunk": 128, "side": 3, "visible_capacity": 1 << 16,
               "kf_capacity": 8, "adaptive_iters": 23.0,
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
    rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    return {"timestamp": float(k), "rgb": rgb8,
            "intrinsic": np.asarray([220.0, 220.0, W / 2, H / 2],
                                    np.float32)}


n_warm, n_meas = 12, 6
vizzes = []
for k in range(n_warm + n_meas):
    tracker.track(frame(k))
    viz = judge_and_package(tracker, cfg)
    if viz is not None:
        if k < n_warm:
            mapper.run(viz)
        else:
            vizzes.append(viz)
jax.block_until_ready(mapper.state.xyz)
mapper.freeze_buckets()

import time
os.system("rm -rf /tmp/map_trace")
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/map_trace"):
    for v in vizzes:
        mapper.run(v)
    jax.block_until_ready(mapper.state.xyz)
wall = time.perf_counter() - t0
print(f"wall: {wall*1e3/len(vizzes):.1f} ms/keyframe ({len(vizzes)} kf)")

files = glob.glob("/tmp/map_trace/**/*.trace.json.gz", recursive=True)
with gzip.open(files[0], "rt") as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
pn = {e["pid"]: e["args"].get("name", "") for e in ev
      if e.get("ph") == "M" and e.get("name") == "process_name"
      and "args" in e}
dev = {p for p, n in pn.items() if "TPU" in n or "/device" in n.lower()}
tot = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev:
        name = e["name"]
        tot[name] = tot.get(name, 0) + e.get("dur", 0) / 1e3
rows = sorted(tot.items(), key=lambda kv: -kv[1])
print(f"{'ms/kf':>9}  name")
acc = 0.0
for name, ms in rows[:40]:
    print(f"{ms/len(vizzes):9.2f}  {name}")
