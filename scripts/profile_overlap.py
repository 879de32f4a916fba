"""Device-side profile of the OVERLAPPED bench loop (tracker || mapper).

Replays bench.py's measured section under jax.profiler.trace and reports,
from the TPU device track:
  * wall time of the section,
  * device BUSY time (union of op intervals — no double counting across
    overlapping trace rows),
  * the busy/idle split per frame, and
  * device time attributed per program (jit_train_loop, _fused_update, ...).

This separates the two perf regimes: device-bound (cut kernel/program time)
vs bubble-bound (cut host syncs / tunnel latency).

Run: timeout 1800 python scripts/profile_overlap.py
"""

import glob
import gzip
import json
import os
import queue
import re
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from vings_mono_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()

from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.middleware import judge_and_package
from vings_mono_tpu.utils.config import load_config

H, W = 240, 432
# identical to bench.py's headline config
cfg = load_config(overrides={
    "mode": "vo",
    "frontend": {
        "buffer": 48, "warm_up": 8, "filter_thresh": -1.0,
        "keyframe_thresh": 0.0, "frontend_thresh": 1e9,
        "frontend_window": 12, "frontend_radius": 2, "frontend_nms": 1,
        "max_factors": 48, "edge_capacity": 48,
        "inactive_capacity": 64, "ba_window": 16,
        "iters1": 2, "iters2": 1, "active_window": 12, "max_age": 12,
        "rollup_at": 24, "rollup_n": 16, "save_buffer": 256,
    },
    "training_args": {"iters": 50, "num_keyframe": 5, "coarse_frac": 0.5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 256, "side": 3, "visible_capacity": 1 << 16,
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


n_warm, n_meas = 12, int(os.environ.get("PO_NMEAS", 12))
for k in range(n_warm):
    tracker.track(frame(k))
    viz = judge_and_package(tracker, cfg)
    if viz is not None:
        mapper.run(viz)
jax.block_until_ready(tracker.video.bufs.poses)
jax.block_until_ready(mapper.state.xyz)
mapper.freeze_buckets()
for k in range(n_warm, n_warm + 2):
    tracker.track(frame(k))
    viz2 = judge_and_package(tracker, cfg)
    if viz2 is not None:
        viz = viz2
        mapper.run(viz2)
n_warm += 2
jax.block_until_ready(tracker.video.bufs.poses)
jax.block_until_ready(mapper.state.xyz)
if viz is not None and mapper._metrics_dev is not None:
    vz = dict(viz)
    vz["viz_out_idx_to_f_idx"] = \
        np.asarray(vz["viz_out_idx_to_f_idx"]) + 1000.0
    mapper._metrics_dev = dict(mapper._metrics_dev, psnr=jnp.asarray(99.0))
    mapper._drain_stats()
    mapper._pending_stats = []
    mapper._last_psnr_host = 99.0
    mapper.run(vz)
    jax.block_until_ready(mapper.state.xyz)

frames = {k: frame(k) for k in range(n_warm, n_warm + 2 * n_meas)}


def overlapped(lo, hi):
    q = queue.Queue(maxsize=4)

    def map_worker():
        while True:
            v = q.get()
            if v is None:
                return
            mapper.run(v)

    th = threading.Thread(target=map_worker)
    th.start()
    t0 = time.perf_counter()
    for k in range(lo, hi):
        tracker.track(frames[k])
        viz = judge_and_package(tracker, cfg)
        if viz is not None:
            q.put(viz)
    q.put(None)
    th.join()
    jax.block_until_ready(tracker.video.bufs.poses)
    jax.block_until_ready(mapper.state.xyz)
    return time.perf_counter() - t0


# throwaway overlapped pass (late compiles)
overlapped(n_warm, n_warm + n_meas)
n_warm += n_meas

trace_dir = "/tmp/overlap_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    dt = overlapped(n_warm, n_warm + n_meas)
print(f"measured: {n_meas / dt:.3f} fps ({dt * 1e3 / n_meas:.0f} ms/frame)",
      flush=True)

# ---- parse ---------------------------------------------------------------
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
assert files, "no trace produced"
events = []
for fp in files:
    with gzip.open(fp, "rt") as f:
        events.extend(json.load(f)["traceEvents"])

pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"
             and "args" in e}
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
print("device tracks:", {p: pid_names[p] for p in dev_pids}, flush=True)

ivals = []           # (start, end) us on device
per_prog = {}        # program -> summed ms (from the XLA Modules track if
                     # present, else op events grouped by name prefix)
op_ms = {}
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    ts, dur = e.get("ts", 0), e.get("dur", 0)
    name = e.get("name", "?")
    ivals.append((ts, ts + dur))
    # attribute ops to programs: fusion names look like
    # "fusion.123" etc; the enclosing module name is in args (run_id /
    # tf_op) on some runtimes — fall back to grouping by trace row name
    prog = None
    a = e.get("args") or {}
    for kk in ("tf_op", "name", "long_name", "hlo_module"):
        v = a.get(kk)
        if isinstance(v, str) and ("jit_" in v or "jit<" in v):
            m = re.search(r"jit_?\w+", v)
            if m:
                prog = m.group(0)
                break
    if prog is None and name.startswith("jit"):
        prog = name.split("(")[0].split(".")[0]
    per_prog[prog or "?"] = per_prog.get(prog or "?", 0.0) + dur / 1e3
    op_ms[name] = op_ms.get(name, 0.0) + dur / 1e3

ivals.sort()
busy = 0.0
cur_s, cur_e = None, None
for s, e in ivals:
    if cur_s is None:
        cur_s, cur_e = s, e
    elif s <= cur_e:
        cur_e = max(cur_e, e)
    else:
        busy += cur_e - cur_s
        cur_s, cur_e = s, e
if cur_s is not None:
    busy += cur_e - cur_s
busy_ms = busy / 1e3
span_ms = (ivals[-1][1] - ivals[0][0]) / 1e3 if ivals else 0.0
print(f"\ndevice busy: {busy_ms:.0f} ms over span {span_ms:.0f} ms "
      f"({100 * busy_ms / max(span_ms, 1e-9):.0f}% duty)")
print(f"per frame: busy {busy_ms / n_meas:.0f} ms, "
      f"wall {dt * 1e3 / n_meas:.0f} ms, "
      f"idle {dt * 1e3 / n_meas - busy_ms / n_meas:.0f} ms")

print("\ntop programs (device ms, summed rows — may double count "
      "overlapping rows):")
for name, ms in sorted(per_prog.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{ms:9.1f}  {ms / n_meas:7.1f}/frame  {name}")

print("\ntop ops:")
for name, ms in sorted(op_ms.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{ms:9.2f}  {name[:100]}")
