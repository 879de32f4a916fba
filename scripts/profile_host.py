"""Host-side cProfile of the bench's two threads (tracker loop + mapper
worker): on this 1-core host the GIL serializes both threads' python, so
host time in either is critical-path. Prints the top cumulative entries
per thread plus wall splits."""

import cProfile
import pstats
import io
import queue
import threading
import time

import numpy as np
import jax

from vings_mono_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()

from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.middleware import judge_and_package
from vings_mono_tpu.utils.config import load_config

H, W = 240, 432
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


n_warm, n_meas = 14, 16
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
    viz = judge_and_package(tracker, cfg)
    if viz is not None:
        mapper.run(viz)
n_warm += 2
jax.block_until_ready(tracker.video.bufs.poses)
jax.block_until_ready(mapper.state.xyz)

frames = {k: frame(k) for k in range(n_warm, n_warm + 3 * n_meas)}

# throwaway overlapped pass
q = queue.Queue(maxsize=4)


def map_worker(prof=None):
    while True:
        v = q.get()
        if v is None:
            return
        if prof is not None:
            prof.enable()
        mapper.run(v)
        if prof is not None:
            prof.disable()


th = threading.Thread(target=map_worker)
th.start()
for k in range(n_warm, n_warm + n_meas):
    tracker.track(frames[k])
    viz = judge_and_package(tracker, cfg)
    if viz is not None:
        q.put(viz)
q.put(None)
th.join()
jax.block_until_ready(tracker.video.bufs.poses)
jax.block_until_ready(mapper.state.xyz)
n_warm += n_meas

# CPython allows ONE active profiler process-wide: run two sequential
# measured sections, profiling one thread each (everything is compiled by
# now, so the second section costs only its own wall time).
prof_t = cProfile.Profile()
prof_m = cProfile.Profile()
dts = []
for sec, (pt, pm) in enumerate(((prof_t, None), (None, prof_m))):
    th = threading.Thread(target=map_worker, args=(pm,))
    th.start()
    t0 = time.perf_counter()
    for k in range(n_warm, n_warm + n_meas):
        if pt is not None:
            pt.enable()
        tracker.track(frames[k])
        viz = judge_and_package(tracker, cfg)
        if pt is not None:
            pt.disable()
        if viz is not None:
            q.put(viz)
    q.put(None)
    th.join()
    jax.block_until_ready(tracker.video.bufs.poses)
    jax.block_until_ready(mapper.state.xyz)
    dts.append(time.perf_counter() - t0)
    n_warm += n_meas
for sec, dt in enumerate(dts):
    print(f"section {sec}: {n_meas / dt:.3f} fps "
          f"({dt * 1e3 / n_meas:.0f} ms/frame)")

for name, prof in (("tracker", prof_t), ("mapper", prof_m)):
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(28)
    print(f"\n===== {name} thread (per {n_meas} frames) =====")
    print("\n".join(s.getvalue().splitlines()[:46]))
