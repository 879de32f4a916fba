"""Micro-bench of the tracker's fused GRU+BA update on the real chip:
separates per-dispatch (tunnel) latency from on-device compute."""

import time

import numpy as np
import jax
import jax.numpy as jnp

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
})
tracker = Tracker(cfg, H, W)
ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")


def frame(k):
    img = 0.5 + 0.3 * np.sin(0.05 * (xs + 4.0 * k)) * \
        np.cos(0.04 * (ys + 2.0 * k)) + 0.2 * np.sin(0.13 * xs + 0.1 * k)
    rgb = np.stack([img, img * 0.8, np.abs(np.sin(0.02 * xs + 0.2 * k))],
                   -1).astype(np.float32)
    return {"timestamp": float(k), "rgb": np.clip(rgb, 0, 1),
            "intrinsic": np.asarray([220.0, 220.0, W / 2, H / 2],
                                    np.float32)}


for k in range(14):
    tracker.track(frame(k))
print(f"warm: counter={tracker.video.counter} "
      f"edges={len(tracker.graph.ii)}", flush=True)


def timeit(label, f, n=12):
    f()
    t0 = time.perf_counter()
    for _ in range(n):
        f()
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)


# 1) trivial dispatch round trip (upper bound on tunnel latency)
x = jnp.zeros((8, 128))
triv = jax.jit(lambda a: a + 1.0)
timeit("trivial dispatch+block", lambda: jax.block_until_ready(triv(x)))

# 2) host->device upload of the packed int vector
pk = np.zeros(4 * 64 + 4 * 128 + 5, np.int32)
timeit("h2d packed upload", lambda: jax.block_until_ready(jnp.asarray(pk)))

# 3) one full fused graph update (iters=1)
g = tracker.graph


def one_update():
    g.update(iters=1)
    jax.block_until_ready(g.video.bufs.poses)


timeit("graph.update(iters=1)", one_update)


def two_update():
    g.update(iters=2)
    jax.block_until_ready(g.video.bufs.poses)


timeit("graph.update(iters=2)", two_update)

# 4) distance query (add_proximity building block)
timeit("video.distance(48 pairs)",
       lambda: tracker.video.distance(np.arange(48) % 12,
                                      (np.arange(48) + 3) % 12))

# 5) full add_proximity_factors
timeit("add_proximity", lambda: g.add_proximity_factors())

# 6) async enqueue: is dispatch synchronous through the tunnel?
x2 = jnp.zeros((256, 256))
triv2 = jax.jit(lambda a: a @ a + 1.0)


def chain(n=20):
    y = x2
    for _ in range(n):
        y = triv2(y)
    jax.block_until_ready(y)


chain(1)
t0 = time.perf_counter()
chain(20)
print(f"chained dispatch (20 deps): {(time.perf_counter()-t0)/20*1e3:.1f} "
      "ms/op", flush=True)

# 7) middleware packaging
from vings_mono_tpu.middleware import judge_and_package
tracker.frontend.new_frame_added = True
timeit("judge_and_package", lambda: judge_and_package(tracker, cfg))


def package_blocked():
    v = judge_and_package(tracker, cfg)
    jax.block_until_ready(v["images"])


timeit("judge_and_package+block", package_blocked)

# 8) is h2d upload async? (enqueue vs completed)
t0 = time.perf_counter()
for _ in range(10):
    a = jnp.asarray(pk)
enq = (time.perf_counter() - t0) / 10 * 1e3
jax.block_until_ready(a)
t0 = time.perf_counter()
for _ in range(10):
    jax.block_until_ready(jnp.asarray(pk))
blk = (time.perf_counter() - t0) / 10 * 1e3
print(f"h2d upload: enqueue {enq:.1f} ms, completed {blk:.1f} ms",
      flush=True)

# 9) full tracker.track steady state
t0 = time.perf_counter()
for k in range(14, 24):
    tracker.track(frame(k))
jax.block_until_ready(tracker.video.bufs.poses)
print(f"tracker.track steady: {(time.perf_counter()-t0)/10*1e3:.1f} "
      "ms/frame", flush=True)
