"""Self-train a compact DPT metric-depth net on the geometric synthetic
stream (VERDICT r2 "self-train tiny weights" push, metric-prior half):
no Metric3D/ZoeDepth checkpoint exists in this container, so the 'flax'
backend of vings_mono_tpu/models/metric_depth.py (reference surface:
scripts/metric/metric_model.py) has only ever run random-init.

Supervised rgb -> metric depth on ray-cast rooms with analytic depth.
Loss: scale-aware log-L1 (the net must recover METRIC scale — rooms vary
3-5 m — from perspective cues, the same task Metric3D solves with intr
conditioning; fixed synthetic intrinsics stand in for that here).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/train_metric_depth.py --steps 3000 \
        --out vings_mono_tpu/weights/metric_depth_selftrained.npz
"""

import argparse
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.datasets.synthetic3d import render_room, texture_params
from vings_mono_tpu.models.dpt_depth import DPTDepth
from vings_mono_tpu.utils.profiling import enable_compile_cache

H, W = 128, 160          # multiples of 16 (ViT patch grid)
# hw = the net's CANONICAL resolution: the learned pos-embedding is
# resolution-fixed, so inference resizes inputs here and the depth map
# back (the reference's Metric3D likewise runs at its own input size,
# metric_model.py:38-56)
ARCH = {"dim": 192, "depth": 6, "taps": (1, 3, 5), "hw": (128, 160)}


def sample(rng):
    room = rng.uniform(3.0, 5.0)
    tex = texture_params(rng.integers(1 << 31),
                         sharpness=float(rng.uniform(0.0, 1.0)))
    f = rng.uniform(0.8, 1.1) * W
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pos = rng.uniform(-0.45, 0.45, 3) * room
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.35, 0.35)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    c2w = np.eye(4)
    c2w[:3, :3] = Ry @ Rx
    c2w[:3, 3] = pos
    rgb, dep = render_room(c2w, intr, H, W, room, tex=tex)
    return rgb.astype(np.float32), dep.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="vings_mono_tpu/weights/"
                    "metric_depth_selftrained.npz")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ckpt-every", type=int, default=250)
    args = ap.parse_args()

    enable_compile_cache()
    import optax

    model = DPTDepth(**{k: v for k, v in ARCH.items() if k != "hw"})
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    opt_state = opt.init(params)

    def loss_fn(p, rgb, dep):
        pred = model.apply(p, rgb)
        err = jnp.abs(jnp.log(jnp.clip(pred, 1e-3)) -
                      jnp.log(jnp.clip(dep, 1e-3)))
        # absolute relative error diagnostic
        absrel = jnp.mean(jnp.abs(pred - dep) / jnp.clip(dep, 1e-3))
        return err.mean(), absrel

    @jax.jit
    def step(p, s, rgb, dep):
        (loss, absrel), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rgb, dep)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss, absrel

    pool, cap, lock = [], 256, threading.Lock()
    stop = threading.Event()

    def producer(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            s = sample(rng)
            with lock:
                if len(pool) < cap:
                    pool.append(s)
                else:
                    pool[rng.integers(cap)] = s

    threading.Thread(target=producer, args=(5,), daemon=True).start()
    while len(pool) < args.batch:
        time.sleep(0.5)

    def save(p):
        flat = jax.tree.map(np.asarray, jax.device_get(p["params"]))
        np.savez(args.out, params=np.asarray(flat, dtype=object),
                 arch=np.asarray(ARCH, dtype=object))

    brng = np.random.default_rng(11)
    hist = []
    t0 = time.time()
    for it in range(args.steps):
        with lock:
            picks = [pool[i] for i in
                     brng.integers(len(pool), size=args.batch)]
        rgb = jnp.asarray(np.stack([p[0] for p in picks]))
        dep = jnp.asarray(np.stack([p[1] for p in picks]))
        params, opt_state, loss, absrel = step(params, opt_state, rgb, dep)
        hist.append([float(loss), float(absrel)])
        if (it + 1) % 25 == 0:
            m = np.mean(hist[-25:], axis=0)
            print(f"step {it + 1}/{args.steps} logL1 {m[0]:.4f} "
                  f"absrel {m[1]:.4f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            save(params)
            print(f"saved {args.out} @ step {it + 1}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
