"""Self-train DROID weights on the geometric synthetic3d stream
(VERDICT r2 next-step 2): no pretrained checkpoints exist in this
container, so the learned stack (motion filter, keyframe gating, GRU flow)
has only ever run random-init. This trains the full DroidNet with the
committed unrolled GRU+BA harness (models/droid_trainer.py; reference
training spec: frontend/droid_net.py:178-228 + geom/losses.py) on
ray-cast cube-room clips with exact pose/depth supervision.

Each clip is scale-normalized so mean inverse depth ~= 0.8 (the reference
training pipeline rescales scenes the same way, data_readers/base.py) —
monocular BA is gauge-free, so training near the disp init (1.0) helps
the unrolled optimization converge.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/train_droid.py --steps 3000 \
        --out vings_mono_tpu/weights/droid_selftrained.npz
"""

import argparse
import os
import queue
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.datasets.synthetic3d import (render_room,
                                                 texture_params)
from vings_mono_tpu.models.droid_net import DroidNet, save_flax_weights
from vings_mono_tpu.models.droid_trainer import TrainBatch, make_train_step
from vings_mono_tpu.ops import lie
from vings_mono_tpu.utils.profiling import enable_compile_cache

P, H, W = 5, 96, 128
h8, w8 = H // 8, W // 8


def random_clip(rng):
    """One training sample: random room/texture/trajectory, P frames with
    full-res rgb + exact 1/8-res inverse depth + w2c poses.

    Per-clip motion scale in [0.5, 3]: the round-3 curriculum trained only
    tiny baselines (vel ~0.06/frame), so the gated lane — which sees
    LARGER inter-keyframe baselines after the motion filter skips frames —
    ran the net out of distribution and gating DEGRADED ATE (VERDICT r3
    weak #3)."""
    room = rng.uniform(3.0, 5.0)
    tex = texture_params(rng.integers(1 << 31))
    f = rng.uniform(0.8, 1.1) * W
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)

    ms = rng.uniform(float(os.environ.get("DROID_MS_LO", 0.5)),
                     float(os.environ.get("DROID_MS_HI", 2.0)))
    # smooth random walk that stays inside the room
    pos = rng.uniform(-0.35, 0.35, 3) * room
    vel = rng.normal(size=3) * 0.06 * ms
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.3, 0.3)
    dyaw = rng.normal() * 0.03 * ms
    dpitch = rng.normal() * 0.015 * ms
    c2ws = []
    for k in range(P):
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        c2w = np.eye(4)
        c2w[:3, :3] = Ry @ Rx
        c2w[:3, 3] = pos
        c2ws.append(c2w)
        vel = 0.9 * vel + rng.normal(size=3) * 0.03 * ms
        pos = np.clip(pos + vel, -0.7 * room, 0.7 * room)
        yaw += dyaw + rng.normal() * 0.01
        pitch = np.clip(pitch + dpitch + rng.normal() * 0.006, -0.5, 0.5)

    imgs = np.empty((P, H, W, 3), np.float32)
    depth8 = np.empty((P, h8, w8), np.float32)
    for k, c2w in enumerate(c2ws):
        imgs[k], _ = render_room(c2w, intr, H, W, room, tex=tex)
        _, depth8[k] = render_room(c2w, intr / 8.0, h8, w8, room, tex=tex)

    # scale-normalize the clip: mean inverse depth -> 0.8
    alpha = np.mean(1.0 / depth8) / 0.8
    depth8 = depth8 / alpha
    w2cs = []
    for c2w in c2ws:
        w2c = np.linalg.inv(c2w)
        w2c[:3, 3] /= alpha
        w2cs.append(w2c)
    poses = np.stack([np.asarray(lie.se3_from_matrix(jnp.asarray(
        m, jnp.float32))) for m in w2cs])
    ii, jj = np.meshgrid(np.arange(P), np.arange(P), indexing="ij")
    m = (np.abs(ii - jj) >= 1) & (np.abs(ii - jj) <= 2)
    return dict(images=imgs, poses_gt=poses.astype(np.float32),
                disps_gt=(1.0 / depth8).astype(np.float32),
                intrinsics=(intr / 8.0).astype(np.float32),
                ii=ii.reshape(-1)[m.reshape(-1)].astype(np.int32),
                jj=jj.reshape(-1)[m.reshape(-1)].astype(np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="vings_mono_tpu/weights/"
                    "droid_selftrained.npz")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--num-steps", type=int, default=8,
                    help="unrolled GRU+BA iterations")
    ap.add_argument("--ckpt-every", type=int, default=250)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    enable_compile_cache()
    import optax

    model = DroidNet()
    if args.resume:
        from vings_mono_tpu.models.droid_net import load_flax_weights
        params = load_flax_weights(args.resume)
    else:
        rng0 = jax.random.PRNGKey(0)
        p0 = model.init(rng0, jnp.zeros((1, 64, 64, 3)),
                        method=DroidNet.extract_features)
        pu = model.init(rng0, jnp.zeros((1, h8, w8, 128)),
                        jnp.zeros((1, h8, w8, 128)),
                        jnp.zeros((1, h8, w8, 196)), None,
                        jnp.zeros((1,), jnp.int32), 2, True,
                        method=DroidNet.run_update)
        params = {"params": {**p0["params"], **pu["params"]}}

    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    step_fn = make_train_step(model, opt, num_steps=args.num_steps)
    opt_state = opt.init(params)

    q = queue.Queue(maxsize=12)
    stop = threading.Event()

    def producer(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            s = random_clip(rng)
            while not stop.is_set():
                try:
                    q.put(s, timeout=1.0)
                    break
                except queue.Full:
                    pass

    th = threading.Thread(target=producer, args=(1234,), daemon=True)
    th.start()

    losses = []
    t0 = time.time()
    for it in range(args.steps):
        s = q.get()
        batch = TrainBatch(images=jnp.asarray(s["images"]),
                           poses_gt=jnp.asarray(s["poses_gt"]),
                           disps_gt=jnp.asarray(s["disps_gt"]),
                           intrinsics=jnp.asarray(s["intrinsics"]),
                           ii=jnp.asarray(s["ii"]),
                           jj=jnp.asarray(s["jj"]))
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
        if (it + 1) % 25 == 0:
            print(f"step {it + 1}/{args.steps} "
                  f"loss {np.mean(losses[-25:]):.4f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            save_flax_weights(args.out, params)
            print(f"saved {args.out} @ step {it + 1}", flush=True)
    stop.set()
    print(f"done: final loss(avg50) {np.mean(losses[-50:]):.4f}")


if __name__ == "__main__":
    main()
