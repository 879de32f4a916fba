"""Self-train a compact LightGlue matcher on synthetic room pairs
(VERDICT r2 "self-train tiny weights" push, matcher half): the reference
runs LightGlue as an ONNX session (loop/lightglue.py:12-24); no weights
ship in this container, so the flax architecture
(vings_mono_tpu/models/lightglue.py) has only ever been tested
structurally and the mutual-NN matcher stood in for it.

Recipe: frozen self-trained SuperPoint (scripts/train_superpoint.py)
extracts keypoints+descriptors on two ray-cast views; analytic
depth+poses give the EXACT ground-truth partial assignment (reproject
A-keypoints into B, nearest B-keypoint within 3 px, occlusion-checked);
the LightGlue loss is the standard assignment NLL: -scores[i, gt_j] for
matched points, -log(1 - z) for unmatchable ones.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/train_lightglue.py --steps 2000 \
        --out vings_mono_tpu/weights/lightglue_selftrained.npz
"""

import argparse
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.datasets.synthetic3d import render_room, texture_params
from vings_mono_tpu.models.lightglue import LightGlue, normalize_keypoints
from vings_mono_tpu.models.superpoint import (SuperPoint, load_superpoint,
                                              nms_keypoints,
                                              sample_descriptors)
from vings_mono_tpu.utils.profiling import enable_compile_cache

H, W = 240, 320
N_KP = 256
ARCH = {"layers": 2}


def _c2w(pos, yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = pos
    return m


def sample_views(rng):
    room = rng.uniform(3.0, 5.0)
    tex = texture_params(rng.integers(1 << 31), sharpness=1.0)
    f = rng.uniform(0.9, 1.1) * W * 0.75
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pos = rng.uniform(-0.4, 0.4, 3) * room
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.3, 0.3)
    a = _c2w(pos, yaw, pitch)
    b = _c2w(pos + rng.normal(size=3) * 0.25, yaw + rng.normal() * 0.2,
             np.clip(pitch + rng.normal() * 0.1, -0.4, 0.4))
    rgb_a, dep_a = render_room(a, intr, H, W, room, tex=tex)
    rgb_b, dep_b = render_room(b, intr, H, W, room, tex=tex)
    return (rgb_a.astype(np.float32), dep_a, a,
            rgb_b.astype(np.float32), dep_b, b, intr)


def gt_assignment(xy_a, va, dep_a, c2w_a, xy_b, vb, dep_b, c2w_b, intr,
                  tol=3.0):
    """Reproject A keypoints into B; GT index of nearest B keypoint within
    tol px (occlusion-checked), else -1 (unmatchable)."""
    fx, fy, cx, cy = intr
    gt = np.full(N_KP, -1, np.int64)
    u = np.clip(xy_a[:, 0].astype(int), 0, W - 1)
    v = np.clip(xy_a[:, 1].astype(int), 0, H - 1)
    z = dep_a[v, u]
    pc = np.stack([(xy_a[:, 0] - cx) / fx * z,
                   (xy_a[:, 1] - cy) / fy * z, z], -1)
    pw = pc @ c2w_a[:3, :3].T + c2w_a[:3, 3]
    w2c = np.linalg.inv(c2w_b)
    pb = pw @ w2c[:3, :3].T + w2c[:3, 3]
    zb = pb[:, 2]
    ok = va & (z > 0.05) & (zb > 0.05)
    zs = np.where(zb > 0.05, zb, 1.0)
    ub = fx * pb[:, 0] / zs + cx
    vb_pix = fy * pb[:, 1] / zs + cy
    ok &= (ub >= 0) & (ub < W) & (vb_pix >= 0) & (vb_pix < H)
    ui = np.clip(ub, 0, W - 1).astype(int)
    vi = np.clip(vb_pix, 0, H - 1).astype(int)
    ok &= np.abs(dep_b[vi, ui] - zb) < np.maximum(0.03 * zb, 0.05)
    proj = np.stack([ub, vb_pix], -1)
    d = np.linalg.norm(proj[:, None, :] - xy_b[None, :, :], axis=-1)
    d[:, ~vb] = 1e9
    j = np.argmin(d, axis=1)
    dmin = d[np.arange(N_KP), j]
    hit = ok & (dmin < tol)
    gt[hit] = j[hit]
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--superpoint", default="vings_mono_tpu/weights/"
                    "superpoint_selftrained.npz")
    ap.add_argument("--out", default="vings_mono_tpu/weights/"
                    "lightglue_selftrained.npz")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt-every", type=int, default=250)
    args = ap.parse_args()

    enable_compile_cache()
    import optax

    sp_model, sp_params = load_superpoint(args.superpoint)

    @jax.jit
    def extract(gray):
        heat, desc_map = sp_model.apply(sp_params, gray[None, ..., None])
        xy, score, valid = nms_keypoints(heat[0], N_KP)
        desc = sample_descriptors(xy, desc_map[0], (H, W))
        return xy, valid, desc

    lg = LightGlue(**ARCH)
    kp0 = jnp.zeros((N_KP, 2))
    params = lg.init(jax.random.PRNGKey(0), jnp.zeros((N_KP, 256)),
                     jnp.zeros((N_KP, 256)), kp0, kp0,
                     jnp.ones(N_KP, bool), jnp.ones(N_KP, bool))
    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    opt_state = opt.init(params)

    def loss_fn(p, da, db, ka, kb, va, vb, gt):
        scores, z0, z1 = lg.apply(p, da, db, ka, kb, va, vb)
        matched = gt >= 0
        gt_c = jnp.clip(gt, 0)
        nll_m = -jnp.take_along_axis(scores, gt_c[:, None], 1)[:, 0]
        # unmatchable valid points should have low matchability
        nll_u0 = -jnp.log(jnp.clip(1.0 - z0, 1e-9))
        matched_b = jnp.zeros(N_KP, bool).at[gt_c].set(matched)
        nll_u1 = -jnp.log(jnp.clip(1.0 - z1, 1e-9))
        n_m = jnp.clip(matched.sum(), 1)
        loss = (jnp.where(matched, nll_m, 0.0).sum() / n_m
                + 0.5 * jnp.where(va & ~matched, nll_u0, 0.0).sum()
                / jnp.clip((va & ~matched).sum(), 1)
                + 0.5 * jnp.where(vb & ~matched_b, nll_u1, 0.0).sum()
                / jnp.clip((vb & ~matched_b).sum(), 1))
        # diagnostic: argmax accuracy on matched rows
        acc = jnp.sum((jnp.argmax(scores, 1) == gt_c) & matched) / n_m
        return loss, acc

    @jax.jit
    def step(p, s, da, db, ka, kb, va, vb, gt):
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, da, db, ka, kb, va, vb, gt)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss, acc

    pool, cap, lock = [], 256, threading.Lock()
    stop = threading.Event()

    def producer(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            s = sample_views(rng)
            with lock:
                if len(pool) < cap:
                    pool.append(s)
                else:
                    pool[rng.integers(cap)] = s

    threading.Thread(target=producer, args=(9,), daemon=True).start()
    while len(pool) < 4:
        time.sleep(0.5)

    def save(p):
        flat = jax.tree.map(np.asarray, jax.device_get(p["params"]))
        np.savez(args.out, params=np.asarray(flat, dtype=object),
                 arch=np.asarray(ARCH, dtype=object))

    gray_w = np.asarray([0.299, 0.587, 0.114], np.float32)
    brng = np.random.default_rng(13)
    hist = []
    t0 = time.time()
    for it in range(args.steps):
        with lock:
            rgb_a, dep_a, c2w_a, rgb_b, dep_b, c2w_b, intr = \
                pool[brng.integers(len(pool))]
        xa, va, da = extract(jnp.asarray(rgb_a @ gray_w))
        xb, vb, db = extract(jnp.asarray(rgb_b @ gray_w))
        xa_h, va_h = np.asarray(xa), np.asarray(va)
        xb_h, vb_h = np.asarray(xb), np.asarray(vb)
        gt = gt_assignment(xa_h, va_h, dep_a, c2w_a, xb_h, vb_h, dep_b,
                           c2w_b, intr)
        ka = normalize_keypoints(xa, (H, W))
        kb = normalize_keypoints(xb, (H, W))
        params, opt_state, loss, acc = step(
            params, opt_state, da, db, ka, kb, va, vb, jnp.asarray(gt))
        hist.append([float(loss), float(acc), float((gt >= 0).sum())])
        if (it + 1) % 25 == 0:
            m = np.mean(hist[-25:], axis=0)
            print(f"step {it + 1}/{args.steps} loss {m[0]:.4f} "
                  f"acc {m[1]:.3f} gt_matches {m[2]:.0f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            save(params)
            print(f"saved {args.out} @ step {it + 1}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
