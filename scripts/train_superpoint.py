"""Self-train SuperPoint weights on the geometric synthetic3d stream
(VERDICT r2 next-step 2, loop-closure half): no pretrained SuperPoint
checkpoint exists in this container, so loop detection
(loop/detect.py; reference session: loop/lightglue.py:12-24,
loop_detect.py:120-193) has only ever run random-init and can never fire.

Recipe (all in-container, no external labels):
- detector head: 65-way per-cell cross-entropy (the standard SuperPoint
  detector loss) against Shi-Tomasi corner self-labels
  (cv2.goodFeaturesToTrack) on ray-cast room renders — classic corners
  are repeatable under viewpoint change, so a net that reproduces them
  gives repeatable detections;
- descriptor head: InfoNCE over EXACT geometric correspondences — room
  pairs come with analytic depth + poses, so corner pixels in view A
  unproject/reproject onto view B with an occlusion check.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/train_superpoint.py --steps 3000 \
        --out vings_mono_tpu/weights/superpoint_selftrained.npz
"""

import argparse
import functools
import queue
import threading
import time

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.datasets.synthetic3d import render_room, texture_params
from vings_mono_tpu.models.droid_net import (load_flax_weights,
                                             save_flax_weights)
from vings_mono_tpu.models.superpoint import SuperPoint, sample_descriptors
from vings_mono_tpu.utils.profiling import enable_compile_cache

H, W = 120, 160
h8, w8 = H // 8, W // 8
K = 128          # correspondence budget per pair


def _gray(rgb):
    return (rgb @ np.asarray([0.299, 0.587, 0.114])).astype(np.float32)


def _corner_labels(gray):
    """Shi-Tomasi corners -> (65-way cell labels (h8*w8,), corner xy)."""
    g8 = (np.clip(gray, 0, 1) * 255).astype(np.uint8)
    pts = cv2.goodFeaturesToTrack(g8, maxCorners=150, qualityLevel=0.03,
                                  minDistance=5)
    lab = np.full(h8 * w8, 64, np.int32)
    xy = np.zeros((0, 2), np.float32)
    if pts is not None:
        xy = pts.reshape(-1, 2).astype(np.float32)
        # strongest first (goodFeaturesToTrack sorts by quality): first
        # corner to claim a cell wins
        for x, y in xy:
            xi, yi = int(x), int(y)
            cell = (yi // 8) * w8 + xi // 8
            if lab[cell] == 64:
                lab[cell] = (yi % 8) * 8 + xi % 8
    return lab, xy


def _pose(room, rng):
    pos = rng.uniform(-0.45, 0.45, 3) * room
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.35, 0.35)
    return pos, yaw, pitch


def _c2w(pos, yaw, pitch):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    c2w = np.eye(4)
    c2w[:3, :3] = Ry @ Rx
    c2w[:3, 3] = pos
    return c2w


def _correspond(xy_a, depth_a, c2w_a, c2w_b, depth_b, intr):
    """Project view-A corner pixels into view B via the analytic geometry.
    Returns (ptsA (K,2), ptsB (K,2), valid (K,)), zero-padded."""
    fx, fy, cx, cy = intr
    out_a = np.zeros((K, 2), np.float32)
    out_b = np.zeros((K, 2), np.float32)
    val = np.zeros(K, bool)
    if len(xy_a) == 0:
        return out_a, out_b, val
    u, v = xy_a[:, 0], xy_a[:, 1]
    z = depth_a[v.astype(int), u.astype(int)]
    pc = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)
    pw = pc @ c2w_a[:3, :3].T + c2w_a[:3, 3]
    w2c_b = np.linalg.inv(c2w_b)
    pb = pw @ w2c_b[:3, :3].T + w2c_b[:3, 3]
    zb = pb[:, 2]
    ok = zb > 0.05
    zb_safe = np.where(ok, zb, 1.0)
    ub = fx * pb[:, 0] / zb_safe + cx
    vb = fy * pb[:, 1] / zb_safe + cy
    ok &= (ub >= 1) & (ub < W - 1) & (vb >= 1) & (vb < H - 1)
    ui = np.clip(ub, 0, W - 1).astype(int)
    vi = np.clip(vb, 0, H - 1).astype(int)
    # occlusion: the reprojected depth must match B's depth buffer
    ok &= np.abs(depth_b[vi, ui] - zb) < np.maximum(0.03 * zb, 0.05)
    idx = np.where(ok)[0][:K]
    n = len(idx)
    out_a[:n] = xy_a[idx]
    out_b[:n] = np.stack([ub[idx], vb[idx]], -1)
    val[:n] = True
    return out_a, out_b, val


def random_pair(rng):
    """One training sample: two overlapping views of a random room with
    corner self-labels + exact correspondences."""
    room = rng.uniform(3.0, 5.0)
    # sharp (square-wave-shaped) textures: smooth sinusoids have no
    # localizable corners, so the 65-way sub-pixel detector objective is
    # unlearnable on them (det_acc pinned at 0 in the first run)
    tex = texture_params(rng.integers(1 << 31), sharpness=1.0)
    f = rng.uniform(0.8, 1.1) * W
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    for _ in range(8):                       # resample until enough overlap
        pos, yaw, pitch = _pose(room, rng)
        c2w_a = _c2w(pos, yaw, pitch)
        c2w_b = _c2w(pos + rng.normal(size=3) * 0.25 * room * 0.3,
                     yaw + rng.normal() * 0.25,
                     np.clip(pitch + rng.normal() * 0.1, -0.5, 0.5))
        rgb_a, dep_a = render_room(c2w_a, intr, H, W, room, tex=tex)
        rgb_b, dep_b = render_room(c2w_b, intr, H, W, room, tex=tex)
        ga, gb = _gray(rgb_a), _gray(rgb_b)
        lab_a, xy_a = _corner_labels(ga)
        lab_b, _ = _corner_labels(gb)
        pa, pb, val = _correspond(xy_a, dep_a, c2w_a, c2w_b, dep_b, intr)
        if val.sum() >= 16:
            break
    return dict(gray=np.stack([ga, gb])[..., None],
                labels=np.stack([lab_a, lab_b]),
                pts_a=pa, pts_b=pb, valid=val)


def make_train_step(model, opt):
    import optax

    # spatial label smoothing over the 8x8 sub-pixel grid: exact 64-way
    # position targets are too sparse a signal to generalize from at this
    # batch/step budget (det_acc stayed 0.000 for 2k+ steps); a sigma=1px
    # Gaussian around the label subpixel trains position-to-~1px, which is
    # well inside PnP's 4px reprojection gate (loop/detect.py:119)
    dyx = np.stack(np.meshgrid(np.arange(8), np.arange(8),
                               indexing="ij"), -1).reshape(64, 2)
    d2 = ((dyx[None, :, :] - dyx[:, None, :]) ** 2).sum(-1)
    smooth64 = np.exp(-d2 / 2.0)
    smooth64 /= smooth64.sum(1, keepdims=True)
    target_table = np.zeros((65, 65), np.float32)
    target_table[:64, :64] = smooth64
    target_table[64, 64] = 1.0
    target_table = jnp.asarray(target_table)

    def loss_fn(params, batch):
        _, desc_map, logits = model.apply(params, batch["gray"])
        # detector 65-way CE per cell (the standard SuperPoint detector
        # loss) against smoothed Shi-Tomasi self-labels; 64 = dustbin
        B = logits.shape[0]
        logp = jax.nn.log_softmax(logits.reshape(B, h8 * w8, 65), -1)
        lab = batch["labels"]
        ce = -jnp.sum(target_table[lab] * logp, -1).mean()

        # descriptor InfoNCE over exact correspondences, vmapped over the
        # pairs in the batch (views are interleaved [a0, b0, a1, b1, ...])
        npairs = B // 2
        dm = desc_map.reshape(npairs, 2, *desc_map.shape[1:])
        pts_a = batch["pts_a"].reshape(npairs, K, 2)
        pts_b = batch["pts_b"].reshape(npairs, K, 2)
        vals = batch["valid"].reshape(npairs, K)

        def pair_nce(dm2, pa, pb, val):
            da = sample_descriptors(pa, dm2[0], (H, W))
            db = sample_descriptors(pb, dm2[1], (H, W))
            sim = (da @ db.T) / 0.07
            big = jnp.where(val[None, :], 0.0, -1e9)
            logits_ab = sim + big              # mask invalid columns
            logits_ba = sim.T + big
            tgt = jnp.arange(K)
            ce_ab = -jnp.take_along_axis(
                jax.nn.log_softmax(logits_ab, -1), tgt[:, None], -1)[:, 0]
            ce_ba = -jnp.take_along_axis(
                jax.nn.log_softmax(logits_ba, -1), tgt[:, None], -1)[:, 0]
            nce_p = jnp.sum(jnp.where(val, ce_ab + ce_ba, 0.0)) \
                / jnp.clip(val.sum(), 1, None) * 0.5
            acc_p = jnp.sum((jnp.argmax(sim + big, -1) == tgt) & val) \
                / jnp.clip(val.sum(), 1, None)
            return nce_p, acc_p

        nces, accs = jax.vmap(pair_nce)(dm, pts_a, pts_b, vals)
        nce = nces.mean()
        # diagnostics: detector cell accuracy (exact + within-2px) and
        # mutual-NN match accuracy
        pred = jnp.argmax(logp, -1)
        corner = lab != 64
        acc_det = jnp.mean((pred == lab) & corner) / jnp.clip(
            jnp.mean(corner), 1e-6, None)
        dpix2 = (pred // 8 - lab // 8) ** 2 + (pred % 8 - lab % 8) ** 2
        acc_det2 = jnp.mean((pred != 64) & (dpix2 <= 4) & corner) / \
            jnp.clip(jnp.mean(corner), 1e-6, None)
        acc_m = accs.mean()
        return ce + nce, (ce, nce, acc_det, acc_det2, acc_m)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        upd, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, loss, aux

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="vings_mono_tpu/weights/"
                    "superpoint_selftrained.npz")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ckpt-every", type=int, default=250)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    enable_compile_cache()
    import optax

    model = SuperPoint(with_logits=True)
    if args.resume:
        params = load_flax_weights(args.resume)
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 1)))
    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-5))
    opt_state = opt.init(params)
    step_fn = make_train_step(model, opt)

    # sample POOL instead of a queue: the 1-core host can only render
    # ~3 pairs/s, so steps draw batches from a growing pool the producer
    # keeps refreshing — batch size is decoupled from render throughput
    pool = []
    pool_cap = 512
    lock = threading.Lock()
    stop = threading.Event()

    def producer(seed):
        rng = np.random.default_rng(seed)
        while not stop.is_set():
            s = random_pair(rng)
            with lock:
                if len(pool) < pool_cap:
                    pool.append(s)
                else:
                    pool[rng.integers(pool_cap)] = s

    threading.Thread(target=producer, args=(77,), daemon=True).start()
    while len(pool) < 8:
        time.sleep(0.5)
    bs_pairs = 3
    brng = np.random.default_rng(123)

    hist = []
    t0 = time.time()
    for it in range(args.steps):
        with lock:
            picks = [pool[i] for i in
                     brng.integers(len(pool), size=bs_pairs)]
        batch = {k: jnp.asarray(np.concatenate([p[k] for p in picks])
                                if picks[0][k].ndim and
                                picks[0][k].shape[0] == 2
                                else np.stack([p[k] for p in picks]))
                 for k in picks[0]}
        params, opt_state, loss, aux = step_fn(params, opt_state, batch)
        hist.append([float(loss)] + [float(a) for a in aux])
        if (it + 1) % 25 == 0:
            m = np.mean(hist[-25:], axis=0)
            print(f"step {it + 1}/{args.steps} loss {m[0]:.4f} "
                  f"det_ce {m[1]:.4f} nce {m[2]:.4f} det_acc {m[3]:.3f} "
                  f"det_acc2px {m[4]:.3f} match_acc {m[5]:.3f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            save_flax_weights(args.out, params)
            print(f"saved {args.out} @ step {it + 1}", flush=True)
    stop.set()


if __name__ == "__main__":
    main()
