"""Self-train the FastSAM-class YOLOv8-seg net on synthetic composites
(VERDICT r2 "self-train tiny weights" push, dynamic-masking half): the
reference runs FastSAM-x for segment-everything dynamic masking
(scripts/dynamic/dynamic_utils.py:6-27); no checkpoint ships in this
container, so the flax graph (models/fastsam.py) has only ever run
random-init and the 'cc' connected-components backend stood in for it.

Data: ray-cast room backgrounds + 1-3 textured superellipse sprites with
analytic instance masks — figure/ground segmentation with exact labels.

Loss (simplified single-positive YOLOv8-seg):
  - objectness/cls BCE per scale (positive at each object's center cell
    on its size-matched scale),
  - DFL distribution CE on the 4 box-side distances at positive cells,
  - instance-mask BCE: sigmoid(proto @ mask-coeffs) vs the GT mask,
    box-weighted (the standard proto-mask objective).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/train_fastsam.py --steps 2500 \
        --out vings_mono_tpu/weights/fastsam_selftrained.npz
"""

import argparse
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.datasets.synthetic3d import render_room, texture_params
from vings_mono_tpu.models.fastsam import FastSAM, REG_MAX
from vings_mono_tpu.utils.profiling import enable_compile_cache

H, W = 160, 224          # multiples of 32
MAXOBJ = 3
STRIDES = (8, 16, 32)


def _sprite_texture(rng, h, w):
    """Cheap distinct sprite texture: 2D sinusoid mixture."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rgb = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        acc = 0.5
        for _ in range(3):
            fx, fy = rng.uniform(-0.3, 0.3, 2)
            acc = acc + rng.uniform(0.1, 0.25) * np.sin(
                fx * xs + fy * ys + rng.uniform(0, 6.28))
        rgb[..., c] = acc
    return np.clip(rgb, 0, 1)


def sample(rng):
    room = rng.uniform(3.0, 5.0)
    tex = texture_params(rng.integers(1 << 31),
                         sharpness=float(rng.uniform(0, 1)))
    f = rng.uniform(0.8, 1.1) * W * 0.7
    intr = np.asarray([f, f, W / 2, H / 2], np.float32)
    pos = rng.uniform(-0.45, 0.45, 3) * room
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.3, 0.3)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    c2w = np.eye(4)
    c2w[:3, :3] = Ry @ Rx
    c2w[:3, 3] = pos
    rgb, _ = render_room(c2w, intr, H, W, room, tex=tex)
    rgb = rgb.astype(np.float32)

    n_obj = int(rng.integers(1, MAXOBJ + 1))
    boxes = np.zeros((MAXOBJ, 4), np.float32)       # x0 y0 x1 y1
    masks = np.zeros((MAXOBJ, H, W), np.float32)
    valid = np.zeros(MAXOBJ, bool)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for k in range(n_obj):
        a = rng.uniform(10, 55)                      # half-extent x
        b = rng.uniform(10, 55)
        cx = rng.uniform(a + 2, W - a - 2)
        cyp = rng.uniform(b + 2, H - b - 2)
        th = rng.uniform(0, np.pi)
        p = rng.uniform(1.5, 4.0)                    # superellipse power
        xr = (xs - cx) * np.cos(th) + (ys - cyp) * np.sin(th)
        yr = -(xs - cx) * np.sin(th) + (ys - cyp) * np.cos(th)
        m = (np.abs(xr / a) ** p + np.abs(yr / b) ** p) <= 1.0
        if m.sum() < 40:
            continue
        spr = _sprite_texture(rng, H, W)
        rgb = np.where(m[..., None], spr, rgb)
        # composited-over earlier sprites: occlude their masks
        masks[:k][:, m] = 0.0
        us, vs = xs[m], ys[m]
        boxes[k] = [us.min(), vs.min(), us.max() + 1, vs.max() + 1]
        masks[k] = m.astype(np.float32)
        valid[k] = True
    # drop fully-occluded earlier objects
    for k in range(n_obj):
        if valid[k] and masks[k].sum() < 40:
            valid[k] = False
    return rgb, boxes, masks, valid


def make_step(model, opt):
    import optax

    def assign_scale(box):
        size = jnp.maximum(box[2] - box[0], box[3] - box[1])
        # match the stride whose REG_MAX range covers the box comfortably
        return jnp.where(size < 56.0, 0, jnp.where(size < 112.0, 1, 2))

    def loss_fn(p, rgb, boxes, masks, valid):
        preds, proto = model.apply(p, rgb)
        B = rgb.shape[0]
        total_cls = 0.0
        total_dfl = 0.0
        total_msk = 0.0
        scale_of = jax.vmap(jax.vmap(assign_scale))(boxes)      # (B, MAXOBJ)
        for i, stride in enumerate(STRIDES):
            ph, pw = preds[i].shape[1:3]
            logits = preds[i][..., 4 * REG_MAX]                  # (B, h, w)
            boxmap = preds[i][..., :4 * REG_MAX]
            mcmap = preds[i][..., 4 * REG_MAX + 1:]

            def per_img(logit, boxmp, mcmp, prot, bxs, mks, val, scl):
                cxy = (bxs[:, :2] + bxs[:, 2:]) / 2.0 / stride
                ci = jnp.clip(cxy[:, 0].astype(jnp.int32), 0, pw - 1)
                cj = jnp.clip(cxy[:, 1].astype(jnp.int32), 0, ph - 1)
                on = val & (scl == i)
                tgt = jnp.zeros((ph, pw)).at[cj, ci].max(
                    jnp.where(on, 1.0, 0.0))
                cls = optax.sigmoid_binary_cross_entropy(logit, tgt)
                # balance: positives are ~1/(h*w) of cells
                wpos = jnp.where(tgt > 0, float(ph * pw) / MAXOBJ / 4, 1.0)
                cls = (cls * wpos).mean()

                def obj_terms(k):
                    bx = bxs[k]
                    cell = boxmp[cj[k], ci[k]].reshape(4, REG_MAX)
                    # distances center -> edges in stride units
                    cpx = (ci[k] + 0.5) * stride
                    cpy = (cj[k] + 0.5) * stride
                    dists = jnp.stack([cpx - bx[0], cpy - bx[1],
                                       bx[2] - cpx, bx[3] - cpy]) / stride
                    dists = jnp.clip(dists, 0.0, REG_MAX - 1.01)
                    lo = jnp.floor(dists)
                    whi = dists - lo
                    logp = jax.nn.log_softmax(cell, -1)
                    il = lo.astype(jnp.int32)
                    dfl = -((1 - whi) * jnp.take_along_axis(
                        logp, il[:, None], 1)[:, 0]
                        + whi * jnp.take_along_axis(
                            logp, jnp.clip(il + 1, 0, REG_MAX - 1)[:, None],
                            1)[:, 0]).mean()
                    # proto mask for this object
                    mpred = jnp.einsum("hwc,c->hw", prot, mcmp[cj[k], ci[k]])
                    gt4 = mks[k][::4, ::4]
                    inb = jnp.zeros_like(gt4)
                    x0 = (bx[0] / 4).astype(jnp.int32)
                    y0 = (bx[1] / 4).astype(jnp.int32)
                    x1 = jnp.ceil(bx[2] / 4).astype(jnp.int32)
                    y1 = jnp.ceil(bx[3] / 4).astype(jnp.int32)
                    gy, gx = jnp.meshgrid(jnp.arange(gt4.shape[0]),
                                          jnp.arange(gt4.shape[1]),
                                          indexing="ij")
                    inbox = ((gx >= x0) & (gx < x1) & (gy >= y0)
                             & (gy < y1)).astype(jnp.float32)
                    wmap = inbox + 0.1
                    msk = (optax.sigmoid_binary_cross_entropy(mpred, gt4)
                           * wmap).sum() / jnp.clip(wmap.sum(), 1.0)
                    ok = on[k].astype(jnp.float32)
                    return ok * dfl, ok * msk, ok

                dfls, msks_l, oks = jax.vmap(obj_terms)(jnp.arange(MAXOBJ))
                n = jnp.clip(oks.sum(), 1.0)
                return cls, dfls.sum() / n, msks_l.sum() / n

            cls_i, dfl_i, msk_i = jax.vmap(per_img)(
                logits, boxmap, mcmap, proto, boxes, masks, valid, scale_of)
            total_cls += cls_i.mean()
            total_dfl += dfl_i.mean()
            total_msk += msk_i.mean()
        loss = total_cls + 0.5 * total_dfl + total_msk
        return loss, (total_cls, total_dfl, total_msk)

    @jax.jit
    def step(p, s, rgb, boxes, masks, valid):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rgb, boxes, masks, valid)
        import optax as _ox
        upd, s = opt.update(g, s, p)
        return _ox.apply_updates(p, upd), s, loss, aux

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--out", default="vings_mono_tpu/weights/"
                    "fastsam_selftrained.npz")
    ap.add_argument("--lr", type=float, default=8e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ckpt-every", type=int, default=250)
    args = ap.parse_args()

    enable_compile_cache()
    import optax

    model = FastSAM()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3), np.float32))
    warmup = min(100, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adamw(sched, weight_decay=1e-5))
    opt_state = opt.init(params)
    step = make_step(model, opt)

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

    threading.Thread(target=producer, args=(21,), daemon=True).start()
    while len(pool) < args.batch:
        time.sleep(0.5)

    def save(p):
        flat = jax.tree.map(np.asarray, jax.device_get(p["params"]))
        np.savez(args.out, params=np.asarray(flat, dtype=object))

    brng = np.random.default_rng(31)
    hist = []
    t0 = time.time()
    for it in range(args.steps):
        with lock:
            picks = [pool[i] for i in
                     brng.integers(len(pool), size=args.batch)]
        rgb = jnp.asarray(np.stack([p[0] for p in picks]))
        boxes = jnp.asarray(np.stack([p[1] for p in picks]))
        masks = jnp.asarray(np.stack([p[2] for p in picks]))
        valid = jnp.asarray(np.stack([p[3] for p in picks]))
        params, opt_state, loss, aux = step(params, opt_state, rgb, boxes,
                                            masks, valid)
        hist.append([float(loss)] + [float(a) for a in aux])
        if (it + 1) % 25 == 0:
            m = np.mean(hist[-25:], axis=0)
            print(f"step {it + 1}/{args.steps} loss {m[0]:.4f} "
                  f"cls {m[1]:.4f} dfl {m[2]:.4f} mask {m[3]:.4f} "
                  f"({(time.time() - t0) / (it + 1):.2f}s/it)", flush=True)
        if (it + 1) % args.ckpt_every == 0 or it + 1 == args.steps:
            save(params)
            print(f"saved {args.out} @ step {it + 1}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
