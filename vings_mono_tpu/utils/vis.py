"""Visualization outputs — rebuild of the reference's vis_utils
(/root/reference/scripts/gaussian/vis_utils.py): the rgbdnua 2x4 debug panel
(+ per-frame c2w txt / keyframelist side effects handled by
utils/trajectory.py), whole-map BEV renders with time-colored trajectory,
and the follow-cam BEV. All drawing is cv2/numpy on host; rendering is the
normal TPU path."""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def colorize(x, vmin=None, vmax=None, cmap="magma"):
    """(H, W) -> (H, W, 3) uint8 via matplotlib colormap (grayscale
    fallback)."""
    x = np.asarray(x, np.float32)
    vmin = np.nanmin(x) if vmin is None else vmin
    vmax = np.nanmax(x) if vmax is None else vmax
    t = np.clip((x - vmin) / max(vmax - vmin, 1e-8), 0, 1)
    try:
        import matplotlib.cm as cm
        rgba = __import__("matplotlib").colormaps[cmap](t)
        return (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:
        g = (t * 255).astype(np.uint8)
        return np.stack([g, g, g], -1)


def _chw_to_img(x):
    return np.clip(np.moveaxis(np.asarray(x), 0, -1), 0, 1)


def rgbdnua_panel(pred, gt_rgb, gt_depth, gt_cov=None):
    """2x4 panel: [gt rgb | pred rgb | gt depth | pred depth] over
    [rendered normal | surf normal from depth | uncertainty | accum].
    pred: render() rets dict; gt_* channel-first arrays. Returns uint8
    image."""
    H, W = np.asarray(pred["depth"]).shape[-2:]
    gt_rgb_i = (_chw_to_img(gt_rgb) * 255).astype(np.uint8)
    pred_rgb_i = (_chw_to_img(pred["rgb"]) * 255).astype(np.uint8)
    dmax = max(float(np.max(np.asarray(gt_depth))), 1e-3)
    gt_d = colorize(np.asarray(gt_depth)[0], 0, dmax)
    pr_d = colorize(np.asarray(pred["depth"])[0], 0, dmax)
    nrm = ((np.moveaxis(np.asarray(pred["normal"]), 0, -1) * 0.5 + 0.5)
           * 255).astype(np.uint8)
    from ..mapper.cameras import depth_to_normal
    import jax.numpy as jnp
    acc = colorize(np.asarray(pred["accum"])[0], 0, 1, "viridis")
    if gt_cov is not None:
        unc = colorize(np.asarray(gt_cov)[0], cmap="viridis")
    else:
        unc = np.zeros_like(gt_rgb_i)
    dist = colorize(np.asarray(pred["dist"])[0], cmap="viridis")
    top = np.concatenate([gt_rgb_i, pred_rgb_i, gt_d, pr_d], axis=1)
    bottom = np.concatenate([nrm, dist, unc, acc], axis=1)
    return np.concatenate([top, bottom], axis=0)


def save_rgbdnua(save_dir, frame_id, pred, gt_rgb, gt_depth, gt_cov=None):
    os.makedirs(os.path.join(save_dir, "rgbdnua"), exist_ok=True)
    panel = rgbdnua_panel(pred, gt_rgb, gt_depth, gt_cov)
    path = os.path.join(save_dir, "rgbdnua", f"{float(frame_id):.6f}.png")
    if cv2 is not None:
        cv2.imwrite(path, panel[..., ::-1])
    return path


def get_bev_c2w(c2ws, height_scale=1.5, min_height=10.0):
    """Bird's-eye camera above the trajectory centroid looking down
    (vis_utils.py get_bev_c2w spirit: frame the whole path)."""
    pos = np.asarray(c2ws)[:, :3, 3]
    center = pos.mean(0)
    extent = float(np.max(pos.max(0) - pos.min(0))) if len(pos) > 1 else 1.0
    h = max(extent * height_scale, min_height)
    # camera looks along +z (camera frame) at the scene: place it "above"
    # along the -y world axis of the first camera's up direction
    up_w = -np.asarray(c2ws)[0][:3, 1]
    eye = center + up_w * h
    z = center - eye
    z = z / np.linalg.norm(z)
    x_ref = np.asarray(c2ws)[0][:3, 0]
    x = x_ref - (x_ref @ z) * z
    x = x / max(np.linalg.norm(x), 1e-8)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def draw_trajectory(img, c2ws, bev_w2c, intr4, color_by_time=True):
    """Project camera centers into the BEV image and draw time-colored
    dots (vis_map's pose frustums, vis_utils.py:322-462)."""
    if cv2 is None or len(c2ws) == 0:
        return img
    fx, fy, cx, cy = intr4
    pos = np.asarray(c2ws)[:, :3, 3]
    pc = (np.asarray(bev_w2c)[:3, :3] @ pos.T).T + np.asarray(
        bev_w2c)[:3, 3]
    n = len(pos)
    for k, p in enumerate(pc):
        if not np.all(np.isfinite(p)) or p[2] <= 0.1:
            continue
        u = int(fx * p[0] / p[2] + cx)
        v = int(fy * p[1] / p[2] + cy)
        if 0 <= u < img.shape[1] and 0 <= v < img.shape[0]:
            t = k / max(n - 1, 1)
            col = (int(255 * (1 - t)), 64, int(255 * t))
            cv2.circle(img, (u, v), 2, col, -1)
    return img


def vis_map(mapper, c2ws, save_path, size=(480, 640), storage=None):
    """Whole-map BEV render + trajectory overlay. With a storage manager,
    host-paged Gaussians are composited chunk-wise by max alpha
    (storage_manage.py:110-238)."""
    import jax.numpy as jnp
    H, W = size
    bev_c2w = get_bev_c2w(c2ws)
    w2c = np.linalg.inv(bev_c2w)
    f = 0.7 * W
    intr = {"fu": f, "fv": f, "cu": H / 2, "cv": W / 2, "H": H, "W": W}
    rets = mapper.render_at(w2c, intr)
    rgb = np.asarray(rets["rgb"])
    alpha = np.asarray(rets["accum"])

    if storage is not None and storage.n_host > 0:
        from ..ops.rasterizer import render as raw_render
        from ..mapper.cameras import camera_from_intrinsic
        cam = camera_from_intrinsic(jnp.asarray(w2c, jnp.float32), intr)
        chunk = 1 << 17
        for s0 in range(0, storage.n_host, chunk):
            e0 = min(s0 + chunk, storage.n_host)
            r = raw_render(
                jnp.asarray(storage.host["xyz"][s0:e0]),
                jnp.asarray(storage.host["log_scale"][s0:e0]),
                jnp.asarray(storage.host["quat"][s0:e0]),
                jnp.asarray(storage.host["logit_opacity"][s0:e0]),
                jnp.asarray(storage.host["rgb"][s0:e0]), cam,
                **dict(mapper.render_kwargs))
            a2 = np.asarray(r["accum"])
            take = a2 > alpha
            rgb = np.where(take, np.asarray(r["rgb"]), rgb)
            alpha = np.where(take, a2, alpha)

    img = (np.clip(np.moveaxis(rgb, 0, -1), 0, 1) * 255).astype(np.uint8)
    img = np.ascontiguousarray(img)
    draw_trajectory(img, c2ws, w2c, (f, f, W / 2, H / 2))
    if cv2 is not None and save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        cv2.imwrite(save_path, img[..., ::-1])
    return img


def vis_bev(mapper, cur_c2w, save_path, size=(320, 320), height=12.0):
    """Follow-cam BEV above the current pose (vis_utils.py:495+)."""
    H, W = size
    c2w = np.asarray(cur_c2w).copy()
    eye = c2w[:3, 3] - c2w[:3, 1] * height
    z = c2w[:3, 3] - eye
    z = z / np.linalg.norm(z)
    x = c2w[:3, 0] - (c2w[:3, 0] @ z) * z
    x /= max(np.linalg.norm(x), 1e-8)
    y = np.cross(z, x)
    bev = np.eye(4)
    bev[:3, 0], bev[:3, 1], bev[:3, 2], bev[:3, 3] = x, y, z, eye
    f = 0.8 * W
    intr = {"fu": f, "fv": f, "cu": H / 2, "cv": W / 2, "H": H, "W": W}
    rets = mapper.render_at(np.linalg.inv(bev), intr)
    img = (np.clip(np.moveaxis(np.asarray(rets["rgb"]), 0, -1), 0, 1)
           * 255).astype(np.uint8)
    if cv2 is not None and save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        cv2.imwrite(save_path, img[..., ::-1])
    return img
