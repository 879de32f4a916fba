"""Keyframe-driven prune + densify — rebuild of GaussianModel.init_first_frame
/ add_new_frame (/root/reference/scripts/gaussian/gaussian_model.py:36-161)
as pure jitted functions over the capacity-capped state.

Shapes are static: every densification call samples exactly M_CAP candidate
pixels (gumbel top-k over the eligible mask) and marks the tail invalid so
the *count* matches the reference's fraction-scaled budget
(gaussian_utils.py:31-38). Insertion targets the first dead slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.knn import knn_mean_sq_dist
from ..ops.rasterizer import render, Camera
from .cameras import backproject, project_points
from .state import GaussianState, SparseAdamState, write_rows, kill_rows


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def sample_pointcloud(key, camera: Camera, c2w, gt_rgb, gt_depth, pred_accum,
                      n_points: int, accum_thresh: float = 0.5):
    """Reference get_pointcloud_v1 (gaussian_utils.py:19-49): sample
    uniformly over valid-depth pixels; the *count* is scaled by the fraction
    of pixels not yet covered (accum < thresh).

    gt_rgb (3,H,W), gt_depth (1,H,W), pred_accum (1,H,W) or None.
    Returns dict of (n_points, ...) arrays + valid mask (n_points,).
    """
    H, W = gt_depth.shape[-2:]
    depth = gt_depth[0]
    valid = depth > 0
    if pred_accum is None:
        uncovered = valid
    else:
        uncovered = valid & (pred_accum[0] <= accum_thresh)
    n_valid = jnp.sum(valid)
    n_eff = jnp.floor(jnp.sum(uncovered) / jnp.clip(n_valid, 1)
                      * n_points).astype(jnp.int32)

    # gumbel top-k = uniform sample without replacement over valid pixels
    gumbel = jax.random.gumbel(key, (H * W,))
    scores = jnp.where(valid.reshape(-1), gumbel, -jnp.inf)
    _, flat_idx = jax.lax.top_k(scores, n_points)
    valid_new = (jnp.arange(n_points) < n_eff) & \
        valid.reshape(-1)[flat_idx]

    pts_world = backproject(depth, camera, c2w)[flat_idx]
    rgb = jnp.moveaxis(gt_rgb, 0, -1).reshape(-1, 3)[flat_idx]
    quat = jax.random.normal(jax.random.fold_in(key, 1), (n_points, 4))
    return pts_world, rgb, quat, valid_new


def make_new_params(key, camera, c2w, gt_rgb, gt_depth, pred_accum, n_points,
                    opacity, accum_thresh=0.5):
    xyz, rgb, quat, valid_new = sample_pointcloud(
        key, camera, c2w, gt_rgb, gt_depth, pred_accum, n_points,
        accum_thresh)
    d2 = jnp.clip(knn_mean_sq_dist(xyz, valid_new), 1e-7)
    log_scale = jnp.log(jnp.sqrt(d2))[:, None].repeat(2, axis=1)
    params = {
        "xyz": xyz,
        "rgb": rgb,
        "quat": quat,
        "log_scale": log_scale,
        "logit_opacity": jnp.full((n_points, 1), inverse_sigmoid(opacity),
                                  jnp.float32),
    }
    return params, valid_new


def dead_slots(state: GaussianState, n: int):
    """First n dead slots (stable argsort puts alive=False first)."""
    order = jnp.argsort(state.alive, stable=True)
    slots = order[:n]
    ok = ~state.alive[slots]
    return slots.astype(jnp.int32), ok


@functools.partial(jax.jit, static_argnames=("n_points", "first", "height",
                                             "width", "render_kwargs"),
                   donate_argnums=(0, 1))
def add_frame(state: GaussianState, opt: SparseAdamState, w2c, intr4,
              gt_rgb, gt_depth, key, global_kf_id, *, height: int,
              width: int, n_points=40000, first=False, opacity=0.8,
              accum_thresh=0.5, rgb_err_thresh=0.15, max_radii=25.0,
              render_kwargs=()):
    """Prune floaters + densify uncovered regions for one new keyframe.

    first=True skips pruning and uses opacity 0.1 (init_first_frame).
    Returns (state, opt, n_inserted, n_killed).
    """
    from .cameras import make_camera
    camera = make_camera(w2c, intr4, height, width)
    c2w = jnp.linalg.inv(w2c)
    rkw = dict(render_kwargs)
    n_killed = jnp.zeros((), jnp.int32)
    if not first:
        # ONE binning serves both renders: the prune between them only
        # flips `alive`, and killed rows re-project to zero opacity
        # (projection.py gates the packed payload by alive), so the cached
        # pair list stays valid — halves the dominant binning cost here
        if rkw.get("impl", "tile") == "tile":
            from ..ops.rasterizer import bin_for_camera
            rkw["binned"] = bin_for_camera(
                state.xyz, state.log_scale, state.quat,
                state.logit_opacity, state.rgb, camera, alive=state.alive,
                need_grad=False,
                **{k: rkw[k] for k in ("p_cap", "chunk", "side", "v_cap",
                                       "tile_cap")
                   if k in rkw})
        rets = render(state.xyz, state.log_scale, state.quat,
                      state.logit_opacity, state.rgb, camera,
                      alive=state.alive, **rkw)
        pred_rgb = jax.lax.stop_gradient(rets["rgb"])
        pred_depth = jax.lax.stop_gradient(rets["depth"])
        res_rgb = jnp.sum(jnp.abs(pred_rgb - gt_rgb), axis=0)     # (H, W)
        delete_pix = (pred_depth[0] < 1.5 * gt_depth[0]) & \
            (res_rgb > rgb_err_thresh)
        px, py, z = project_points(state.xyz, camera)
        ix = jnp.clip(px.astype(jnp.int32), 0, camera.width - 1)
        iy = jnp.clip(py.astype(jnp.int32), 0, camera.height - 1)
        in_img = (px > 0) & (px < camera.width - 1) & (py > 0) & \
            (py < camera.height - 1) & (z > 0.01)
        hit = delete_pix[iy, ix]
        kill = state.alive & ((in_img & hit) | (rets["radii"] > max_radii))
        n_killed = jnp.sum(kill.astype(jnp.int32))
        state = kill_rows(state, kill)

        rets2 = render(state.xyz, state.log_scale, state.quat,
                       state.logit_opacity, state.rgb, camera,
                       alive=state.alive, **rkw)
        accum = jax.lax.stop_gradient(rets2["accum"])
        depth_err = jnp.abs(jax.lax.stop_gradient(rets2["depth"]) - gt_depth)
        rgb_err = jnp.sum(jnp.abs(jax.lax.stop_gradient(rets2["rgb"])
                                  - gt_rgb), axis=0, keepdims=True)
        med = jnp.median(depth_err)
        accum = jnp.where(depth_err > 10.0 * med, 0.0, accum)
        accum = jnp.where(rgb_err > 0.1, 0.0, accum)
    else:
        accum = None

    new_params, valid_new = make_new_params(
        key, camera, c2w, gt_rgb, gt_depth, accum, n_points,
        0.1 if first else opacity, accum_thresh)
    slots, ok = dead_slots(state, n_points)
    valid_new = valid_new & ok
    state, opt = write_rows(state, opt, slots, valid_new, new_params,
                            global_kf_id)
    return state, opt, jnp.sum(valid_new.astype(jnp.int32)), n_killed
