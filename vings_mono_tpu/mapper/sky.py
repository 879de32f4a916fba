"""Sky model — a separate Gaussian sphere for sky pixels, rebuild of
SkyModel (/root/reference/scripts/gaussian/sky_utils.py): points live on a
radius-10 direction sphere around the camera path (parameters store raw
directions; rendering normalizes and scales), trained jointly with the main
map and alpha-composited behind it."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.rasterizer import Camera, render
from .cameras import backproject
from .densify import inverse_sigmoid
from .state import (GaussianState, SparseAdamState, empty_state, adam_init,
                    sparse_adam_step, write_rows)
from ..ops.knn import knn_mean_sq_dist

SPHERE_RADIUS = 10.0


def sky_render_params(state: GaussianState):
    """Activated sky geometry: directions -> radius-10 sphere; scales get
    the same radius multiplier (sky_utils.py:31-35)."""
    nrm = jnp.sqrt(jnp.sum(state.xyz ** 2, axis=-1, keepdims=True)
                   + 1e-12)
    xyz = state.xyz / nrm * SPHERE_RADIUS
    log_scale = state.log_scale + jnp.log(SPHERE_RADIUS)
    return xyz, log_scale


def render_sky(state: GaussianState, camera: Camera, score_carrier=None,
               **rkw):
    xyz, log_scale = sky_render_params(state)
    return render(xyz, log_scale, state.quat, state.logit_opacity,
                  state.rgb, camera, alive=state.alive,
                  score_carrier=score_carrier, **rkw)


def fuse_rgb(pred_main, pred_sky):
    """Composite the sky sphere behind the map (sky_utils.py fuse_rgb)."""
    return pred_main["rgb"] + (1.0 - pred_main["accum"]) * pred_sky["rgb"]


@functools.partial(jax.jit, static_argnames=("n_points", "height", "width"))
def sky_add_frame(state: GaussianState, opt: SparseAdamState, w2c, intr4,
                  gt_rgb, key, *, height: int, width: int, n_points=1000):
    """Sample sky pixels (gt rgb summing to 0 after the middleware's
    zero-out) as unit directions from the camera center."""
    from .cameras import make_camera
    camera = make_camera(w2c, intr4, height, width)
    c2w = jnp.linalg.inv(w2c)
    sky_mask = jnp.sum(gt_rgb, axis=0) == 0.0     # (H, W)
    gumbel = jax.random.gumbel(key, (height * width,))
    scores = jnp.where(sky_mask.reshape(-1), gumbel, -jnp.inf)
    _, flat_idx = jax.lax.top_k(scores, n_points)
    n_eff = jnp.minimum(jnp.sum(sky_mask), n_points)
    valid_new = (jnp.arange(n_points) < n_eff) & \
        sky_mask.reshape(-1)[flat_idx]

    depth = jnp.ones((height, width), jnp.float32)
    pts = backproject(depth, camera, c2w)[flat_idx]
    dirs = pts - c2w[:3, 3]
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                           1e-6)
    rgb = jnp.moveaxis(gt_rgb, 0, -1).reshape(-1, 3)[flat_idx]
    d2 = jnp.clip(knn_mean_sq_dist(dirs, valid_new), 1e-7)
    params = {
        "xyz": dirs,
        "rgb": rgb,
        "quat": jax.random.normal(jax.random.fold_in(key, 1),
                                  (n_points, 4)),
        "log_scale": jnp.log(jnp.sqrt(d2))[:, None].repeat(2, axis=1),
        "logit_opacity": jnp.full((n_points, 1), inverse_sigmoid(0.1),
                                  jnp.float32),
    }
    from .densify import dead_slots
    slots, ok = dead_slots(state, n_points)
    valid_new = valid_new & ok
    state, opt = write_rows(state, opt, slots, valid_new, params, 0)
    return state, opt, jnp.sum(valid_new.astype(jnp.int32))


class SkyModel:
    """Host wrapper holding the sky state + its sparse Adam."""

    def __init__(self, cfg, capacity=1 << 15):
        self.cfg = cfg
        self.state = empty_state(capacity)
        self.opt = adam_init(self.state)

    def add_frame(self, w2c, intr4, gt_rgb, key, height, width,
                  n_points=1000):
        # the per-frame sample budget can't exceed the sphere's capacity
        n_points = min(int(n_points), self.state.capacity)
        self.state, self.opt, n = sky_add_frame(
            self.state, self.opt, w2c, intr4, gt_rgb, key,
            height=height, width=width, n_points=n_points)
        return int(n)
