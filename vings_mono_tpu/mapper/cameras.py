"""Camera construction and dense back-projection for the mapper.

The reference's intrinsic dict uses row-major names: fu/cu act on image rows
(v ~ y) and fv/cv on columns (u ~ x) — see TFer (/root/reference/scripts/
gaussian/tf.py:62-71). Internally we use standard fx, fy, cx, cy; this module
is the boundary where the convention is converted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.rasterizer import Camera


def make_camera(w2c, intr4, height: int, width: int) -> Camera:
    """intr4 = [fx, fy, cx, cy]; height/width must be static ints (jit)."""
    fx, fy, cx, cy = intr4
    return Camera(w2c=w2c, fx=fx, fy=fy, cx=cx, cy=cy,
                  height=height, width=width)


def camera_from_intrinsic(w2c, intr: dict) -> Camera:
    """intr: reference-style {'fu','fv','cu','cv','H','W'} (fu/cu = rows)."""
    return Camera(w2c=jnp.asarray(w2c, jnp.float32),
                  fx=jnp.asarray(intr["fv"], jnp.float32),
                  fy=jnp.asarray(intr["fu"], jnp.float32),
                  cx=jnp.asarray(intr["cv"], jnp.float32),
                  cy=jnp.asarray(intr["cu"], jnp.float32),
                  height=int(intr["H"]), width=int(intr["W"]))


def backproject(depth, camera: Camera, c2w):
    """depth (H, W) -> world points (H*W, 3) (zero-depth rows stay at the
    camera center; mask with depth>0)."""
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = (xs - camera.cx) / camera.fx * depth
    y = (ys - camera.cy) / camera.fy * depth
    pts_cam = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    return pts_cam @ R.T + t


def project_points(xyz, camera: Camera):
    """World points (N, 3) -> (px, py, z_cam) each (N,)."""
    R = camera.w2c[:3, :3]
    t = camera.w2c[:3, 3]
    pc = xyz @ R.T + t
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    px = camera.fx * pc[:, 0] / zs + camera.cx
    py = camera.fy * pc[:, 1] / zs + camera.cy
    return px, py, z


def depth_to_normal(depth, camera: Camera):
    """Central-difference normals from a depth map, camera frame (H, W, 3).

    Mirrors depth_propagate_normal (/root/reference/scripts/gaussian/
    normal_utils.py:6-21): cross(left->right, bottom->top), zero border.
    """
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = (xs - camera.cx) / camera.fx * depth
    y = (ys - camera.cy) / camera.fy * depth
    p = jnp.stack([x, y, depth], axis=-1)   # (H, W, 3)
    l2r = p[1:-1, 2:, :] - p[1:-1, :-2, :]
    b2t = p[:-2, 1:-1, :] - p[2:, 1:-1, :]
    n = jnp.cross(l2r, b2t)
    # smooth normalization — linalg.norm has NaN gradients at exact zeros
    # (empty regions render depth 0 -> zero cross products)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))
