"""Synthetic viz_out generator for mapper/pipeline tests: a ground-truth
Gaussian scene rendered from several poses by the (validated) naive renderer
stands in for the tracker's output."""

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.ops import lie
from vings_mono_tpu.ops.rasterizer import Camera, render


def gt_scene(rng, n=400, H=32, W=32, f=30.0):
    """A colored wall of surfels at z ~ 4-6 plus a floor."""
    z = rng.uniform(4.0, 6.0, size=n).astype(np.float32)
    x = (rng.uniform(0, 1, size=n) - 0.5) * z * W / f * 1.2
    y = (rng.uniform(0, 1, size=n) - 0.5) * z * H / f * 1.2
    xyz = jnp.asarray(np.stack([x, y, z], -1))
    log_scale = jnp.asarray(np.log(rng.uniform(0.15, 0.4, size=(n, 2))),
                            jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)) * 0.1
                       + np.array([1, 0, 0, 0]), jnp.float32)
    logit_op = jnp.full((n, 1), 3.0, jnp.float32)   # mostly opaque
    rgb = jnp.asarray(rng.uniform(0.1, 0.9, size=(n, 3)), jnp.float32)
    return (xyz, log_scale, quat, logit_op, rgb)


def camera_at(w2c, H=32, W=32, f=30.0):
    return Camera(w2c=jnp.asarray(w2c, jnp.float32), fx=jnp.float32(f),
                  fy=jnp.float32(f), cx=jnp.float32(W / 2),
                  cy=jnp.float32(H / 2), height=H, width=W)


def make_viz_out(rng, n_kf=3, H=32, W=32, f=30.0, n_gauss=400):
    params = gt_scene(rng, n=n_gauss, H=H, W=W, f=f)
    images, depths, covs, poses = [], [], [], []
    for k in range(n_kf):
        xi = jnp.asarray(np.concatenate([
            rng.normal(size=3) * 0.05 + np.array([0.15 * k, 0, 0]),
            rng.normal(size=3) * 0.01]), jnp.float32)
        w2c_pose = lie.se3_exp(xi)
        w2c = np.asarray(lie.se3_matrix(w2c_pose))
        cam = camera_at(w2c, H, W, f)
        r = render(*params, cam, impl="naive")
        img = np.array(np.moveaxis(np.asarray(r["rgb"]), 0, -1))
        depth = np.array(np.moveaxis(np.asarray(r["depth"]), 0, -1))
        # zero-out rgb at invalid depth like the middleware does
        depth[np.asarray(r["accum"][0]) < 0.5] = 0.0
        img[depth[..., 0] == 0] = 0.0
        images.append(img)
        depths.append(depth)
        covs.append(np.full_like(depth, 0.01))
        poses.append(np.linalg.inv(w2c))
    return {
        "images": np.stack(images),
        "depths": np.stack(depths),
        "depths_cov": np.stack(covs),
        "poses": np.stack(poses),
        "viz_out_idx_to_f_idx": np.arange(n_kf, dtype=np.float64),
        "intrinsic": {"fu": f, "fv": f, "cu": H / 2, "cv": W / 2,
                      "H": H, "W": W},
        "pixel_mask": np.ones((n_kf, H, W), bool),
        "global_kf_id": np.arange(n_kf, dtype=np.int64),
    }, params
