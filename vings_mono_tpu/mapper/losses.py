"""Mapper training loss — rebuild of get_loss (/root/reference/scripts/
gaussian/loss_utils.py:110-153): masked L1+SSIM rgb, depth-covariance-
weighted L1 depth, normal consistency vs depth-propagated normals, sky alpha
suppression, and the 2DGS distortion regularizer."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim
from .cameras import Camera, depth_to_normal

DEFAULT_WEIGHTS = {
    "rgb_loss": 1.0,
    "depth_loss": 0.1,
    "normal_loss": 0.05,
    "alpha_loss": 0.1,
    "dist_loss": 100.0,
}


def masked_l1(pred, gt, mask):
    m = mask.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - gt) * m[None]) / jnp.clip(
        jnp.sum(m) * pred.shape[0], 1.0)


def weighted_masked_l1(pred, gt, mask, weight):
    m = mask.astype(pred.dtype) * weight
    return jnp.sum(jnp.abs(pred - gt) * m) / jnp.clip(jnp.sum(m), 1.0)


def mapper_loss(pred, gt_rgb, gt_depth, gt_depth_cov, camera: Camera,
                weights=None, w2c=None, sky_rgb=None, pixel_mask=None):
    """pred: render() dict (camera-frame normals); gt_rgb (3,H,W) in [0,1],
    gt_depth/cov (1,H,W). Returns (total, metrics dict).

    Matches the reference semantics: sky pixels are where gt_rgb sums to 0
    (middleware zeroes rgb at invalid depth, middleware_utils.py:186);
    valid = not sky and depth > 0; depth is weighted by 1/cov
    (loss_utils.py:132-133). pixel_mask (H,W) bool excludes dynamic-object
    pixels from every term (the reference multiplies get_loss's mask by
    viz_out['pixel_mask'], loss_utils.py:118 + middleware pixel_mask)."""
    weights = {**DEFAULT_WEIGHTS, **(weights or {})}
    sky = jnp.sum(gt_rgb, axis=0) == 0.0          # (H, W)
    valid = (~sky) & (gt_depth[0] > 0.0)
    if pixel_mask is not None:
        valid &= pixel_mask
        sky &= pixel_mask

    if sky_rgb is not None:
        # sky mode: full-image photometric loss against the sky-inclusive
        # ground truth (loss_utils.py:122-124)
        ones = jnp.ones_like(valid) if pixel_mask is None else pixel_mask
        l1 = masked_l1(pred["rgb"], sky_rgb, ones)
        ssim_val = ssim(pred["rgb"], sky_rgb, ones)
    else:
        l1 = masked_l1(pred["rgb"], gt_rgb, valid)
        ssim_val = ssim(pred["rgb"], gt_rgb, valid)
    rgb_loss = 0.8 * l1 + 0.2 * (1.0 - ssim_val)

    # normal consistency: rendered normal vs normals from the rendered depth
    # (both camera frame here; the reference compares world-frame — the dot
    # product is rotation invariant so the value is identical)
    surf_n = depth_to_normal(pred["depth"][0], camera)          # (H, W, 3)
    rend_n = jnp.moveaxis(pred["normal"], 0, -1)                # (H, W, 3)
    normal_loss = jnp.sum((1.0 - jnp.sum(rend_n * surf_n, axis=-1))
                          * valid) / jnp.clip(jnp.sum(valid), 1.0)

    alpha_loss = jnp.sum(pred["accum"][0] * sky) / jnp.clip(jnp.sum(sky), 1.0)

    inv_cov = 1.0 / jnp.clip(gt_depth_cov, 1e-8)
    depth_loss = weighted_masked_l1(pred["depth"], gt_depth, valid[None],
                                    inv_cov)

    dist_loss = jnp.sum(pred["dist"][0] * valid) / jnp.clip(jnp.sum(valid),
                                                            1.0)

    total = (weights["rgb_loss"] * rgb_loss
             + weights["normal_loss"] * normal_loss
             + weights["alpha_loss"] * alpha_loss
             + weights["depth_loss"] * depth_loss
             + weights["dist_loss"] * dist_loss)
    metrics = {"rgb": rgb_loss, "l1": l1, "ssim": ssim_val,
               "normal": normal_loss, "alpha": alpha_loss,
               "depth": depth_loss, "dist": dist_loss, "total": total}
    return total, metrics


def psnr(pred_rgb, gt_rgb, mask=None):
    """Matches calc_psnr (/root/reference/scripts/gaussian/vis_utils.py:313)."""
    if mask is None:
        mse = jnp.mean((pred_rgb - gt_rgb) ** 2)
    else:
        m = mask.astype(pred_rgb.dtype)
        mse = jnp.sum(((pred_rgb - gt_rgb) ** 2) * m[None]) / jnp.clip(
            jnp.sum(m) * pred_rgb.shape[0], 1.0)
    return -10.0 * jnp.log10(jnp.clip(mse, 1e-12))
