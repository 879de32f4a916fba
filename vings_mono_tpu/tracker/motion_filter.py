"""Per-frame motion gate — rebuild of MotionFilter
(/root/reference/scripts/frontend/motion_filter.py): extract features for
every incoming frame, run one GRU step against the last keyframe, and append
a new keyframe only when the predicted flow magnitude exceeds the threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.droid_net import normalize_image
from ..ops import corr as corr_ops
from ..ops import lie, projective as pops
from .video import DepthVideo


def _cast(tree, bf16):
    if not bf16:
        return tree
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x is not None and x.dtype == jnp.float32 else x, tree)


@functools.partial(jax.jit, static_argnames=("fnet_apply", "bf16"))
def _features(params, fnet_apply, image, bf16=True):
    out = fnet_apply(_cast(params, bf16),
                     _cast(normalize_image(image[None]), bf16))
    return out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cnet_apply", "bf16"))
def _context(params, cnet_apply, image, bf16=True):
    net, inp = cnet_apply(_cast(params, bf16),
                          _cast(normalize_image(image[None]), bf16))
    return net.astype(jnp.float32), inp.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("fnet_apply", "update_apply",
                                             "bf16"))
def _features_and_gate(params, fnet_apply, update_apply, image, fmap_kf,
                       net, inp, bf16=True):
    """fnet + 1-step GRU flow gate fused into ONE program — each separate
    dispatch pays a host->device round trip, and these two run back to back
    every frame (motion_filter.py:75-84)."""
    p = _cast(params, bf16)
    fmap = fnet_apply(p, _cast(normalize_image(image[None]), bf16))
    h, w = fmap.shape[1:3]
    pyr = corr_ops.build_pyramid(fmap_kf.astype(fmap.dtype), fmap)
    coords0 = pops.coords_grid(h, w)[None]
    corr = corr_ops.lookup(pyr, coords0)
    _, delta, _, _, _ = update_apply(p, _cast(net, bf16), _cast(inp, bf16),
                                     _cast(corr, bf16), None, None, 0,
                                     False)
    delta = delta.astype(jnp.float32)
    return fmap.astype(jnp.float32), \
        jnp.mean(jnp.linalg.norm(delta, axis=-1))


class MotionFilter:
    def __init__(self, params, apply_fns, video: DepthVideo, thresh=2.5,
                 bf16=True):
        self.params = params
        self.fnet_apply, self.cnet_apply, self.update_apply = apply_fns
        self.video = video
        self.thresh = thresh
        self.bf16 = bool(bf16)
        self.count = 0
        self.fmap = None
        self.net = None
        self.inp = None

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """image (H, W, 3) float32 RGB in [0,1]; depth (H, W) metric or
        None; intrinsics [fx, fy, cx, cy] at full res."""
        if depth is not None:
            d8 = depth[3::8, 3::8]
            disp_sens = jnp.where(d8 > 0, 1.0 / jnp.clip(d8, 1e-6), 0.0)
        else:
            disp_sens = jnp.zeros((image.shape[0] // 8,
                                   image.shape[1] // 8), jnp.float32)

        if self.video.counter == 0:
            fmap = _features(self.params, self.fnet_apply, image,
                             bf16=self.bf16)
            fm, net, inp = self._full_context(image, fmap)
            self.video.append(tstamp, image, lie.se3_identity(),
                              jnp.ones_like(disp_sens), disp_sens,
                              intrinsics, fmap[0], net[0], inp[0])
            return True

        if self.thresh < 0:
            # gate disabled (every frame is a keyframe): skip the flow
            # magnitude entirely — float(mag) is a device sync the host
            # would otherwise pay every frame
            fmap = _features(self.params, self.fnet_apply, image,
                             bf16=self.bf16)
            mag = float("inf")
        else:
            fmap, mag_dev = _features_and_gate(
                self.params, self.fnet_apply, self.update_apply, image,
                self.fmap, self.net, self.inp, bf16=self.bf16)
            # issue the d2h DMA request now, while the program is still in
            # flight — float() then waits on compute only, instead of
            # paying an extra transfer-request round trip through the
            # tunnel after compute finishes
            mag_dev.copy_to_host_async()
            mag = float(mag_dev)
        if mag > self.thresh:
            self.count = 0
            fm, net, inp = self._full_context(image, fmap)
            self.video.append(tstamp, image, None, None, disp_sens,
                              intrinsics, fmap[0], net[0], inp[0])
            return True
        self.count += 1
        return False

    def _full_context(self, image, fmap):
        net, inp = _context(self.params, self.cnet_apply, image,
                            bf16=self.bf16)
        self.fmap, self.net, self.inp = fmap, net, inp
        return fmap, net, inp
