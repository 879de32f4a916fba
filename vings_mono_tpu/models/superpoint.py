"""SuperPoint keypoint detector + descriptor in flax (NHWC).

TPU-native replacement for the reference's ONNX-Runtime SuperPoint session
(/root/reference/scripts/loop/lightglue.py:12-24). Standard public
architecture: shared VGG encoder (64-64-128-128 with 3 pools at 1/8),
detector head (65ch cell softmax -> depth-to-space heatmap) and descriptor
head (256ch, bicubic-upsampled per keypoint, L2-normalized).

`convert_superpoint_checkpoint` maps the public superpoint_v1.pth torch
weights onto this module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv(ch, k, name):
    pad = (k - 1) // 2
    return nn.Conv(ch, (k, k), padding=((pad, pad), (pad, pad)), name=name)


class SuperPoint(nn.Module):
    with_logits: bool = False   # training: also return the 65-way logits

    @nn.compact
    def __call__(self, image):
        """image (B, H, W, 1) grayscale in [0,1] ->
        (scores (B, H, W), desc_map (B, H/8, W/8, 256) L2-normalized)."""
        x = image
        relu = nn.relu
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        x = relu(_conv(64, 3, "conv1a")(x))
        x = relu(_conv(64, 3, "conv1b")(x))
        x = pool(x)
        x = relu(_conv(64, 3, "conv2a")(x))
        x = relu(_conv(64, 3, "conv2b")(x))
        x = pool(x)
        x = relu(_conv(128, 3, "conv3a")(x))
        x = relu(_conv(128, 3, "conv3b")(x))
        x = pool(x)
        x = relu(_conv(128, 3, "conv4a")(x))
        x = relu(_conv(128, 3, "conv4b")(x))

        # detector head
        d = relu(_conv(256, 3, "convPa")(x))
        logits = _conv(65, 1, "convPb")(d)          # (B, h, w, 65)
        prob = jax.nn.softmax(logits, axis=-1)[..., :64]
        B, h, w, _ = prob.shape
        heat = prob.reshape(B, h, w, 8, 8)
        heat = jnp.transpose(heat, (0, 1, 3, 2, 4)).reshape(B, h * 8, w * 8)

        # descriptor head
        e = relu(_conv(256, 3, "convDa")(x))
        desc = _conv(256, 1, "convDb")(e)
        desc = desc / jnp.clip(jnp.linalg.norm(desc, axis=-1,
                                               keepdims=True), 1e-8)
        if self.with_logits:
            return heat, desc, logits
        return heat, desc


def nms_keypoints(heat, max_kp=512, nms_radius=4, threshold=0.005):
    """Top-K keypoints after local-max suppression.

    heat (H, W) -> (xy (max_kp, 2) float, score (max_kp,), valid)."""
    H, W = heat.shape
    k = 2 * nms_radius + 1
    m = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max, (k, k), (1, 1),
                              "SAME")
    keep = (heat == m) & (heat > threshold)
    flat = jnp.where(keep.reshape(-1), heat.reshape(-1), 0.0)
    score, idx = jax.lax.top_k(flat, max_kp)
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=-1)
    return xy, score, score > 0


def sample_descriptors(xy, desc_map, img_hw):
    """Bilinear descriptor sampling at pixel coords (N,2); desc_map
    (h, w, 256) at 1/8 resolution."""
    H, W = img_hw
    h, w, C = desc_map.shape
    gx = xy[:, 0] / 8.0 - 0.5
    gy = xy[:, 1] / 8.0 - 0.5
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(gx - x0, 0, 1)[:, None]
    fy = jnp.clip(gy - y0, 0, 1)[:, None]
    d00 = desc_map[y0, x0]
    d01 = desc_map[y0, x0 + 1]
    d10 = desc_map[y0 + 1, x0]
    d11 = desc_map[y0 + 1, x0 + 1]
    d = (1 - fy) * ((1 - fx) * d00 + fx * d01) + \
        fy * ((1 - fx) * d10 + fx * d11)
    return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


def mutual_nearest_match(desc1, desc2, valid1, valid2, ratio=0.95,
                         min_score=0.2):
    """Mutual-NN descriptor matching with a distance-ratio check — the
    matching backend when no LightGlue weights are available.

    Returns (idx2_for_1 (N1,), match_valid (N1,))."""
    sim = desc1 @ desc2.T                           # cosine (unit descs)
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, -1e9)
    best12 = jnp.argmax(sim, axis=1)
    best21 = jnp.argmax(sim, axis=0)
    mutual = jnp.arange(desc1.shape[0]) == best21[best12]
    s1 = jnp.max(sim, axis=1)
    # ratio: best vs second best
    sim2 = sim.at[jnp.arange(sim.shape[0]), best12].set(-1e9)
    s2 = jnp.max(sim2, axis=1)
    ok = mutual & (s1 > min_score) & (s2 < s1 * (2 - ratio)) & valid1
    return best12, ok


# ---------------------------------------------------------------------------

def convert_superpoint_checkpoint(sd):
    """Public superpoint_v1.pth torch state_dict -> flax variables."""
    import numpy as np

    def conv(name):
        w = np.transpose(np.asarray(sd[name + ".weight"]), (2, 3, 1, 0))
        return {"kernel": w, "bias": np.asarray(sd[name + ".bias"])}

    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    return {"params": {n: conv(n) for n in names}}


def load_superpoint(path=None):
    model = SuperPoint()
    if path is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 1)))
        return model, params
    if str(path).endswith(".npz"):
        # self-trained flax weights (scripts/train_superpoint.py)
        from .droid_net import load_flax_weights
        return model, load_flax_weights(path)
    if str(path).endswith(".onnx"):
        # the reference ships SuperPoint as .onnx (loop/lightglue.py:12)
        from ..utils.onnx_weights import load_onnx_initializers
        sd = load_onnx_initializers(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    return model, convert_superpoint_checkpoint(sd)
