"""DROID-SLAM RAFT-GRU network in flax (NHWC, TPU layout).

Faithful re-implementation of the reference architecture so pretrained
`droid.pth` weights convert 1:1 (/root/reference/scripts/frontend/
droid_net.py, modules/extractor.py, modules/gru.py):
  * fnet: BasicEncoder(output 128, instance norm), 1/8 resolution
  * cnet: BasicEncoder(output 256, no norm) -> tanh(net 128) / relu(inp 128)
  * UpdateModule: corr encoder (4*49 -> 128), flow encoder (4 -> 64),
    ConvGRU with global context, delta/weight heads (2ch, sigmoid weight),
    GraphAgg (scatter-mean over source frame -> damping eta + 8x8x9 upmask)

GradientClip (zeroes grads > 0.01 in backward, modules/clipping.py) is a
*training-time* guard; inference ignores it. The 2-channel head trim the
reference applies at load (dbaf.py:50-53) happens in the weight converter.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

DIM = 32


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): normalize over H,W per channel."""
    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def _norm(norm_fn):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise NotImplementedError(norm_fn)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(_norm(self.norm_fn)(y))
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = nn.relu(_norm(self.norm_fn)(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding=((0, 0), (0, 0)),
                        name="downsample")(x)
            x = _norm(self.norm_fn)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, 3) normalized RGB -> (B, H/8, W/8, output_dim)."""
        x = nn.Conv(DIM, (7, 7), strides=2, padding=((3, 3), (3, 3)), name="conv1")(x)
        x = nn.relu(_norm(self.norm_fn)(x))
        for i, (dim, stride) in enumerate([(DIM, 1), (2 * DIM, 2),
                                           (4 * DIM, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1,
                              name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), padding=((0, 0), (0, 0)), name="conv2")(x)


class ConvGRU(nn.Module):
    """RAFT ConvGRU with a global-context gate (modules/gru.py:5-32)."""
    h_planes: int = 128

    @nn.compact
    def __call__(self, net, inp):
        net_inp = jnp.concatenate([net, inp], axis=-1)
        b = net.shape[0]
        glo = nn.sigmoid(nn.Conv(self.h_planes, (1, 1), padding=((0, 0), (0, 0)), name="w")(net)) * net
        glo = jnp.mean(glo.reshape(b, -1, net.shape[-1]), axis=1)[
            :, None, None, :]
        z = nn.sigmoid(nn.Conv(self.h_planes, (3, 3), padding=((1, 1), (1, 1)), name="convz")(net_inp)
                       + nn.Conv(self.h_planes, (1, 1),
                                 name="convz_glo")(glo))
        r = nn.sigmoid(nn.Conv(self.h_planes, (3, 3), padding=((1, 1), (1, 1)), name="convr")(net_inp)
                       + nn.Conv(self.h_planes, (1, 1),
                                 name="convr_glo")(glo))
        q = nn.tanh(nn.Conv(self.h_planes, (3, 3), padding=((1, 1), (1, 1)), name="convq")(
            jnp.concatenate([r * net, inp], axis=-1))
            + nn.Conv(self.h_planes, (1, 1), padding=((0, 0), (0, 0)), name="convq_glo")(glo))
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Frame-level aggregation: scatter-mean the GRU state over edges with
    the same source frame, then predict damping + upsample mask."""
    @nn.compact
    def __call__(self, net, ii, num_frames):
        x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="conv1")(net))
        counts = jax.ops.segment_sum(jnp.ones_like(ii, jnp.float32), ii,
                                     num_segments=num_frames)
        summed = jax.ops.segment_sum(x, ii, num_segments=num_frames)
        mean = summed / jnp.clip(counts, 1.0)[:, None, None, None]
        x = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(mean))
        eta = nn.softplus(nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="eta")(x))
        upmask = nn.Conv(8 * 8 * 9, (1, 1), padding=((0, 0), (0, 0)), name="upmask")(x)
        return 0.01 * eta[..., 0], upmask


class UpdateModule(nn.Module):
    @nn.compact
    def __call__(self, net, inp, corr, flow=None, ii=None, num_frames=0,
                 upsample=False):
        """net/inp (N, h, w, 128), corr (N, h, w, 196), flow (N, h, w, 4).

        Returns (net, delta (N,h,w,2), weight (N,h,w,2)[, eta, upmask])."""
        if flow is None:
            flow = jnp.zeros(net.shape[:3] + (4,), net.dtype)
        c = nn.relu(nn.Conv(128, (1, 1), padding=((0, 0), (0, 0)), name="corr_enc1")(corr))
        c = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="corr_enc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)), name="flow_enc1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), name="flow_enc2")(f))
        net = ConvGRU(name="gru")(net, jnp.concatenate([inp, c, f], axis=-1))
        d = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="delta1")(net))
        delta = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="delta2")(d)
        w = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), name="weight1")(net))
        weight = nn.sigmoid(nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), name="weight2")(w))
        if ii is not None and upsample:
            eta, upmask = GraphAgg(name="agg")(net, ii, num_frames)
            return net, delta, weight, eta, upmask
        return net, delta, weight, None, None


class DroidNet(nn.Module):
    @nn.compact
    def __call__(self, images, mode="features"):
        raise NotImplementedError("use the submodules via apply(method=...)")

    def setup(self):
        self.fnet = BasicEncoder(128, "instance", name="fnet")
        self.cnet = BasicEncoder(256, "none", name="cnet")
        self.update = UpdateModule(name="update")

    def extract_features(self, images):
        """images (B, H, W, 3) *normalized* RGB -> fmap, net, inp (1/8)."""
        fmap = self.fnet(images)
        ni = self.cnet(images)
        net, inp = jnp.split(ni, 2, axis=-1)
        return fmap, jnp.tanh(net), nn.relu(inp)

    def run_update(self, net, inp, corr, flow=None, ii=None, num_frames=0,
                   upsample=False):
        return self.update(net, inp, corr, flow, ii, num_frames, upsample)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_image(rgb01):
    """(..., H, W, 3) RGB in [0,1] -> ImageNet-normalized (the reference
    additionally swaps BGR->RGB from its uint8 input, droid_net.py:164)."""
    return (rgb01 - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------

def _conv_w(t):
    import numpy as np
    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_droid_checkpoint(state_dict) -> Dict[str, Any]:
    """Map a torch droid.pth state_dict (as numpy tensors, 'module.'
    stripped) onto this flax module tree. Applies the same 2-channel trim to
    the delta/weight heads as the reference loader (dbaf.py:50-53)."""
    import numpy as np

    sd = {k.replace("module.", ""): np.asarray(v)
          for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def conv(dst, src, trim_out=None):
        if src + ".weight" not in sd:   # allow partial checkpoints
            return
        w = _conv_w(sd[src + ".weight"])
        b = np.asarray(sd[src + ".bias"]) if src + ".bias" in sd else None
        if trim_out is not None:
            w = w[..., :trim_out]
            b = b[:trim_out] if b is not None else None
        d = {"kernel": w}
        if b is not None:
            d["bias"] = b
        _set(p, dst, d)

    def _set(tree, path, leaf):
        parts = path.split("/")
        for q in parts[:-1]:
            tree = tree.setdefault(q, {})
        tree[parts[-1]] = leaf

    for enc in ("fnet", "cnet"):
        conv(f"{enc}/conv1", f"{enc}.conv1")
        conv(f"{enc}/conv2", f"{enc}.conv2")
        for layer in (1, 2, 3):
            for blk in (0, 1):
                base = f"{enc}.layer{layer}.{blk}"
                dst = f"{enc}/layer{layer}_{blk}"
                conv(f"{dst}/conv1", f"{base}.conv1")
                conv(f"{dst}/conv2", f"{base}.conv2")
                if f"{base}.downsample.0.weight" in sd:
                    conv(f"{dst}/downsample", f"{base}.downsample.0")

    u = "update"
    conv(f"{u}/corr_enc1", f"{u}.corr_encoder.0")
    conv(f"{u}/corr_enc2", f"{u}.corr_encoder.2")
    conv(f"{u}/flow_enc1", f"{u}.flow_encoder.0")
    conv(f"{u}/flow_enc2", f"{u}.flow_encoder.2")
    conv(f"{u}/weight1", f"{u}.weight.0")
    conv(f"{u}/weight2", f"{u}.weight.2", trim_out=2)
    conv(f"{u}/delta1", f"{u}.delta.0")
    conv(f"{u}/delta2", f"{u}.delta.2", trim_out=2)
    for g in ("convz", "convr", "convq", "convz_glo", "convr_glo",
              "convq_glo", "w"):
        conv(f"{u}/gru/{g}", f"{u}.gru.{g}")
    conv(f"{u}/agg/conv1", f"{u}.agg.conv1")
    conv(f"{u}/agg/conv2", f"{u}.agg.conv2")
    conv(f"{u}/agg/eta", f"{u}.agg.eta.0")
    conv(f"{u}/agg/upmask", f"{u}.agg.upmask.0")
    return {"params": p}


def save_flax_weights(path, variables):
    """Save flax variables as a flat .npz (f16 storage — inference-grade
    precision at half the repo size; cast back to f32 on load)."""
    import numpy as np
    from flax.traverse_util import flatten_dict
    flat = {"/".join(k): np.asarray(v, np.float16)
            for k, v in flatten_dict(variables).items()}
    np.savez_compressed(path, **flat)


def load_flax_weights(path):
    import numpy as np
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict
    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k], jnp.float32)
                for k in z.files}
    return unflatten_dict(flat)


def load_droid_weights(path):
    """Load droid weights: either the reference droid.pth (torch
    checkpoint, converted 1:1) or a self-trained flax .npz
    (scripts/train_droid.py)."""
    if str(path).endswith(".npz"):
        return load_flax_weights(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_droid_checkpoint({k: v.numpy() for k, v in sd.items()})
