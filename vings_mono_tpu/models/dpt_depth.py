"""DPT-style ViT-S monocular depth network in flax — the architecture slot
for a converted Metric3D-v2-S / ZoeDepth-class checkpoint (reference dep:
`metric_modules`, SURVEY §2.9). Patch-16 ViT-S encoder, 4-tap reassembly,
fusion decoder, metric head. Runs end-to-end with random weights (for shape
tests); checkpoint conversion lands with the weights."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTBlock(nn.Module):
    dim: int = 384
    heads: int = 6

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm()(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
        x = x + y
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * 4)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class DPTDepth(nn.Module):
    dim: int = 384
    depth: int = 12
    taps: tuple = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, rgb):
        """rgb (B, H, W, 3) in [0,1]; H, W multiples of 16 -> (B, H, W)."""
        B, H, W, _ = rgb.shape
        x = nn.Conv(self.dim, (16, 16), strides=16, name="patch")(rgb)
        h, w = x.shape[1:3]
        x = x.reshape(B, h * w, self.dim)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, h * w, self.dim))
        x = x + pos
        feats = []
        for i in range(self.depth):
            x = ViTBlock(self.dim, name=f"block{i}")(x)
            if i in self.taps:
                feats.append(x.reshape(B, h, w, self.dim))
        # reassembly + top-down fusion
        y = None
        for k, f in enumerate(reversed(feats)):
            f = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"reassemble{k}")(f)
            y = f if y is None else f + y
            y = nn.relu(nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                                name=f"fuse{k}")(y))
        y = jax.image.resize(y, (B, H, W, 128), "bilinear")
        y = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                            name="head1")(y))
        d = nn.softplus(nn.Conv(1, (1, 1), padding=((0, 0), (0, 0)),
                                name="head2")(y))
        return d[..., 0]


def load_dpt(weights_path=None):
    """Build DPTDepth (+ params). A checkpoint saved with an `arch` entry
    (dim/depth/taps — e.g. the self-trained compact variant from
    scripts/train_metric_depth.py) reconstructs that architecture; plain
    checkpoints get the ViT-S default."""
    model = DPTDepth()
    hw = None
    if weights_path is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    else:  # converted/self-trained checkpoint (numpy pytree)
        import numpy as np
        data = np.load(weights_path, allow_pickle=True)
        if "arch" in getattr(data, "files", []):
            arch = data["arch"].item()
            model = DPTDepth(dim=int(arch["dim"]), depth=int(arch["depth"]),
                             taps=tuple(arch["taps"]))
            if "hw" in arch:
                hw = tuple(int(v) for v in arch["hw"])
        params = {"params": data["params"].item()}

    @jax.jit
    def predict(p, x):
        # the learned pos-embedding fixes the patch grid: run at the
        # checkpoint's canonical resolution and resize the depth map back
        # (same contract as the reference's Metric3D wrapper,
        # metric_model.py:38-56)
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        if hw is not None and (H, W) != hw:
            xi = jax.image.resize(x, (B, hw[0], hw[1], 3), "bilinear")
            d = model.apply(p, xi)
            return jax.image.resize(d, (B, H, W), "bilinear")
        return model.apply(p, x)

    return model, params, predict
