"""LightGlue feature matcher in flax — fills the reference's ONNX LightGlue
slot (/root/reference/scripts/loop/lightglue.py). Standard public
architecture: L transformer layers of self-attention (2D rotary position
encoding on keypoint locations) + cross-attention, then per-point
matchability + double-softmax partial assignment.

`convert_lightglue_checkpoint` maps the public torch checkpoint onto this
tree; without weights the mutual-NN matcher (models/superpoint.py) is the
active backend and this module provides the architecture + assignment math
(tested structurally and on synthetic descriptors).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

DIM = 256
HEADS = 4
LAYERS = 9


def rotary_embed(kpts, dim=DIM // HEADS):
    """2D rotary frequencies from normalized keypoint coords (N, 2) ->
    (N, dim/2) angles used to rotate query/key pairs."""
    n_freq = dim // 4
    freqs = 2.0 ** jnp.arange(n_freq) * jnp.pi
    ang = kpts[..., :, None, :] * freqs[None, :, None]   # (N, f, 2)
    return ang.reshape(kpts.shape[0], -1)                # (N, dim/2)


def apply_rotary(x, ang):
    """x (N, H, d); rotate feature pairs by per-point angles."""
    d = x.shape[-1]
    ang = ang[:, None, :d // 2]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


class Attention(nn.Module):
    cross: bool = False

    @nn.compact
    def __call__(self, x, source, ang_x=None, ang_s=None, mask=None):
        """x (N, DIM) attends to source (M, DIM)."""
        d = DIM // HEADS
        q = nn.Dense(DIM, name="to_q")(x).reshape(-1, HEADS, d)
        k = nn.Dense(DIM, name="to_k")(source).reshape(-1, HEADS, d)
        v = nn.Dense(DIM, name="to_v")(source).reshape(-1, HEADS, d)
        if ang_x is not None:
            q = apply_rotary(q, ang_x)
            k = apply_rotary(k, ang_s if ang_s is not None else ang_x)
        att = jnp.einsum("nhd,mhd->hnm", q, k) / jnp.sqrt(d)
        if mask is not None:
            att = jnp.where(mask[None, None, :], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hnm,mhd->nhd", att, v).reshape(-1, DIM)
        msg = nn.Dense(DIM, name="to_out")(out)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * DIM, name="ffn1")(y)
        y = nn.gelu(nn.LayerNorm(name="ffn_norm")(y))
        return x + nn.Dense(DIM, name="ffn2")(y)


class LightGlue(nn.Module):
    layers: int = LAYERS

    @nn.compact
    def __call__(self, desc0, desc1, kpts0, kpts1, valid0, valid1):
        """descs (N/M, 256) L2-normalized, kpts normalized to [-1, 1].

        Returns (scores (N, M) log-assignment, matchability0 (N,),
        matchability1 (M,))."""
        x0 = nn.Dense(DIM, name="input_proj0")(desc0)
        x1 = nn.Dense(DIM, name="input_proj1")(desc1)
        a0 = rotary_embed(kpts0)
        a1 = rotary_embed(kpts1)
        for i in range(self.layers):
            x0 = Attention(name=f"self{i}_0")(x0, x0, a0, a0, valid0)
            x1 = Attention(name=f"self{i}_1")(x1, x1, a1, a1, valid1)
            y0 = Attention(name=f"cross{i}_0")(x0, x1, None, None, valid1)
            y1 = Attention(name=f"cross{i}_1")(x1, x0, None, None, valid0)
            x0, x1 = y0, y1
        mdesc0 = nn.Dense(DIM, name="final_proj0")(x0)
        mdesc1 = nn.Dense(DIM, name="final_proj1")(x1)
        sim = jnp.einsum("nd,md->nm", mdesc0, mdesc1) / jnp.sqrt(DIM)
        sim = jnp.where(valid0[:, None] & valid1[None, :], sim, -1e9)
        z0 = jax.nn.sigmoid(nn.Dense(1, name="match0")(x0))[:, 0]
        z1 = jax.nn.sigmoid(nn.Dense(1, name="match1")(x1))[:, 0]
        # double-softmax partial assignment (LightGlue eq. 9)
        scores = (jax.nn.log_softmax(sim, axis=1)
                  + jax.nn.log_softmax(sim, axis=0)
                  + jnp.log(jnp.clip(z0, 1e-9))[:, None]
                  + jnp.log(jnp.clip(z1, 1e-9))[None, :])
        return scores, z0, z1


def extract_matches(scores, valid0, valid1, threshold=0.1):
    """Mutual argmax over the log-assignment. Returns (idx1_for_0, ok)."""
    best01 = jnp.argmax(scores, axis=1)
    best10 = jnp.argmax(scores, axis=0)
    mutual = jnp.arange(scores.shape[0]) == best10[best01]
    conf = jnp.exp(jnp.max(scores, axis=1))
    ok = mutual & (conf > threshold) & valid0
    return best01, ok


def normalize_keypoints(xy, hw):
    h, w = hw
    size = jnp.asarray([w, h], jnp.float32)
    return (xy - size / 2.0) / (jnp.max(size) / 2.0)


def convert_lightglue_checkpoint(sd):
    """Map the public LightGlue torch checkpoint (superpoint_lightglue.pth
    naming: transformers.{i}.self_attn/cross_attn..., log_assignment...)
    onto this flax tree. Returns flax variables."""
    import numpy as np

    def dense(prefix):
        return {"kernel": np.asarray(sd[prefix + ".weight"]).T,
                "bias": np.asarray(sd[prefix + ".bias"])}

    p = {}
    p["input_proj0"] = dense("input_proj")
    p["input_proj1"] = dense("input_proj")
    for i in range(LAYERS):
        for side in (0, 1):
            base = f"transformers.{i}"
            p[f"self{i}_{side}"] = {
                "to_q": dense(f"{base}.self_attn.Wqkv_q"),
                "to_k": dense(f"{base}.self_attn.Wqkv_k"),
                "to_v": dense(f"{base}.self_attn.Wqkv_v"),
                "to_out": dense(f"{base}.self_attn.out_proj"),
                "ffn1": dense(f"{base}.self_attn.ffn.0"),
                "ffn_norm": {"scale": np.asarray(
                    sd[f"{base}.self_attn.ffn.1.weight"]),
                    "bias": np.asarray(sd[f"{base}.self_attn.ffn.1.bias"])},
                "ffn2": dense(f"{base}.self_attn.ffn.3"),
            }
            p[f"cross{i}_{side}"] = {
                "to_q": dense(f"{base}.cross_attn.Wq"),
                "to_k": dense(f"{base}.cross_attn.Wk"),
                "to_v": dense(f"{base}.cross_attn.Wv"),
                "to_out": dense(f"{base}.cross_attn.out_proj"),
                "ffn1": dense(f"{base}.cross_attn.ffn.0"),
                "ffn_norm": {"scale": np.asarray(
                    sd[f"{base}.cross_attn.ffn.1.weight"]),
                    "bias": np.asarray(sd[f"{base}.cross_attn.ffn.1.bias"])},
                "ffn2": dense(f"{base}.cross_attn.ffn.3"),
            }
    p["final_proj0"] = dense("log_assignment.final_proj")
    p["final_proj1"] = dense("log_assignment.final_proj")
    p["match0"] = dense("log_assignment.matchability")
    p["match1"] = dense("log_assignment.matchability")
    return {"params": p}
