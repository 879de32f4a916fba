"""Golden-fixture numerics for the loop-closure nets (VERDICT r1 item 5c).

No pretrained SuperPoint/LightGlue weights ship in this container, so
parity is pinned the other way around: a dependency-free numpy forward of
the PUBLIC architectures (the spec the reference's ONNX files implement)
is evaluated with small random weights, and the flax modules loaded with
the SAME weights must reproduce it. This catches the silent killers of
weight conversion — padding mode, pool placement, depth-to-space order,
normalization axis — so that when real checkpoints are supplied via
`convert_superpoint_checkpoint`/`convert_lightglue_checkpoint`, the
forward is already known-correct."""

import numpy as np
import jax.numpy as jnp

from vings_mono_tpu.models.superpoint import SuperPoint
from vings_mono_tpu.models.lightglue import (Attention, rotary_embed,
                                             apply_rotary)


# ---------------------------------------------------------------- numpy ref
def np_conv2d(x, w, b, pad):
    """x (H, W, Cin), w (kh, kw, Cin, Cout) — flax HWIO layout."""
    kh, kw, cin, cout = w.shape
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    H, W = x.shape[0], x.shape[1]
    out = np.zeros((H, W, cout), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[dy:dy + H, dx:dx + W]                 # (H, W, Cin)
            out += patch @ w[dy, dx]                          # -> Cout
    return out + b


def np_maxpool2(x):
    H, W, C = x.shape
    return x[:H // 2 * 2, :W // 2 * 2].reshape(
        H // 2, 2, W // 2, 2, C).max(axis=(1, 3))


def np_relu(x):
    return np.maximum(x, 0.0)


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_superpoint(img, p):
    """img (H, W, 1); p: dict name -> (kernel, bias). Public SuperPoint:
    VGG 64-64/pool/64-64/pool/128-128/pool/128-128, detector 256->65
    softmax drop-dustbin depth-to-space, descriptor 256->256 L2."""
    x = img
    for name in ["conv1a", "conv1b"]:
        x = np_relu(np_conv2d(x, *p[name], pad=1))
    x = np_maxpool2(x)
    for name in ["conv2a", "conv2b"]:
        x = np_relu(np_conv2d(x, *p[name], pad=1))
    x = np_maxpool2(x)
    for name in ["conv3a", "conv3b"]:
        x = np_relu(np_conv2d(x, *p[name], pad=1))
    x = np_maxpool2(x)
    for name in ["conv4a", "conv4b"]:
        x = np_relu(np_conv2d(x, *p[name], pad=1))

    d = np_relu(np_conv2d(x, *p["convPa"], pad=1))
    logits = np_conv2d(d, *p["convPb"], pad=0)
    prob = np_softmax(logits, axis=-1)[..., :64]
    h, w = prob.shape[:2]
    heat = prob.reshape(h, w, 8, 8).transpose(0, 2, 1, 3).reshape(
        h * 8, w * 8)

    e = np_relu(np_conv2d(x, *p["convDa"], pad=1))
    desc = np_conv2d(e, *p["convDb"], pad=0)
    desc = desc / np.clip(np.linalg.norm(desc, axis=-1, keepdims=True),
                          1e-8, None)
    return heat, desc


def test_superpoint_matches_numpy_golden():
    rng = np.random.default_rng(3)
    chans = {"conv1a": (1, 64), "conv1b": (64, 64),
             "conv2a": (64, 64), "conv2b": (64, 64),
             "conv3a": (64, 128), "conv3b": (128, 128),
             "conv4a": (128, 128), "conv4b": (128, 128),
             "convPa": (128, 256), "convPb": (256, 65),
             "convDa": (128, 256), "convDb": (256, 256)}
    ksize = {"convPb": 1, "convDb": 1}
    p = {}
    flax_params = {}
    for name, (cin, cout) in chans.items():
        k = ksize.get(name, 3)
        w = (rng.normal(size=(k, k, cin, cout)) / np.sqrt(k * k * cin)
             ).astype(np.float32)
        b = (rng.normal(size=cout) * 0.1).astype(np.float32)
        p[name] = (w, b)
        flax_params[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}

    img = rng.uniform(0, 1, size=(24, 32, 1)).astype(np.float32)
    heat_ref, desc_ref = np_superpoint(img, p)

    heat, desc = SuperPoint().apply({"params": flax_params},
                                    jnp.asarray(img)[None])
    np.testing.assert_allclose(np.asarray(heat)[0], heat_ref,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(desc)[0], desc_ref,
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- lightglue pieces
def test_rotary_attention_matches_numpy_golden():
    """One LightGlue attention block vs a numpy transcription: rotary
    angles from keypoint positions, per-head scaled dot-product, FFN
    residual — using the module's own randomly-initialized params."""
    import jax
    from vings_mono_tpu.models.lightglue import DIM, HEADS

    rng = np.random.default_rng(4)
    N = 6
    hd = DIM // HEADS
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    kpts = rng.uniform(-1, 1, size=(N, 2)).astype(np.float32)
    ang = rotary_embed(jnp.asarray(kpts), hd)

    att = Attention()
    vars_ = att.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x),
                     ang, ang)
    out = att.apply(vars_, jnp.asarray(x), jnp.asarray(x), ang, ang)

    pr = jax.tree.map(np.asarray, vars_["params"])

    def dense(name, v):
        p_ = pr[name]
        return v @ p_["kernel"] + p_.get(
            "bias", np.zeros(p_["kernel"].shape[1], np.float32))

    q = dense("to_q", x).reshape(N, HEADS, hd)
    k = dense("to_k", x).reshape(N, HEADS, hd)
    v = dense("to_v", x).reshape(N, HEADS, hd)
    ang_np = np.asarray(ang)

    def rot(t):
        return np.asarray(apply_rotary(jnp.asarray(t),
                                       jnp.asarray(ang_np)))

    qr, kr = rot(q), rot(k)
    s = np.einsum("nhd,mhd->hnm", qr, kr) / np.sqrt(hd)
    a = np_softmax(s, axis=-1)
    o = np.einsum("hnm,mhd->nhd", a, v).reshape(N, DIM)
    msg = dense("to_out", o)
    y = np.concatenate([x, msg], axis=-1)
    y = dense("ffn1", y)
    ln = pr["ffn_norm"]
    mu = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    yn = (y - mu) / np.sqrt(var + 1e-6) * ln["scale"] + ln["bias"]
    # flax gelu default is the tanh approximation
    g = 0.5 * yn * (1.0 + np.tanh(np.sqrt(2 / np.pi)
                                  * (yn + 0.044715 * yn ** 3)))
    ref = x + dense("ffn2", g)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)
