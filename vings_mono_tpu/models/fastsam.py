"""FastSAM-class segment-everything network in flax (NHWC).

Fills the reference's FastSAM-x slot (/root/reference/scripts/dynamic/
dynamic_utils.py:6-27: `FastSAM(...)` + `FastSAMPrompt.everything_prompt()`).
FastSAM is YOLOv8-seg trained for class-agnostic segment-everything, so the
architecture here is the standard public YOLOv8-seg graph:

  backbone: CSPDarknet — stem conv, 4 stages of (downsample conv + C2f),
            SPPF at the end;
  neck:     PAN-FPN — top-down upsample/concat/C2f then bottom-up;
  heads:    per-scale box (DFL) + objectness/cls(1) + mask-coefficient
            branches, and a prototype head at stride 8.

`segment_everything` decodes boxes (DFL expectation over bins, anchor-free
distance-to-edges), NMS-filters them, and composes per-instance masks as
sigmoid(proto @ coeffs) cropped to the box — the `everything_prompt`
semantics. `convert_fastsam_checkpoint` maps an ultralytics YOLOv8-seg
state_dict onto this tree; without weights the module serves as the
architecture slot (the 'cc'/'precomputed' backends of
dynamic/dynamic_model.py stay the practical paths, mirroring the
reference's offline `sam_anns/*.pt` support).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

REG_MAX = 16          # DFL bins per box side


class FrozenBN(nn.Module):
    """Inference-only batch norm with all four stats as params — keeps the
    converted checkpoint a single flat 'params' tree. eps matches
    ultralytics (1e-3)."""
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        return scale * (x - mean) * jax.lax.rsqrt(var + 1e-3) + bias


class ConvBNAct(nn.Module):
    ch: int
    k: int = 1
    s: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(self.ch, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False,
                    name="conv")(x)
        x = FrozenBN(name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.ch, 3, name="cv1")(x)
        y = ConvBNAct(self.ch, 3, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.ch else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8)."""
    ch: int
    n: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        h = self.ch // 2
        y = ConvBNAct(self.ch, 1, name="cv1")(x)
        y0, y1 = jnp.split(y, 2, axis=-1)
        outs = [y0, y1]
        for i in range(self.n):
            y1 = Bottleneck(h, self.shortcut, name=f"m{i}")(y1)
            outs.append(y1)
        return ConvBNAct(self.ch, 1, name="cv2")(
            jnp.concatenate(outs, axis=-1))


class SPPF(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.ch // 2, 1, name="cv1")(x)
        p1 = nn.max_pool(y, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBNAct(self.ch, 1, name="cv2")(
            jnp.concatenate([y, p1, p2, p3], axis=-1))


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")


class FastSAM(nn.Module):
    """YOLOv8-seg graph; width/depth default to the 'n' scale (the
    reference ships FastSAM-x — same graph, width=1.25/depth=1.0 — set
    `width`/`depth` accordingly when converting those weights)."""
    width: float = 0.25
    depth: float = 0.34
    n_mask: int = 32

    @nn.compact
    def __call__(self, image):
        """image (B, H, W, 3) in [0,1], H/W multiples of 32.

        Returns (preds, proto): preds is a list over strides (8, 16, 32) of
        (B, h, w, 4*REG_MAX + 1 + n_mask) raw maps; proto (B, H/4, W/4,
        n_mask) — the YOLOv8 Proto head upsamples the stride-8 features
        once."""
        def c(base):
            return max(16, int(round(base * self.width / 16)) * 16)

        def d(base):
            return max(1, int(round(base * self.depth)))

        x = ConvBNAct(c(64), 3, 2, name="stem")(image)           # 1/2
        x = ConvBNAct(c(128), 3, 2, name="down1")(x)             # 1/4
        x = C2f(c(128), d(3), name="c2f1")(x)
        x = ConvBNAct(c(256), 3, 2, name="down2")(x)             # 1/8
        p3 = C2f(c(256), d(6), name="c2f2")(x)
        x = ConvBNAct(c(512), 3, 2, name="down3")(p3)            # 1/16
        p4 = C2f(c(512), d(6), name="c2f3")(x)
        x = ConvBNAct(c(1024), 3, 2, name="down4")(p4)           # 1/32
        x = C2f(c(1024), d(3), name="c2f4")(x)
        p5 = SPPF(c(1024), name="sppf")(x)

        # PAN-FPN
        u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(c(512), d(3), shortcut=False, name="neck_td4")(u4)
        u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(c(256), d(3), shortcut=False, name="neck_td3")(u3)
        dn3 = ConvBNAct(c(256), 3, 2, name="neck_dn3")(n3)
        n4b = C2f(c(512), d(3), shortcut=False, name="neck_bu4")(
            jnp.concatenate([dn3, n4], axis=-1))
        dn4 = ConvBNAct(c(512), 3, 2, name="neck_dn4")(n4b)
        n5b = C2f(c(1024), d(3), shortcut=False, name="neck_bu5")(
            jnp.concatenate([dn4, p5], axis=-1))

        proto = ConvBNAct(c(256), 3, name="proto_cv1")(n3)
        proto = _upsample2(proto)
        proto = ConvBNAct(c(256), 3, name="proto_cv2")(proto)
        proto = nn.Conv(self.n_mask, (1, 1), name="proto_out")(proto)

        preds = []
        for i, f in enumerate([n3, n4b, n5b]):
            box = ConvBNAct(c(256), 3, name=f"head{i}_box1")(f)
            box = ConvBNAct(c(256), 3, name=f"head{i}_box2")(box)
            box = nn.Conv(4 * REG_MAX, (1, 1), name=f"head{i}_box")(box)
            cls = ConvBNAct(c(256), 3, name=f"head{i}_cls1")(f)
            cls = ConvBNAct(c(256), 3, name=f"head{i}_cls2")(cls)
            cls = nn.Conv(1, (1, 1), name=f"head{i}_cls")(cls)
            mc = ConvBNAct(c(256), 3, name=f"head{i}_mc1")(f)
            mc = nn.Conv(self.n_mask, (1, 1), name=f"head{i}_mc")(mc)
            preds.append(jnp.concatenate([box, cls, mc], axis=-1))
        return preds, proto


def decode_boxes(pred, stride):
    """(B, h, w, 4*REG_MAX + 1 + n_mask) -> boxes (B, h*w, 4) xyxy in
    pixels, scores (B, h*w), coeffs (B, h*w, n_mask). DFL: expectation of
    softmax over REG_MAX bins per side distance."""
    B, h, w, _ = pred.shape
    box = pred[..., :4 * REG_MAX].reshape(B, h, w, 4, REG_MAX)
    dist = jnp.sum(jax.nn.softmax(box, axis=-1)
                   * jnp.arange(REG_MAX, dtype=jnp.float32), axis=-1)
    cy, cx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    x1 = (cx - dist[..., 0]) * stride
    y1 = (cy - dist[..., 1]) * stride
    x2 = (cx + dist[..., 2]) * stride
    y2 = (cy + dist[..., 3]) * stride
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(B, h * w, 4)
    scores = jax.nn.sigmoid(pred[..., 4 * REG_MAX]).reshape(B, h * w)
    coeffs = pred[..., 4 * REG_MAX + 1:].reshape(B, h * w, -1)
    return boxes, scores, coeffs


def _nms(boxes, scores, iou_thresh=0.6, max_out=64):
    """Greedy NMS on host (numpy) — rare-event post-processing."""
    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    order = np.argsort(-scores)
    keep = []
    while len(order) and len(keep) < max_out:
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * \
            (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.clip(a_i + a_r - inter, 1e-9, None)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


def segment_everything(model, params, rgb, conf=0.4, iou=0.6, max_out=64):
    """`FastSAMPrompt.everything_prompt()` equivalent: run the net, decode
    + NMS boxes, compose per-instance masks = sigmoid(proto @ coeff)
    cropped to the box. rgb (H, W, 3) in [0,1]; returns a list of (H, W)
    bool masks."""
    H, W = rgb.shape[:2]
    Hp = (H + 31) // 32 * 32
    Wp = (W + 31) // 32 * 32
    img = jnp.zeros((1, Hp, Wp, 3), jnp.float32).at[
        :, :H, :W].set(jnp.asarray(rgb, jnp.float32))
    preds, proto = model.apply(params, img)
    all_b, all_s, all_c = [], [], []
    for pred, stride in zip(preds, (8, 16, 32)):
        b, s, cfs = decode_boxes(pred, stride)
        all_b.append(b[0])
        all_s.append(s[0])
        all_c.append(cfs[0])
    boxes = np.asarray(jnp.concatenate(all_b))
    scores = np.asarray(jnp.concatenate(all_s))
    coeffs = np.asarray(jnp.concatenate(all_c))
    sel = scores > conf
    if not sel.any():
        return []
    boxes, scores, coeffs = boxes[sel], scores[sel], coeffs[sel]
    keep = _nms(boxes, scores, iou, max_out)
    proto_np = np.asarray(proto[0])                       # (Hp/4?, Wp, M)
    ph, pw = proto_np.shape[:2]
    masks = []
    sy, sx = Hp / ph, Wp / pw
    for i in keep:
        m = 1.0 / (1.0 + np.exp(-(proto_np @ coeffs[i])))  # (ph, pw)
        x1, y1, x2, y2 = boxes[i]
        yy, xx = np.meshgrid(np.arange(ph) * sy, np.arange(pw) * sx,
                             indexing="ij")
        inbox = (xx >= x1) & (xx <= x2) & (yy >= y1) & (yy <= y2)
        m = (m > 0.5) & inbox
        if not m.any():
            continue
        full = np.kron(m, np.ones((int(round(sy)), int(round(sx))),
                                  bool))[:H, :W]
        if full.shape != (H, W):
            pad = np.zeros((H, W), bool)
            pad[:full.shape[0], :full.shape[1]] = full[:H, :W]
            full = pad
        masks.append(full)
    return masks


def convert_fastsam_checkpoint(sd, width=1.25, depth=1.0):
    """Map an ultralytics YOLOv8-seg/FastSAM state_dict (torch names ->
    numpy arrays) onto this module's tree. Layer index layout follows the
    ultralytics yolov8-seg.yaml graph (model.0 stem ... model.22 head)."""
    def conv(prefix):
        out = {"conv": {"kernel": np.transpose(
            sd[prefix + ".conv.weight"], (2, 3, 1, 0))}}
        bn = {}
        for a, b in (("scale", "weight"), ("bias", "bias"),
                     ("mean", "running_mean"), ("var", "running_var")):
            bn[a] = sd[f"{prefix}.bn.{b}"]
        out["bn"] = bn
        return out

    def c2f(prefix, n):
        out = {"cv1": conv(prefix + ".cv1"), "cv2": conv(prefix + ".cv2")}
        for i in range(n):
            out[f"m{i}"] = {"cv1": conv(f"{prefix}.m.{i}.cv1"),
                            "cv2": conv(f"{prefix}.m.{i}.cv2")}
        return out

    def d(base):
        return max(1, int(round(base * depth)))

    params = {
        "stem": conv("model.0"),
        "down1": conv("model.1"), "c2f1": c2f("model.2", d(3)),
        "down2": conv("model.3"), "c2f2": c2f("model.4", d(6)),
        "down3": conv("model.5"), "c2f3": c2f("model.6", d(6)),
        "down4": conv("model.7"), "c2f4": c2f("model.8", d(3)),
        "sppf": {"cv1": conv("model.9.cv1"), "cv2": conv("model.9.cv2")},
        "neck_td4": c2f("model.12", d(3)),
        "neck_td3": c2f("model.15", d(3)),
        "neck_dn3": conv("model.16"),
        "neck_bu4": c2f("model.18", d(3)),
        "neck_dn4": conv("model.19"),
        "neck_bu5": c2f("model.21", d(3)),
    }
    # seg head (model.22): proto + per-scale box/cls/mask-coef towers
    params["proto_cv1"] = conv("model.22.proto.cv1")
    params["proto_cv2"] = conv("model.22.proto.cv2")
    params["proto_out"] = {
        "kernel": np.transpose(sd["model.22.proto.cv3.weight"],
                               (2, 3, 1, 0)),
        "bias": sd["model.22.proto.cv3.bias"]}
    for i in range(3):
        params[f"head{i}_box1"] = conv(f"model.22.cv2.{i}.0")
        params[f"head{i}_box2"] = conv(f"model.22.cv2.{i}.1")
        params[f"head{i}_box"] = {
            "kernel": np.transpose(sd[f"model.22.cv2.{i}.2.weight"],
                                   (2, 3, 1, 0)),
            "bias": sd[f"model.22.cv2.{i}.2.bias"]}
        params[f"head{i}_cls1"] = conv(f"model.22.cv3.{i}.0")
        params[f"head{i}_cls2"] = conv(f"model.22.cv3.{i}.1")
        params[f"head{i}_cls"] = {
            "kernel": np.transpose(sd[f"model.22.cv3.{i}.2.weight"],
                                   (2, 3, 1, 0)),
            "bias": sd[f"model.22.cv3.{i}.2.bias"]}
        params[f"head{i}_mc1"] = conv(f"model.22.cv4.{i}.0")
        params[f"head{i}_mc"] = {
            "kernel": np.transpose(sd[f"model.22.cv4.{i}.1.weight"],
                                   (2, 3, 1, 0)),
            "bias": sd[f"model.22.cv4.{i}.1.bias"]}
    return {"params": params}
