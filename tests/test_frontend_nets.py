"""Learned-frontend parity tests: flax encoders vs the reference's torch
modules (imported read-only — they depend only on torch), the weight
converter, correlation lookup vs a numpy reference, convex upsampling."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/scripts")

from vings_mono_tpu.models.droid_net import (BasicEncoder, ConvGRU,
                                             UpdateModule,
                                             convert_droid_checkpoint)
from vings_mono_tpu.ops import corr as corr_ops
from vings_mono_tpu.ops.upsample import cvx_upsample


def _to_flax_convs(sd, mapping):
    out = {}
    for dst, src in mapping.items():
        w = np.transpose(sd[src + ".weight"].numpy(), (2, 3, 1, 0))
        d = {"kernel": w}
        if src + ".bias" in sd:
            d["bias"] = sd[src + ".bias"].numpy()
        cur = out
        parts = dst.split("/")
        for p_ in parts[:-1]:
            cur = cur.setdefault(p_, {})
        cur[parts[-1]] = d
    return out


def test_basic_encoder_matches_reference_torch():
    from frontend.modules.extractor import BasicEncoder as TorchEncoder
    tnet = TorchEncoder(output_dim=128, norm_fn="instance").eval()
    sd = tnet.state_dict()

    x = np.random.default_rng(0).normal(size=(1, 3, 64, 96)).astype(
        np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)[None])[0].numpy()  # (1,128,8,12)

    full_sd = {f"fnet.{k}": v for k, v in sd.items()}
    variables = convert_droid_checkpoint(
        {k: v.numpy() for k, v in full_sd.items()})
    fnet_params = {"params": variables["params"]["fnet"]}
    xf = jnp.moveaxis(jnp.asarray(x), 1, -1)
    out = BasicEncoder(128, "instance").apply(fnet_params, xf)
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(ref, out, rtol=1e-3, atol=1e-4)


def test_conv_gru_matches_reference_torch():
    from frontend.modules.gru import ConvGRU as TorchGRU
    tg = TorchGRU(128, 128 + 128 + 64).eval()
    sd = tg.state_dict()
    mapping = {g: g for g in ["convz", "convr", "convq", "convz_glo",
                              "convr_glo", "convq_glo", "w"]}
    params = {"params": _to_flax_convs(sd, mapping)}

    rng = np.random.default_rng(1)
    net = rng.normal(size=(2, 128, 8, 12)).astype(np.float32)
    inp = rng.normal(size=(2, 128 + 128 + 64, 8, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(net), torch.from_numpy(inp)).numpy()

    out = ConvGRU().apply(params, jnp.moveaxis(jnp.asarray(net), 1, -1),
                          jnp.moveaxis(jnp.asarray(inp), 1, -1))
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(ref, out, rtol=1e-3, atol=1e-4)


def test_update_module_shapes():
    um = UpdateModule()
    rng = jax.random.PRNGKey(0)
    N, h, w = 3, 8, 12
    net = jnp.zeros((N, h, w, 128))
    inp = jnp.zeros((N, h, w, 128))
    corr = jnp.zeros((N, h, w, 196))
    variables = um.init(rng, net, inp, corr, None, jnp.asarray([0, 0, 1]),
                        2, True)
    net2, delta, weight, eta, upmask = um.apply(
        variables, net, inp, corr, None, jnp.asarray([0, 0, 1]), 2, True)
    assert net2.shape == (N, h, w, 128)
    assert delta.shape == (N, h, w, 2)
    assert weight.shape == (N, h, w, 2)
    assert eta.shape == (2, h, w)
    assert upmask.shape == (2, h, w, 576)
    assert float(jnp.min(weight)) >= 0 and float(jnp.max(weight)) <= 1
    assert float(jnp.min(eta)) >= 0


def test_corr_lookup_matches_numpy():
    rng = np.random.default_rng(2)
    N, h, w, C = 2, 6, 8, 16
    f1 = rng.normal(size=(N, h, w, C)).astype(np.float32)
    f2 = rng.normal(size=(N, h, w, C)).astype(np.float32)
    pyr = corr_ops.build_pyramid(jnp.asarray(f1), jnp.asarray(f2),
                                 num_levels=2)
    coords = rng.uniform(1, 5, size=(N, h, w, 2)).astype(np.float32)
    out = np.asarray(corr_ops.lookup(pyr, jnp.asarray(coords), radius=1))

    # numpy reference for level 0, offset (dy=0, dx=0) => channel index 4
    vol = np.einsum("nhwc,nyxc->nhwyx", f1 / 4.0, f2 / 4.0)
    n_, i, j = 0, 2, 3
    x, y = coords[n_, i, j]
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0
    ref = ((1 - fy) * ((1 - fx) * vol[n_, i, j, y0, x0]
                       + fx * vol[n_, i, j, y0, x0 + 1])
           + fy * ((1 - fx) * vol[n_, i, j, y0 + 1, x0]
                   + fx * vol[n_, i, j, y0 + 1, x0 + 1]))
    np.testing.assert_allclose(out[n_, i, j, 4], ref, rtol=1e-4, atol=1e-5)


def test_cvx_upsample_constant_field():
    B, h, w = 1, 4, 6
    data = jnp.full((B, h, w, 1), 3.25)
    mask = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, h, w, 576)), jnp.float32)
    up = cvx_upsample(data, mask)
    assert up.shape == (B, 32, 48, 1)
    # interior output pixels are convex combos of an all-constant field
    np.testing.assert_allclose(np.asarray(up[:, 8:-8, 8:-8]), 3.25,
                               rtol=1e-5)
