"""SuperPoint module: shapes, NMS keypoint extraction, descriptor sampling,
and the LoopDetector extract/match plumbing (random weights — no public
checkpoint ships in this container; the converter is exercised on synthetic
torch-style state dicts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vings_mono_tpu.models.superpoint import (SuperPoint, nms_keypoints,
                                              sample_descriptors,
                                              convert_superpoint_checkpoint)


def test_superpoint_shapes():
    model = SuperPoint()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 96, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    heat, desc = model.apply(params, x)
    assert heat.shape == (1, 64, 96)
    assert desc.shape == (1, 8, 12, 256)
    n = np.linalg.norm(np.asarray(desc), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_nms_keypoints_picks_peaks():
    heat = jnp.zeros((64, 64))
    peaks = [(10, 20, 0.9), (40, 50, 0.8), (11, 21, 0.5)]  # third NMS'd away
    for y, x, v in peaks:
        heat = heat.at[y, x].set(v)
    xy, score, valid = nms_keypoints(heat, max_kp=8, nms_radius=4)
    got = {(int(x), int(y)) for (x, y), v in
           zip(np.asarray(xy), np.asarray(valid)) if v}
    assert (20, 10) in got and (50, 40) in got
    assert (21, 11) not in got
    assert int(np.asarray(valid).sum()) == 2


def test_descriptor_sampling_interpolates():
    desc_map = jnp.zeros((4, 4, 256)).at[:, :, 0].set(
        jnp.arange(16).reshape(4, 4) / 16.0)
    xy = jnp.asarray([[12.0, 12.0]])  # center of cell (1.0, 1.0) at 1/8
    d = sample_descriptors(xy, desc_map, (32, 32))
    assert d.shape == (1, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d)), 1.0,
                               atol=1e-5)


def test_converter_maps_torch_names():
    torch = pytest.importorskip("torch")
    sd = {}
    chans = {"conv1a": (64, 1), "conv1b": (64, 64), "conv2a": (64, 64),
             "conv2b": (64, 64), "conv3a": (128, 64), "conv3b": (128, 128),
             "conv4a": (128, 128), "conv4b": (128, 128),
             "convPa": (256, 128), "convPb": (65, 256),
             "convDa": (256, 128), "convDb": (256, 256)}
    ks = {"convPb": 1, "convDb": 1}
    for n, (o, i) in chans.items():
        k = ks.get(n, 3)
        sd[n + ".weight"] = torch.randn(o, i, k, k)
        sd[n + ".bias"] = torch.randn(o)
    variables = convert_superpoint_checkpoint(
        {k: v.numpy() for k, v in sd.items()})
    model = SuperPoint()
    heat, desc = model.apply(variables, jnp.zeros((1, 32, 32, 1)))
    assert heat.shape == (1, 32, 32)


def test_lightglue_shapes_and_assignment():
    from vings_mono_tpu.models.lightglue import (LightGlue, extract_matches,
                                                 normalize_keypoints)
    rng = np.random.default_rng(0)
    N, M = 32, 40
    d0 = rng.normal(size=(N, 256)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d1 = np.concatenate([d0[:24], rng.normal(size=(M - 24, 256))
                         .astype(np.float32)])
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    k0 = normalize_keypoints(jnp.asarray(
        rng.uniform(0, 64, (N, 2)).astype(np.float32)), (64, 64))
    k1 = normalize_keypoints(jnp.asarray(
        rng.uniform(0, 64, (M, 2)).astype(np.float32)), (64, 64))
    v0 = jnp.ones(N, bool)
    v1 = jnp.ones(M, bool)
    model = LightGlue(layers=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(d0),
                        jnp.asarray(d1), k0, k1, v0, v1)
    scores, z0, z1 = model.apply(params, jnp.asarray(d0), jnp.asarray(d1),
                                 k0, k1, v0, v1)
    assert scores.shape == (N, M)
    assert np.all(np.isfinite(np.asarray(scores)))
    assert z0.shape == (N,) and z1.shape == (M,)
    idx, ok = extract_matches(scores, v0, v1, threshold=0.0)
    assert idx.shape == (N,)
