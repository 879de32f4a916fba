"""Tile (Pallas, interpret-mode) rasterizer vs the naive XLA reference —
forward channels, autodiff-vs-custom-VJP gradients, and score semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vings_mono_tpu.ops import quat_wxyz
from vings_mono_tpu.ops.rasterizer import (Camera, bin_surfels, render,
                                           project_surfels)

H = W = 32
N = 80
P_CAP = 4096
CHUNK = 64


def make_scene(rng, n=N):
    z = rng.uniform(2.0, 6.0, size=n).astype(np.float32)
    x = (rng.uniform(0.05, 0.95, size=n) - 0.5) * z * W / 30.0
    y = (rng.uniform(0.05, 0.95, size=n) - 0.5) * z * H / 30.0
    xyz = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    log_scale = jnp.asarray(np.log(rng.uniform(0.1, 0.5, size=(n, 2))),
                            jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    logit_op = jnp.asarray(rng.normal(size=(n, 1)) * 0.5 + 1.0, jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, size=(n, 3)), jnp.float32)
    cam = Camera(w2c=jnp.eye(4, dtype=jnp.float32), fx=jnp.float32(30.0),
                 fy=jnp.float32(30.0), cx=jnp.float32(W / 2),
                 cy=jnp.float32(H / 2), height=H, width=W)
    return (xyz, log_scale, quat, logit_op, rgb), cam


def both_renders(params, cam):
    r_naive = render(*params, cam, impl="naive")
    r_tile = render(*params, cam, impl="tile", interpret=True,
                    p_cap=P_CAP, chunk=CHUNK)
    return r_naive, r_tile


def test_forward_channels_match(rng):
    params, cam = make_scene(rng)
    rn, rt = both_renders(params, cam)
    for key in ["rgb", "depth", "accum", "normal", "dist", "wm", "wm2"]:
        a, b = np.asarray(rn[key]), np.asarray(rt[key])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=f"channel {key}")
    # scene actually renders something
    assert float(jnp.max(rt["accum"])) > 0.5


def test_binning_overflow_flag(rng):
    params, cam = make_scene(rng)
    proj = project_surfels(*params, cam)
    binned = bin_surfels(proj, height=H, width=W, p_cap=P_CAP, chunk=CHUNK)
    assert not bool(binned.overflow)
    assert int(binned.n_pairs) > 0
    tiny = bin_surfels(proj, height=H, width=W, p_cap=128, chunk=64)
    assert bool(tiny.overflow)


def test_gradients_match_autodiff(rng):
    params, cam = make_scene(rng)
    tgt_rgb = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)), jnp.float32)
    tgt_depth = jnp.asarray(rng.uniform(2, 6, size=(1, H, W)), jnp.float32)

    def loss_fn(p, impl, grad_reduce="bf16"):
        r = render(*p, cam, impl=impl, interpret=True,
                   p_cap=P_CAP, chunk=CHUNK, grad_reduce=grad_reduce)
        return (jnp.mean(jnp.abs(r["rgb"] - tgt_rgb))
                + 0.3 * jnp.mean(jnp.abs(r["depth"] - tgt_depth))
                + 0.1 * jnp.mean(r["dist"])
                + 0.05 * jnp.mean(r["accum"])
                + 0.05 * jnp.mean(r["normal"]))

    g_naive = jax.grad(lambda p: loss_fn(p, "naive"))(params)
    # exact f32 segment-sum reduction vs autodiff: strict tolerance
    g_tile = jax.grad(lambda p: loss_fn(p, "tile", "f32"))(params)
    # production bf16 gather-reduce: same up to bf16 rounding of pair grads
    g_bf16 = jax.grad(lambda p: loss_fn(p, "tile", "bf16"))(params)
    names = ["xyz", "log_scale", "quat", "logit_opacity", "rgb"]
    for name, ga, gb, gc in zip(names, g_naive, g_tile, g_bf16):
        ga, gb, gc = np.asarray(ga), np.asarray(gb), np.asarray(gc)
        assert np.all(np.isfinite(gb)), name
        assert np.all(np.isfinite(gc)), name
        scale = np.abs(ga).max() + 1e-8
        np.testing.assert_allclose(ga / scale, gb / scale, atol=3e-3,
                                   err_msg=f"grad {name}")
        np.testing.assert_allclose(gb / scale, gc / scale, atol=2.5e-2,
                                   err_msg=f"bf16 grad {name}")


def test_grad_tbl_is_exact_inverse_pair_map(rng):
    """The binning's (V, K) inverse table must list every valid pair slot
    exactly once under its compact row (backward gather-reduce == the
    exact segment-sum domain), with all other entries at the P_CAP zeros
    sentinel."""
    params, cam = make_scene(rng)
    proj = project_surfels(*params, cam)
    binned = bin_surfels(proj, height=H, width=W, p_cap=P_CAP, chunk=CHUNK,
                         side=5)
    tbl = np.asarray(binned.grad_tbl)          # (V, K)
    pair_idx = np.asarray(binned.pair_idx)     # (P,) row or V sentinel
    valid = np.asarray(binned.pair_valid)
    V = tbl.shape[0]
    listed = tbl[tbl < P_CAP]
    # every valid pair appears exactly once
    assert sorted(listed.tolist()) == sorted(
        np.nonzero(valid)[0].tolist())
    # ... under its own compact row
    for v in range(V):
        for slot in tbl[v][tbl[v] < P_CAP]:
            assert pair_idx[slot] == v


def test_scores_are_weight_sums(rng):
    params, cam = make_scene(rng)
    carrier = jnp.zeros((N, 2), jnp.float32)

    def loss_fn(c):
        r = render(*params, cam, impl="tile", interpret=True,
                   p_cap=P_CAP, chunk=CHUNK, score_carrier=c)
        return jnp.sum(jnp.abs(r["rgb"]))

    scores = jax.grad(loss_fn)(carrier)
    s = np.asarray(scores)
    assert np.all(s >= -1e-6)
    assert s[:, 0].max() > 1.0  # some gaussian covers many pixels
    # importance column equals sum of blend weights: cross-check via the
    # derivative of total accumulated alpha wrt a per-gaussian opacity scale
    r = render(*params, cam, impl="tile", interpret=True,
               p_cap=P_CAP, chunk=CHUNK)
    total_alpha = float(jnp.sum(r["accum"]))
    np.testing.assert_allclose(s[:, 0].sum(), total_alpha, rtol=1e-3)


def test_empty_scene_renders_zero(rng):
    params, cam = make_scene(rng)
    alive = jnp.zeros((N,), bool)
    r = render(*params, cam, impl="tile", interpret=True, p_cap=P_CAP,
               chunk=CHUNK, alive=alive)
    np.testing.assert_allclose(np.asarray(r["rgb"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r["accum"]), 0.0, atol=1e-7)


def test_tile_depth_cap_keeps_nearest(rng):
    """tile_cap keeps the nearest pairs per tile. With saturating opacity
    the render must be visually unchanged (transmittance is ~0 past the
    first few splats); uncapped vs generous cap must be bit-identical on
    a scene that never hits the cap."""
    params, cam = make_scene(rng)
    r_uncapped = render(*params, cam, impl="tile", interpret=True,
                        p_cap=P_CAP, chunk=CHUNK)
    r_big = render(*params, cam, impl="tile", interpret=True,
                   p_cap=P_CAP, chunk=CHUNK, tile_cap=4096)
    np.testing.assert_array_equal(np.asarray(r_uncapped["rgb"]),
                                  np.asarray(r_big["rgb"]))

    # stack many near-opaque splats on one spot: dropped (farther) pairs
    # can only contribute through the transmittance REMAINING after the
    # kept prefix, so the per-pixel error is bounded by 1 - accum_cap —
    # and saturated pixels must match exactly
    n = 64
    z = np.linspace(2.0, 2.1, n).astype(np.float32)
    xyz = jnp.asarray(np.stack([0.0 * z, 0.0 * z, z], -1))
    ls = jnp.full((n, 2), np.log(0.4), jnp.float32)
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    op = jnp.full((n, 1), 3.0, jnp.float32)         # sigmoid ~ 0.95
    rgb = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (n, 3)),
                      jnp.float32)
    p2 = (xyz, ls, quat, op, rgb)
    r_all = render(*p2, cam, impl="tile", interpret=True, p_cap=P_CAP,
                   chunk=16)
    r_cap = render(*p2, cam, impl="tile", interpret=True, p_cap=P_CAP,
                   chunk=16, tile_cap=16)
    diff = np.abs(np.asarray(r_cap["rgb"]) - np.asarray(r_all["rgb"]))
    t_left = 1.0 - np.asarray(r_cap["accum"])[0]
    assert np.all(diff <= t_left[None] + 1e-4), float(
        (diff - t_left[None]).max())
    sat = np.asarray(r_cap["accum"])[0] > 0.999
    assert sat.any()
    np.testing.assert_allclose(np.asarray(r_cap["rgb"])[:, sat],
                               np.asarray(r_all["rgb"])[:, sat], atol=2e-3)


def test_padded_demand_flags_overflow(rng):
    """Pair slots are laid out padded per tile; when pad_off[T] exceeds
    p_cap the trailing tiles drop pairs — that MUST raise the overflow
    flag (and n_padded reports the real demand) so the capacity tuner
    grows the bucket, even when the raw pair count fits."""
    params, cam = make_scene(rng)
    proj = project_surfels(*params, cam)
    big = bin_surfels(proj, height=H, width=W, p_cap=P_CAP, chunk=CHUNK)
    n_pairs = int(big.n_pairs)
    assert int(big.n_padded) >= n_pairs
    # pick a cap between the raw count and the padded demand: 4 tiles pad
    # to >= 4 chunks, so padding alone can exceed a tight cap
    tight = max(((n_pairs + CHUNK) // CHUNK) * CHUNK, CHUNK)
    if tight < int(big.n_padded):
        b = bin_surfels(proj, height=H, width=W, p_cap=tight, chunk=CHUNK)
        assert bool(b.overflow)
