"""All-pairs correlation pyramid + windowed lookup, pure XLA.

TPU replacement for `droid_backends.corr_index_forward/backward` and the
CorrBlock pyramid (/root/reference/scripts/frontend/modules/corr.py):
  * the all-pairs volume is one big MXU matmul,
  * the (2r+1)^2-window lookup with bilinear interpolation is expressed as a
    gather of the 4 corner columns per (pixel, offset) — autodiff gives the
    scatter-add backward for free.

Layouts are edge-major: fmaps (N, h, w, C); volumes (N, h1*w1, h2, w2).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

NUM_LEVELS = 4
RADIUS = 3


class CorrPyramid(NamedTuple):
    levels: List[jnp.ndarray]   # [(N, h1w1, h2/2^l, w2/2^l)]


def build_pyramid(fmap1, fmap2, num_levels=NUM_LEVELS,
                  dtype=jnp.float32) -> CorrPyramid:
    """fmap1/2 (N, h, w, C) -> pyramid of all-pairs correlations.

    dtype=bfloat16 halves the (large) volume storage and lookup traffic —
    the reference ran its corr path under fp16 AMP (covisible_graph.py:102)."""
    N, h, w, C = fmap1.shape
    f1 = fmap1.reshape(N, h * w, C) / 4.0
    f2 = fmap2.reshape(N, h * w, C) / 4.0
    corr = jnp.einsum("npc,nqc->npq", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr.reshape(N, h * w, h, w).astype(dtype)
    levels = [corr]
    for _ in range(num_levels - 1):
        c = levels[-1]
        n, p, hh, ww = c.shape
        h2, w2 = hh // 2, ww // 2     # floor like torch avg_pool2d stride 2
        c = c[:, :, :2 * h2, :2 * w2]
        c = c.reshape(n, p, h2, 2, w2, 2).mean(axis=(3, 5))
        levels.append(c)
    return CorrPyramid(levels=levels)


def _interp_matrix(pos, size, radius):
    """Per-pixel separable bilinear selection matrix.

    pos (..., ) fractional coordinates; returns W (..., 2r+1, size) with
    W[.., k, c] = (1-f)*[c == floor(pos)+k-r] + f*[c == floor(pos)+k-r+1]
    (zero outside [0, size) like the CUDA sampler's OOB handling)."""
    r = radius
    p0 = jnp.floor(pos)
    f = (pos - p0)[..., None, None]
    base = p0.astype(jnp.int32)[..., None, None] + \
        jnp.arange(-r, r + 1, dtype=jnp.int32)[:, None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * r + 1, size), 1)
    W = (1.0 - f) * (cols == base) + f * (cols == base + 1)
    return W


def _lookup_level(vol, coords, radius):
    """vol (N, P, h2, w2); coords (N, h1, w1, 2) in level-l pixel units.
    Returns (N, h1, w1, (2r+1)^2) bilinear samples around coords.

    TPU note: expressed as per-pixel one-hot interpolation MATMULS instead
    of gathers — XLA gathers on TPU run at ~element rate (this lookup was
    the tracker's hotspot at ~1.3 s/update); the separable one-hot
    contraction runs on the MXU in O(ms)."""
    N, P, h2, w2 = vol.shape
    _, h1, w1, _ = coords.shape
    assert P == h1 * w1
    k = 2 * radius + 1

    x = coords[..., 0].reshape(N, P)
    y = coords[..., 1].reshape(N, P)
    # interp matrices in the volume dtype (bf16 when the pyramid is bf16)
    Wx = _interp_matrix(x, w2, radius).astype(vol.dtype)  # (N, P, k, w2)
    Wy = _interp_matrix(y, h2, radius).astype(vol.dtype)  # (N, P, k, h2)

    # x-interpolation then y-interpolation (exact separable bilinear)
    t = jnp.einsum("npyx,npkx->npyk", vol, Wx,
                   preferred_element_type=jnp.float32)   # (N, P, h2, k)
    out = jnp.einsum("npyk,npjy->npjk", t.astype(vol.dtype), Wy,
                     preferred_element_type=jnp.float32)  # (N, P, ky, kx)
    return out.reshape(N, h1, w1, k * k).astype(jnp.float32)


def lookup(pyramid: CorrPyramid, coords, radius=RADIUS):
    """coords (N, h1, w1, 2) at level-0 resolution -> (N, h1, w1,
    num_levels*(2r+1)^2), level-major like the reference's channel concat."""
    outs = []
    for lvl, vol in enumerate(pyramid.levels):
        outs.append(_lookup_level(vol, coords / (2 ** lvl), radius))
    return jnp.concatenate(outs, axis=-1)


def stack_pyramids(pyrs: List[CorrPyramid]) -> CorrPyramid:
    return CorrPyramid(levels=[jnp.concatenate([p.levels[i] for p in pyrs])
                               for i in range(len(pyrs[0].levels))])
