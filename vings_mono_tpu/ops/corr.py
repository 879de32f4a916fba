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


def build_pyramid(fmap1, fmap2, num_levels=NUM_LEVELS) -> CorrPyramid:
    """fmap1/2 (N, h, w, C) -> pyramid of all-pairs correlations."""
    N, h, w, C = fmap1.shape
    f1 = fmap1.reshape(N, h * w, C) / 4.0
    f2 = fmap2.reshape(N, h * w, C) / 4.0
    corr = jnp.einsum("npc,nqc->npq", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr.reshape(N, h * w, h, w)
    levels = [corr]
    for _ in range(num_levels - 1):
        c = levels[-1]
        n, p, hh, ww = c.shape
        h2, w2 = hh // 2, ww // 2     # floor like torch avg_pool2d stride 2
        c = c[:, :, :2 * h2, :2 * w2]
        c = c.reshape(n, p, h2, 2, w2, 2).mean(axis=(3, 5))
        levels.append(c)
    return CorrPyramid(levels=levels)


def _lookup_level(vol, coords, radius):
    """vol (N, P, h2, w2); coords (N, h1, w1, 2) in level-l pixel units.
    Returns (N, h1, w1, (2r+1)^2) bilinear samples around coords."""
    N, P, h2, w2 = vol.shape
    _, h1, w1, _ = coords.shape
    assert P == h1 * w1
    r = radius
    k = 2 * r + 1

    x = coords[..., 0].reshape(N, P)
    y = coords[..., 1].reshape(N, P)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]          # (N, P, 1)
    fy = (y - y0)[..., None]

    dx = jnp.arange(-r, r + 1, dtype=jnp.int32)
    dy = jnp.arange(-r, r + 1, dtype=jnp.int32)
    # offsets enumerated dy-major to match the CUDA sampler's channel order
    oy, ox = jnp.meshgrid(dy, dx, indexing="ij")
    ox = ox.reshape(-1)               # (k*k,)
    oy = oy.reshape(-1)

    xi = x0.astype(jnp.int32)[..., None] + ox[None, None]   # (N, P, k*k)
    yi = y0.astype(jnp.int32)[..., None] + oy[None, None]

    volf = vol.reshape(N, P, h2 * w2)

    def corner(xc, yc):
        ok = (xc >= 0) & (xc < w2) & (yc >= 0) & (yc < h2)
        idx = jnp.clip(yc, 0, h2 - 1) * w2 + jnp.clip(xc, 0, w2 - 1)
        vals = jnp.take_along_axis(volf, idx, axis=2)
        return jnp.where(ok, vals, 0.0)

    v00 = corner(xi, yi)
    v01 = corner(xi + 1, yi)
    v10 = corner(xi, yi + 1)
    v11 = corner(xi + 1, yi + 1)
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return out.reshape(N, h1, w1, k * k)


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
