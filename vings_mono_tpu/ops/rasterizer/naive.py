"""Naive (per-pixel x all-Gaussians) 2DGS renderer in pure XLA.

This is the *numeric specification* for the Pallas tile rasterizer: fully
differentiable via JAX autodiff, used in tests to validate the tile kernel's
forward outputs and custom-VJP gradients, and as a fallback for tiny scenes.
O(H*W*N) — only use for small N.

Channel layout shared with the tile kernel (mirrors the reference rasterizer's
`allmap`, /root/reference/scripts/gaussian/gaussian_base.py:204-224):
  0:3  rgb               (front-to-back alpha blend, black background)
  3    depth_sum         (sum w_i * z_i; expected depth = depth_sum / alpha)
  4    alpha             (sum w_i)
  5:8  normal            (sum w_i * n_i, camera frame)
  8    dist              (2DGS depth-distortion accumulator)
  9:11 flow              (sum w_i * flow_i — the u2_minus_u1 channel)
  11   wm                (sum w_i * m_i,  m = contracted depth)  [bwd aux]
  12   wm2               (sum w_i * m_i^2)                       [bwd aux]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import (ALPHA_EPS, FILTER_INV_SQUARE, CUTOFF_SIGMA, Camera,
                         PK_WU, PK_WV, PK_N, PK_CN, PK_C2X, PK_C2Y, PK_OPAC,
                         PK_RGB, PK_NRM, PK_FLOW)

NUM_CHANNELS = 13
MAX_ALPHA = 0.999  # 2DGS clamps per-splat alpha at 0.99; keep T > 0


def contract_depth(z):
    """Map depth to [0, 1) for the distortion accumulator."""
    return z / (1.0 + z)


def pair_alpha(packed_g, qx, qy):
    """Per (gaussian, pixel) alpha. packed_g (..., PK_PAD); qx/qy pixel-ray
    coords ((px-cx)/fx etc.) broadcastable against leading dims.

    Returns (alpha, z) with z the ray-splat intersection depth.
    """
    wu = packed_g[..., PK_WU]
    wv = packed_g[..., PK_WV]
    n = packed_g[..., PK_N]
    cn = packed_g[..., PK_CN]
    u_num = wu[..., 0] * qx + wu[..., 1] * qy + wu[..., 2]
    v_num = wv[..., 0] * qx + wv[..., 1] * qy + wv[..., 2]
    den = n[..., 0] * qx + n[..., 1] * qy + n[..., 2]
    rcp = 1.0 / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    u = u_num * rcp
    v = v_num * rcp
    z = cn * rcp
    rho3d = u * u + v * v
    return rho3d, z


def render_naive(packed, order, n_valid_mask, camera: Camera, fx, fy, cx, cy,
                 bg=None):
    """Render with a plain cumprod over depth-sorted Gaussians.

    packed: (N, PK_PAD) from project_surfels, *already depth-sorted* via
    `order` (int32 (N,) permutation); n_valid_mask (N,) bool marks entries
    (post-permutation) that should contribute.
    Returns out (NUM_CHANNELS, H, W).
    """
    H, W = camera.height, camera.width
    p = packed[order]                       # (N, C) sorted front-to-back
    m = n_valid_mask

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # pixel centers at integer coords (matches CUDA's pixf = {x, y})
    qx = ((xs - cx) / fx).reshape(-1)       # (P,)
    qy = ((ys - cy) / fy).reshape(-1)

    rho3d, z = pair_alpha(p[:, None, :], qx[None, :], qy[None, :])  # (N, P)
    # screen-space low-pass: never sharper than the 2D filter
    dx = xs.reshape(-1)[None, :] - p[:, PK_C2X][:, None]
    dy = ys.reshape(-1)[None, :] - p[:, PK_C2Y][:, None]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    a_raw = p[:, PK_OPAC][:, None] * jnp.exp(-0.5 * rho)
    keep = m[:, None] & (a_raw >= ALPHA_EPS) & (z > 0.05)
    alpha = jnp.where(keep, jnp.minimum(a_raw, MAX_ALPHA), 0.0)

    # front-to-back weights: w_i = a_i * prod_{j<i} (1 - a_j)
    T_excl = jnp.concatenate([jnp.ones_like(alpha[:1]),
                              jnp.cumprod(1.0 - alpha, axis=0)[:-1]], axis=0)
    w = alpha * T_excl                       # (N, P)

    md = contract_depth(z)
    # distortion channel: sum_{i<j} w_i w_j (m_i - m_j)^2 — algebraically
    # equal to A_tot*D2_tot - D1_tot^2, computed from the totals in render.py
    # (same for the tile kernel), so the channel here is a placeholder.
    dist = jnp.zeros_like(z[0])

    rgb = jnp.einsum("np,nc->cp", w, p[:, PK_RGB])
    depth_sum = jnp.sum(w * z, axis=0)
    acc = jnp.sum(w, axis=0)
    nrm = jnp.einsum("np,nc->cp", w, p[:, PK_NRM])
    flow = jnp.einsum("np,nc->cp", w, p[:, PK_FLOW])
    wm = jnp.sum(w * md, axis=0)
    wm2 = jnp.sum(w * md * md, axis=0)

    out = jnp.concatenate([
        rgb, depth_sum[None], acc[None], nrm, dist[None], flow,
        wm[None], wm2[None]], axis=0)
    if bg is not None:
        out = out.at[:3].add((1.0 - acc)[None] * bg[:, None])
    return out.reshape(NUM_CHANNELS, H, W)
