"""Pallas TPU tile rasterizer for 2D Gaussian surfels (forward + custom VJP).

TPU-native replacement for the blend stage of `diff_surfel_rasterization`
(reference call surface: /root/repo/SURVEY.md §2.9). Design notes:

* The grid is one step per (tile, chunk) pair, flattened to a single
  dimension ordered "all chunks of tile 0, all chunks of tile 1, ...".
  Scalar-prefetched arrays map each step to its tile and flag the first chunk
  (see ops/rasterizer/binning.py). Pallas pipelines the pair-data blocks
  (HBM->VMEM) automatically, and consecutive steps that write the same output
  tile keep the accumulator block resident in VMEM.

* Pair data is laid out feature-major (PK_PAD, P_CAP) so a chunk block
  (PK_PAD, chunk) has a 128-aligned lane dimension.

* Per (Gaussian, pixel) coverage is a ratio of ray-linear forms (see
  ops/rasterizer/projection.py): ~20 VPU FMAs + one reciprocal + one exp.
  Channel accumulation sum_i w_i * f_i runs on the MXU.

* Front-to-back blending w_i = a_i * prod_{j<i}(1 - a_j) uses an associative
  scan along the chunk axis plus per-pixel carries in VMEM scratch that live
  across grid steps (re-initialized at each tile's first chunk).

* The backward pass uses the suffix-sum identity
    dL/da_i = T_i * gw_i - S_i / (1 - a_i),
    S_i = sum_{k>i} gw_k w_k = S_tot - prefix_incl(gw * w),
  where S_tot per pixel is recovered from the *saved forward outputs*
  (every output channel is sum w_i f_i; the distortion channel equals
  A*D2 - D1^2, whose w-gradient needs only those totals). So the backward is
  a single front-to-back replay per tile — no reverse sweep, no atomics:
  each pair slot belongs to exactly one tile, so per-pair gradients land in
  disjoint output blocks, and the pair->Gaussian scatter-add happens outside
  as the VJP of the XLA gather.

Channel layout: see ops/rasterizer/naive.py (13 used, padded to 16 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import (ALPHA_EPS, FILTER_INV_SQUARE, PK_PAD, PK_WU, PK_WV,
                         PK_N, PK_CN, PK_C2X, PK_C2Y, PK_OPAC, PK_RGB,
                         PK_NRM, PK_FLOW)

TILE = 16
PIX = TILE * TILE          # 256 pixels per tile
CH_PAD = 16                # padded channel rows (13 used)
MAX_ALPHA = 0.999
MIN_HIT_Z = 0.05

# channel rows
CH_RGB = slice(0, 3)
CH_DEPTH = 3
CH_ALPHA = 4
CH_NRM = slice(5, 8)
CH_DIST = 8
CH_FLOW = slice(9, 11)
CH_WM = 11
CH_WM2 = 12

# early termination: once every pixel of a tile has transmittance below this,
# remaining (farther) chunks are skipped (2DGS CUDA stops at T < 1e-4 too)
T_EPS = 1e-4

# pair-gradient rows (match PK_* so callers can slice with the same names)
GR_PAD = PK_PAD            # 24 rows: grads for the 21 used packed fields
GR_SCORE_IMP = 21          # extra: sum_pix w   (importance score)
GR_SCORE_ERR = 22          # extra: sum_pix w * |g_rgb| (error score)


def _pixel_rays(tile_id, ntx, cam):
    """Per-pixel ray coords for a 16x16 tile flattened to 256 lanes.

    cam = (fx, fy, cx, cy) scalars; returns qx, qy, px, py each (1, PIX)."""
    fx, fy, cx, cy = cam
    ty = (tile_id // ntx).astype(jnp.float32)
    tx = (tile_id % ntx).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = tx * TILE + (p % TILE).astype(jnp.float32)
    py = ty * TILE + (p // TILE).astype(jnp.float32)
    qx = (px - cx) / fx
    qy = (py - cy) / fy
    return qx, qy, px, py


def _coverage(data, qx, qy, px, py):
    """alpha/z for a chunk of G pairs x 256 pixels.

    data (PK_PAD, G) feature-major; returns alpha (G, PIX), z (G, PIX) and
    backward intermediates.

    Layout note: each per-pair scalar is needed as a (G, 1) sublane vector
    broadcast over the PIX lanes, but the block arrives feature-major with
    G on lanes. Extracting rows one by one (`data[i, :][:, None]`) pays a
    lane->sublane relayout PER FIELD (~13 of them); transposing the whole
    block ONCE costs a single relayout and makes every extract a native
    sublane slice."""
    dataT = data.T                      # (G, PK_PAD)

    def col(i):
        return dataT[:, i:i + 1]

    u_num = col(PK_WU.start) * qx + col(PK_WU.start + 1) * qy + col(PK_WU.start + 2)
    v_num = col(PK_WV.start) * qx + col(PK_WV.start + 1) * qy + col(PK_WV.start + 2)
    den = col(PK_N.start) * qx + col(PK_N.start + 1) * qy + col(PK_N.start + 2)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    rcp = 1.0 / den
    u = u_num * rcp
    v = v_num * rcp
    z = col(PK_CN) * rcp
    rho3d = u * u + v * v
    dx = px - col(PK_C2X)
    dy = py - col(PK_C2Y)
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    sel3 = rho3d < rho2d
    rho = jnp.where(sel3, rho3d, rho2d)
    expval = jnp.exp(-0.5 * rho)
    a_raw = col(PK_OPAC) * expval
    keep = (a_raw >= ALPHA_EPS) & (z > MIN_HIT_Z)
    alpha = jnp.where(keep, jnp.minimum(a_raw, MAX_ALPHA), 0.0)
    live = keep & (a_raw < MAX_ALPHA)
    return alpha, z, (u, v, rcp, expval, sel3, live, dx, dy)


def _feature_rows(data):
    """(CH_PAD, G) per-pair-constant feature matrix for the MXU blend.
    Built with concatenate — `.at[].set` lowers to scatter, which Mosaic
    does not support inside kernels."""
    G = data.shape[1]
    zero = jnp.zeros((1, G), jnp.float32)
    one = jnp.ones((1, G), jnp.float32)
    return jnp.concatenate([
        data[PK_RGB, :],          # 0:3  rgb
        zero,                     # 3    depth (elementwise)
        one,                      # 4    alpha
        data[PK_NRM, :],          # 5:8  normal
        zero,                     # 8    dist (elementwise)
        data[PK_FLOW, :],         # 9:11 flow
        zero, zero,               # 11,12 wm/wm2 (elementwise)
        zero, zero, zero,         # 13:16 pad
    ], axis=0)


def _hillis_steele(op, x, identity):
    """Inclusive scan along axis 0 via log2(G) shifted ops (Mosaic-friendly:
    lax.associative_scan's recursion creates zero-size slices it can't
    lower)."""
    n = x.shape[0]
    y = x
    shift = 1
    while shift < n:
        pad = jnp.full((shift,) + x.shape[1:], identity, x.dtype)
        y = op(y, jnp.concatenate([pad, y[:-shift]], axis=0))
        shift *= 2
    return y


def _excl_scan_mul(x):
    """Exclusive cumprod along axis 0 and the total product (1, PIX)."""
    incl = _hillis_steele(jnp.multiply, x, 1.0)
    excl = jnp.concatenate([jnp.ones_like(x[:1]), incl[:-1]], axis=0)
    return excl, incl[-1:]


def _incl_scan_add(x):
    return _hillis_steele(jnp.add, x, 0.0)


def _md(z):
    return z / (1.0 + z)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(chunk_tile, chunk_first, meta, pair_ref, out_ref, carry):
    i = pl.program_id(0)
    tile_id = chunk_tile[i]
    flags = chunk_first[i]
    first = (flags & 1) == 1
    in_range = (flags & 2) == 2
    ntx = meta[4].astype(jnp.int32)
    cam = (meta[0], meta[1], meta[2], meta[3])

    @pl.when(first)
    def _():
        carry[0, :] = jnp.ones((PIX,), jnp.float32)   # transmittance

    # early termination: the whole tile is opaque already -> skip the chunk
    # (farther chunks of the same tile stay skipped since T only decreases);
    # padding chunks beyond n_chunks are skipped outright
    live_tile = in_range & (jnp.max(carry[0, :]) > T_EPS)

    @pl.when(live_tile)
    def _():
        qx, qy, px, py = _pixel_rays(tile_id, ntx, cam)
        data = pair_ref[:, :]
        alpha, z, _ = _coverage(data, qx, qy, px, py)

        T_excl, T_prod = _excl_scan_mul(1.0 - alpha)
        w = alpha * T_excl * carry[0, :][None, :]

        # NOTE: the 2DGS distortion channel is NOT accumulated here — per
        # pixel it equals A_tot*D2_tot - D1_tot^2 of the wm/wm2/alpha totals
        # we already emit (identical to the reference's per-splat prefix
        # accumulation, see naive.py); render.py computes it for free.
        md = _md(z)
        wmd = w * md
        wmd2 = wmd * md

        F = _feature_rows(data)
        mm = jax.lax.dot_general(F, w, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = jnp.concatenate([
            mm[CH_RGB, :],
            jnp.sum(w * z, axis=0)[None, :],
            mm[CH_ALPHA:CH_ALPHA + 1, :],
            mm[CH_NRM, :],
            jnp.zeros((1, PIX), jnp.float32),   # CH_DIST placeholder
            mm[CH_FLOW, :],
            jnp.sum(wmd, axis=0)[None, :],
            jnp.sum(wmd2, axis=0)[None, :],
            mm[13:, :],
        ], axis=0)

        carry[0, :] = carry[0, :] * T_prod[0]

        @pl.when(first)
        def _():
            out_ref[0, :, :] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            out_ref[0, :, :] = out_ref[0, :, :] + acc


def rasterize_forward(pair_data, chunk_tile, chunk_first, meta, num_tiles,
                      interpret=False):
    """pair_data (PK_PAD, P_CAP) tile-grouped; -> (num_tiles, CH_PAD, PIX)."""
    p_cap = pair_data.shape[1]
    c_cap = chunk_tile.shape[0]
    chunk = p_cap // c_cap

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c_cap,),
        in_specs=[
            pl.BlockSpec((PK_PAD, chunk), lambda i, ct, cf, m: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH_PAD, PIX),
                               lambda i, ct, cf, m: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, CH_PAD, PIX), jnp.float32),
        interpret=interpret,
    )(chunk_tile, chunk_first, meta, pair_data)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(chunk_tile, chunk_first, meta, pair_ref, out_saved_ref,
                g_ref, grad_ref, carry):
    i = pl.program_id(0)
    tile_id = chunk_tile[i]
    first = (chunk_first[i] & 1) == 1
    ntx = meta[4].astype(jnp.int32)
    cam = (meta[0], meta[1], meta[2], meta[3])

    g = g_ref[0, :, :]             # (CH_PAD, PIX) cotangent for this tile
    out = out_saved_ref[0, :, :]   # (CH_PAD, PIX) saved forward output
    flags = chunk_first[i]

    g_depth = g[CH_DEPTH, :][None, :]
    g_wm = g[CH_WM, :][None, :]
    g_wm2 = g[CH_WM2, :][None, :]

    # every emitted channel is sum_k w_k f_k (dist lives outside the kernel),
    # so S_tot = sum_k gw_k w_k = sum_c g_c out_c per pixel
    S_tot = jnp.sum(g * out, axis=0)[None, :]

    @pl.when(first)
    def _():
        carry[0, :] = jnp.ones((PIX,), jnp.float32)   # transmittance
        carry[1, :] = jnp.zeros((PIX,), jnp.float32)  # prefix of gw*w

    # early termination mirrors the forward: skipped chunks had w == 0, so
    # their gradients are exactly zero (the grad block must still be written)
    live_tile = ((flags & 2) == 2) & (jnp.max(carry[0, :]) > T_EPS)

    @pl.when(jnp.logical_not(live_tile))
    def _():
        grad_ref[:, :] = jnp.zeros_like(grad_ref)

    @pl.when(live_tile)
    def _():
        _bwd_chunk_body(tile_id, ntx, cam, pair_ref, g, g_depth, g_wm,
                        g_wm2, S_tot, grad_ref, carry)


def _bwd_chunk_body(tile_id, ntx, cam, pair_ref, g, g_depth, g_wm, g_wm2,
                    S_tot, grad_ref, carry):
    qx, qy, px, py = _pixel_rays(tile_id, ntx, cam)
    data = pair_ref[:, :]
    alpha, z, (u, v, rcp, expval, sel3, live, ddx, ddy) = _coverage(
        data, qx, qy, px, py)

    T_excl, T_prod = _excl_scan_mul(1.0 - alpha)
    T_run = T_excl * carry[0, :][None, :]
    w = alpha * T_run

    md = _md(z)
    F = _feature_rows(data)
    gw = jax.lax.dot_general(F, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (G, PIX)
    gw = gw + g_depth * z + g_wm * md + g_wm2 * md * md

    gww = gw * w
    prefix = _incl_scan_add(gww) + carry[1, :][None, :]
    S_after = S_tot - prefix
    one_minus = jnp.maximum(1.0 - alpha, 1.0 - MAX_ALPHA)
    da = T_run * gw - S_after / one_minus

    dmd_dz = (1.0 - md) * (1.0 - md)   # d/dz [z/(1+z)]
    gmd = g_wm * w + g_wm2 * 2.0 * md * w
    gz = g_depth * w + gmd * dmd_dz

    da_live = jnp.where(live, da, 0.0)
    opac = data.T[:, PK_OPAC:PK_OPAC + 1]   # CSEs with _coverage's data.T
    drho = -0.5 * opac * expval * da_live
    gu = jnp.where(sel3, drho * 2.0 * u, 0.0)
    gv = jnp.where(sel3, drho * 2.0 * v, 0.0)
    gc2x = jnp.where(sel3, 0.0, drho * (-2.0 * FILTER_INV_SQUARE) * ddx)
    gc2y = jnp.where(sel3, 0.0, drho * (-2.0 * FILTER_INV_SQUARE) * ddy)
    gopac_pix = expval * da_live

    gz_live = jnp.where(live, gz, 0.0)
    gun = gu * rcp
    gvn = gv * rcp
    gden = -(gu * u + gv * v + gz_live * z) * rcp
    gcn = gz_live * rcp

    # feature grads, pair-major: (G, PIX) @ (CH_PAD, PIX)^T -> (G, CH_PAD)
    wgT = jax.lax.dot_general(w, g, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # score accumulators (reference `scores.grad` semantics, SURVEY §2.9)
    g_rgb_mag = jnp.sum(jnp.abs(g[0:3, :]), axis=0)[None, :]

    # per-pair reductions as TWO MXU matmuls against pixel bases — the old
    # per-row `sum(axis=1)[None, :]` form paid a sublane->lane relayout for
    # every one of its 15 rows
    G = data.shape[1]
    basis3 = jnp.concatenate([qx, qy, jnp.ones_like(qx)], axis=0)  # (3,PIX)
    M3 = jax.lax.dot_general(
        jnp.concatenate([gun, gvn, gden], axis=0), basis3,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (3G, 3)
    ones1 = jnp.ones_like(qx)                          # (1, PIX)
    M1 = jax.lax.dot_general(
        jnp.concatenate([gcn, gc2x, gc2y, gopac_pix, w, w * g_rgb_mag],
                        axis=0), ones1,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (6G, 1)

    # columns in PK_* order, assembled pair-major then transposed ONCE
    gradsT = jnp.concatenate([
        M3[0:G], M3[G:2 * G], M3[2 * G:3 * G],         # PK_WU, PK_WV, PK_N
        M1[0:G],                                       # PK_CN
        M1[G:2 * G], M1[2 * G:3 * G],                  # PK_C2X/Y
        M1[3 * G:4 * G],                               # PK_OPAC
        wgT[:, CH_RGB],                                # PK_RGB
        wgT[:, CH_NRM],                                # PK_NRM
        wgT[:, CH_FLOW],                               # PK_FLOW
        M1[4 * G:5 * G],                               # GR_SCORE_IMP
        M1[5 * G:6 * G],                               # GR_SCORE_ERR
        jnp.zeros((G, 1), jnp.float32),
    ], axis=1)                                          # (G, GR_PAD)

    grad_ref[:, :] = gradsT.T.astype(grad_ref.dtype)

    carry[0, :] = carry[0, :] * T_prod[0]
    # NB: prefix[-1, :] would lower to (unsupported) dynamic_slice in Mosaic
    carry[1, :] = prefix[prefix.shape[0] - 1, :]


def rasterize_backward(pair_data, chunk_tile, chunk_first, meta, out_saved,
                       g_out, interpret=False, out_dtype=jnp.float32):
    """out_dtype=bfloat16 halves the (GR_PAD, P_CAP) grad write and lets
    the caller's gather-reduce stay bf16 end-to-end (pair-grad rounding
    ~2e-3 relative); the per-pair math inside stays f32."""
    p_cap = pair_data.shape[1]
    c_cap = chunk_tile.shape[0]
    chunk = p_cap // c_cap

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c_cap,),
        in_specs=[
            pl.BlockSpec((PK_PAD, chunk), lambda i, ct, cf, m: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH_PAD, PIX), lambda i, ct, cf, m: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH_PAD, PIX), lambda i, ct, cf, m: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GR_PAD, chunk), lambda i, ct, cf, m: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, PIX), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GR_PAD, p_cap), out_dtype),
        interpret=interpret,
    )(chunk_tile, chunk_first, meta, pair_data, out_saved, g_out)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rasterize_pairs(pair_data, chunk_tile, chunk_first, meta,
                    num_tiles, interpret=False):
    """Differentiable tile rasterization over packed pair data.

    pair_data (PK_PAD, P_CAP). Rows 0..20 are the projected surfel payload;
    rows GR_SCORE_IMP/GR_SCORE_ERR (21/22) are the all-zeros score-carrier
    columns the caller splices in — their *cotangent* comes back filled
    with per-pair (importance, error) scores, mirroring the reference's
    `_zeros.grad` trick (gaussian_base.py:71,392). Folding the carrier
    into the payload keeps the pair gather/segment-reduce to ONE (N, 24)
    pass per direction — the separate (N, 2) score gather cost as much as
    the payload gather (gathers are row-latency-bound, not bandwidth).
    Returns (num_tiles, CH_PAD, PIX).
    """
    return rasterize_forward(pair_data, chunk_tile, chunk_first, meta,
                             num_tiles, interpret=interpret)


def _rasterize_fwd(pair_data, chunk_tile, chunk_first, meta,
                   num_tiles, interpret):
    out = rasterize_forward(pair_data, chunk_tile, chunk_first, meta,
                            num_tiles, interpret=interpret)
    return out, (pair_data, out, chunk_tile, chunk_first, meta)


def _rasterize_bwd(num_tiles, interpret, res, g_out):
    pair_data, out_saved, chunk_tile, chunk_first, meta = res
    grads = rasterize_backward(pair_data, chunk_tile, chunk_first, meta,
                               out_saved, g_out, interpret=interpret)
    # rows 21/22 carry the scores back to the carrier columns; row 23 pad
    d_pair = grads[:PK_PAD, :].at[PK_PAD - 1:, :].set(0.0)
    return (d_pair, None, None, None)


rasterize_pairs.defvjp(_rasterize_fwd, _rasterize_bwd)
