"""High-level differentiable 2DGS render: the TPU equivalent of the
reference's `GaussianRasterizer(...)` call (gaussian_base.py:160-203).

Pipeline (all jit-friendly, static shapes):
  project_surfels (JAX, differentiable)
    -> bin_surfels (XLA argsort, non-differentiable, *cacheable per camera*)
    -> gather pair data (differentiable; its VJP is the pair->Gaussian
       scatter-add that replaces CUDA atomics)
    -> rasterize_pairs (Pallas tile kernel with custom VJP)
    -> unpack to image maps.

Returned dict mirrors the reference's `rets` (gaussian_base.py:205-228):
  rgb (3,H,W), depth (1,H,W expected depth), accum (1,H,W), normal (3,H,W,
  camera frame — caller rotates to world), dist (1,H,W), flow (2,H,W),
  radii (N,), visible (N,), plus wm/wm2 aux rows.

Per-Gaussian (importance, error) scores flow through `score_carrier`: pass a
zeros (N, 2) array; its gradient after a backward pass holds the scores
(reference `_zeros.grad`, gaussian_base.py:392).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import Camera, ProjectedSurfels, project_surfels, PK_PAD
from .binning import BinnedScene, bin_surfels, num_tiles, TILE
from .tile_kernel import (rasterize_forward, rasterize_backward, CH_PAD,
                          PIX)
from . import naive as naive_mod


def _unpack_tiles(out_tiles, height, width):
    """(T, CH_PAD, PIX) -> (CH_PAD, H, W)."""
    nty, ntx = num_tiles(height, width)
    x = out_tiles.reshape(nty, ntx, CH_PAD, TILE, TILE)
    x = jnp.transpose(x, (2, 0, 3, 1, 4)).reshape(CH_PAD, nty * TILE,
                                                  ntx * TILE)
    return x[:, :height, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _gather_rasterize(packed, score_carrier, sel, pair_idx, grad_tbl,
                      chunk_tile, chunk_first, meta, num_tiles, interpret):
    """Pair gather + tile rasterization under ONE custom VJP.

    Forward: row-gather pairs <- gaussians in TWO hops through the
    depth-compacted (V_CAP + 1, 24) table (`compact = packed[sel]`, then
    `compact[pair_idx]`). A random row gather from the (N, 24) f32 table
    reads one (8,128) tile (4 KB) per 96-byte row; the compact table is
    small enough for XLA to keep in VMEM across the training loop (the
    barrier stops XLA from re-fusing the two hops into one big-table
    gather). Invalid pair slots index the appended all-zeros row V_CAP, so
    there is no per-pair validity multiply in either direction.

    Backward: the Pallas kernel emits per-pair grads in BF16 (the f32
    (GR_PAD, P) write plus its transpose and cast cost ~0.5 ms/iter of
    pure lane-padded HBM traffic), and the pair->Gaussian reduction runs
    as K unrolled 2D gathers through `grad_tbl` (the binning's (V_CAP, K)
    inverse pair map) + an f32 add chain: row-gathers from a VMEM-resident
    table pipeline at ~2 ns/row while the scatter-add a segment_sum lowers
    to serializes read-modify-write at ~13 ns/row (3.4 -> ~1.1 ms/iter at
    bench scale). A single 3D `gp[grad_tbl]` gather was tried and lost the
    win to (V, K, C) tile padding. bf16 rounding of pair grads (~2e-3
    relative) is inside Adam's noise floor; grad_tbl=None selects the
    exact f32 segment-sum fallback (render(grad_reduce='f32')). The
    result expands back through `sel` (unique rows — a permutation prefix
    — so the set-scatter is exact).

    score_carrier (N, 2) is all-zeros by contract: it contributes nothing
    forward, but its cotangent returns the per-Gaussian (importance,
    error) scores from the kernel's carrier columns (reference
    `_zeros.grad`, gaussian_base.py:71,392) without materializing a
    separate (N, 24) extended payload."""
    del score_carrier, grad_tbl
    compact = jax.lax.optimization_barrier(
        jnp.concatenate([packed[sel],
                         jnp.zeros((1, packed.shape[1]), packed.dtype)]))
    pair_data = compact[pair_idx].T
    return rasterize_forward(pair_data, chunk_tile, chunk_first, meta,
                             num_tiles, interpret=interpret)


def _gather_rasterize_fwd(packed, score_carrier, sel, pair_idx, grad_tbl,
                          chunk_tile, chunk_first, meta, num_tiles,
                          interpret):
    del score_carrier
    compact = jax.lax.optimization_barrier(
        jnp.concatenate([packed[sel],
                         jnp.zeros((1, packed.shape[1]), packed.dtype)]))
    pair_data = compact[pair_idx].T
    out = rasterize_forward(pair_data, chunk_tile, chunk_first, meta,
                            num_tiles, interpret=interpret)
    return out, (packed.shape[0], sel, pair_idx, grad_tbl, pair_data, out,
                 chunk_tile, chunk_first, meta)


def _gather_rasterize_bwd(num_tiles, interpret, res, g_out):
    (n, sel, pair_idx, grad_tbl, pair_data, out_saved, chunk_tile,
     chunk_first, meta) = res
    bf16 = grad_tbl is not None
    grads = rasterize_backward(
        pair_data, chunk_tile, chunk_first, meta, out_saved, g_out,
        interpret=interpret,
        out_dtype=jnp.bfloat16 if bf16 else jnp.float32)   # (GR_PAD, P)
    g = grads.T                                            # (P, GR_PAD)
    if bf16:
        gp = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
        seg = gp[grad_tbl[:, 0]].astype(jnp.float32)
        for k in range(1, grad_tbl.shape[1]):
            seg = seg + gp[grad_tbl[:, k]].astype(jnp.float32)
    else:
        seg = jax.ops.segment_sum(
            g, pair_idx, num_segments=sel.shape[0] + 1)[:-1]  # (V, C)
    full = jnp.zeros((n, g.shape[1]), jnp.float32).at[sel].set(seg)
    # the carrier's cotangent is the score columns; projection's VJP never
    # reads packed cols 21:23, so `full` can be returned for both without
    # zeroing them (the kernel writes zeros in pad column 23)
    from .tile_kernel import GR_SCORE_IMP, GR_SCORE_ERR
    return (full, full[:, GR_SCORE_IMP:GR_SCORE_ERR + 1], None, None, None,
            None, None, None)


_gather_rasterize.defvjp(_gather_rasterize_fwd, _gather_rasterize_bwd)


def rasterize_binned(packed, score_carrier, binned: BinnedScene,
                     camera: Camera, interpret=False):
    """Render pre-binned surfels. packed (N, PK_PAD) differentiable.

    The (N, 2) score carrier rides the payload's pad columns (which are
    zero, like the carrier) so pairs are gathered (and their grads
    reduced) in ONE (N, 24) pass — profiling showed the separate score
    gather costing as much as the payload gather."""
    nty, ntx = num_tiles(camera.height, camera.width)
    meta = jnp.asarray([camera.fx, camera.fy, camera.cx, camera.cy,
                        jnp.float32(ntx), 0.0, 0.0, 0.0], jnp.float32)
    out_tiles = _gather_rasterize(packed, score_carrier, binned.sel,
                                  binned.pair_idx, binned.grad_tbl,
                                  binned.chunk_tile, binned.chunk_first,
                                  meta, nty * ntx, interpret)
    return _unpack_tiles(out_tiles, camera.height, camera.width)


def _channels_to_rets(ch, proj: ProjectedSurfels):
    alpha = ch[4:5]
    # clamp the alpha divisor: at barely-covered pixels 1/alpha explodes
    # the depth-loss gradient (d depth/d alpha ~ 1/alpha^2) — this was the
    # root of a dist+depth loss NaN blowup on low-coverage scenes; pixels
    # with alpha < 1e-3 carry no reliable expected depth anyway
    depth = ch[3:4] / jnp.maximum(alpha, 1e-3)
    wm, wm2 = ch[11:12], ch[12:13]
    # 2DGS distortion sum_{i<j} w_i w_j (m_i - m_j)^2 == A*D2 - D1^2;
    # computing it from the emitted totals keeps per-pair prefix scans out of
    # the tile kernel (gradients flow through alpha/wm/wm2 automatically)
    dist = alpha * wm2 - wm * wm
    return {
        "rgb": ch[0:3],
        "depth": jnp.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0),
        "accum": alpha,
        "normal": ch[5:8],          # camera frame
        "dist": dist,
        "flow": ch[9:11],
        "wm": wm,
        "wm2": wm2,
        "radii": jnp.where(proj.visible, proj.radius, 0.0),
        "visible": proj.visible,
    }


def render(xyz, log_scale, quat, logit_opacity, rgb, camera: Camera, *,
           alive=None, flow=None, score_carrier=None,
           binned: Optional[BinnedScene] = None,
           p_cap: int = 1 << 21, chunk: int = 128, side: int = 5,
           v_cap: int = 0, tile_cap: int = 0, impl: str = "tile",
           interpret=False, grad_reduce: str = "bf16"):
    """Full differentiable render from raw Gaussian parameters.

    `binned` may be passed in to reuse a cached binning across training
    iterations on the same camera (positions drift little within a
    keyframe's 50-100 iters; pruning flips `alive`, which re-projects to
    zero opacity without invalidating the cached pair lists).

    grad_reduce selects the backward pair->Gaussian reduction: "bf16"
    (default) gathers bf16 pair grads through the binning's inverse pair
    map (~2.5x faster, ~2e-3 relative rounding); "f32" keeps the exact
    segment-sum.
    """
    proj = project_surfels(xyz, log_scale, quat, logit_opacity, rgb, camera,
                           alive=alive, flow=flow)
    if score_carrier is None:
        score_carrier = jnp.zeros((xyz.shape[0], 2), jnp.float32)

    if impl == "naive":
        order = jnp.argsort(jnp.where(proj.visible, proj.depth, jnp.inf))
        mask = proj.visible[order]
        # score_carrier flows additively so its grad picks up scores — the
        # naive path approximates only the importance column via autodiff
        ch = naive_mod.render_naive(proj.packed, order, mask, camera,
                                    camera.fx, camera.fy, camera.cx,
                                    camera.cy)
        return _channels_to_rets(ch, proj)

    if binned is None:
        binned = bin_surfels(jax.tree.map(jax.lax.stop_gradient, proj),
                             height=camera.height, width=camera.width,
                             p_cap=p_cap, chunk=chunk, side=side,
                             v_cap=v_cap, tile_cap=tile_cap)
    if grad_reduce == "f32" and binned.grad_tbl is not None:
        binned = binned._replace(grad_tbl=None)
    ch = rasterize_binned(proj.packed, score_carrier, binned, camera,
                          interpret=interpret)
    return _channels_to_rets(ch, proj)


def bin_for_camera(xyz, log_scale, quat, logit_opacity, rgb, camera: Camera,
                   *, alive=None, p_cap: int = 1 << 21, chunk: int = 128,
                   side: int = 5, v_cap: int = 0, tile_cap: int = 0,
                   need_grad: bool = True) -> BinnedScene:
    """Compute a cacheable binning for `camera` at the current parameters.

    need_grad=False skips the backward inverse pair map (one set-scatter)
    for forward-only consumers."""
    proj = project_surfels(xyz, log_scale, quat, logit_opacity, rgb, camera,
                           alive=alive)
    proj = jax.tree.map(jax.lax.stop_gradient, proj)
    return bin_surfels(proj, height=camera.height, width=camera.width,
                       p_cap=p_cap, chunk=chunk, side=side, v_cap=v_cap,
                       tile_cap=tile_cap, need_grad=need_grad)
