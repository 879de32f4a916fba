"""Tile binning for the 2DGS rasterizer — pure XLA, non-differentiable.

Replaces the CUDA rasterizer's duplicate-keys + radix-sort binning stage
(reference surface: /root/repo/SURVEY.md §2.9 `diff_surfel_rasterization`)
with a single fixed-capacity argsort:

  1. every Gaussian emits up to KT = side*side (tile, gaussian) candidates
     covering its screen bbox (huge Gaussians are clamped to `side` tiles per
     axis — the reference prunes radii > 25 px anyway,
     /root/reference/scripts/gaussian/gaussian_model.py:122),
  2. candidates get a single uint32 key (tile_id << RANK_BITS | depth_rank)
     and one argsort groups them by tile, front-to-back within each tile,
  3. each tile's run is padded to a multiple of the kernel chunk size G so
     the Pallas grid can walk chunks with static shapes.

All shapes are static (jit-friendly): pair capacity P_CAP bounds the total
duplicated pairs; overflow is dropped from the far end (farthest Gaussians in
the largest tiles) and reported via `n_pairs`.

Because Gaussians barely move during one keyframe's 50-100 train iterations,
the binning can be computed once per (keyframe-window, camera) and *reused
across iterations* — pruning mid-training only flips alive masks, which zero
contributions without invalidating the pair lists. This amortizes the sort,
which a per-iteration CUDA radix sort does not need but a TPU argsort wants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedSurfels

TILE = 16
RANK_BITS = 20          # up to 2^20 visible Gaussians
MAX_TILES_AXIS = 4096   # key budget: tile ids need < 12 bits


class BinnedScene(NamedTuple):
    # COMPACT addressing: pair slots index into the depth-compacted table of
    # the v_cap nearest visible Gaussians (`sel` maps compact row -> original
    # id). Gathering pairs from a (V_CAP, 24) table instead of the full
    # (N, 24) one keeps the table small enough for XLA to hold it in VMEM
    # inside the training loop — random HBM row-gathers read a whole (8,128)
    # tile (4 KB) per 96-byte row and were the mapper's per-iteration floor.
    pair_idx: jnp.ndarray    # (P_CAP,) int32 COMPACT row index per pair slot
    pair_valid: jnp.ndarray  # (P_CAP,) bool
    sel: jnp.ndarray         # (V_CAP,) int32 compact row -> original id
    chunk_tile: jnp.ndarray  # (C_CAP,) int32 flat tile id per kernel chunk
    chunk_first: jnp.ndarray  # (C_CAP,) int32, 1 = first chunk of its tile
    n_chunks: jnp.ndarray    # () int32 — real chunk count (rest are no-ops)
    n_pairs: jnp.ndarray     # () int32 — real pair count before padding
    overflow: jnp.ndarray    # () bool — pair capacity exceeded (tail dropped)
    # INVERSE pair map: pair slot of compact row v's candidate k, or P_CAP
    # (an all-zeros sentinel row in the grad table) when absent. Each
    # compact row has at most K = side^2 pairs (one per candidate tile), so
    # the backward pair->Gaussian reduction can run as a GATHER
    # `grad_table[grad_tbl]` + sum over K instead of a scatter-add —
    # TPU row-gathers pipeline (~2 ns/row from a VMEM-resident table) while
    # scatter-adds serialize read-modify-write (~13 ns/row). None when the
    # binning was built with need_grad=False.
    grad_tbl: jnp.ndarray = None  # (V_CAP, K) int32
    # padded pair-slot demand (pad_off[T]): the capacity a bucket must
    # cover, >= n_pairs because each tile's run pads to a chunk multiple
    n_padded: jnp.ndarray = None  # () int32


def num_tiles(height, width, tile=TILE):
    return ((height + tile - 1) // tile, (width + tile - 1) // tile)


def _vsearch_left(a, v):
    """Vectorized searchsorted(a, v, side='left'): first index where
    a[i] >= v, for sorted int arrays. jnp.searchsorted lowers to a serial
    scalar-core loop on TPU (~3 us per query); this runs all queries as
    lane-parallel bisection — log2(n) vector gathers of |v| elements."""
    n = a.shape[0]
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)
    for _ in range(max(n, 1).bit_length() + 1):
        mid = (lo + hi) >> 1
        live = lo < hi
        pred = (a[jnp.clip(mid, 0, n - 1)] < v) & live
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred | ~live, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=("height", "width", "p_cap",
                                             "chunk", "side", "tile",
                                             "v_cap", "need_grad",
                                             "tile_cap"))
def bin_surfels(proj: ProjectedSurfels, *, height: int, width: int,
                p_cap: int, chunk: int = 128, side: int = 5,
                tile: int = TILE, v_cap: int = 0,
                need_grad: bool = True, tile_cap: int = 0) -> BinnedScene:
    """Build the tile-grouped pair list. See module docstring.

    v_cap > 0 compacts to the nearest v_cap visible Gaussians before
    candidate enumeration — the depth argsort both culls and orders, so the
    big (N*K) sort shrinks and needs no rank scatter."""
    N = proj.packed.shape[0]
    nty, ntx = num_tiles(height, width, tile)
    T = nty * ntx
    assert T < (1 << (32 - RANK_BITS)), "too many tiles for the sort key"
    K = side * side
    c_cap = p_cap // chunk
    if v_cap <= 0 or v_cap > N:
        v_cap = N
    assert v_cap <= (1 << RANK_BITS)

    # ---- compact to the v_cap nearest visible Gaussians, depth-ordered
    big = jnp.float32(jnp.inf)
    order = jnp.argsort(jnp.where(proj.visible, proj.depth, big))
    sel = order[:v_cap].astype(jnp.int32)          # row i == depth rank i

    # ---- ONE consolidated row gather for every per-Gaussian field this
    # binning needs. Row gathers are latency-bound (~10 ns/row regardless of
    # width), so seven separate `x[sel]` gathers cost 7x one (V, 8) gather.
    from .projection import PK_OPAC
    aux = jnp.concatenate([
        proj.center2d,                               # 0:2
        proj.cov2d,                                  # 2:5
        proj.packed[:, PK_OPAC:PK_OPAC + 1],         # 5
        proj.visible[:, None].astype(jnp.float32),   # 6
        jnp.zeros((N, 1), jnp.float32),              # pad to 8 lanes
    ], axis=1)[sel]                                  # (V, 8)
    visible = aux[:, 6] > 0.5

    # ---- candidate tiles per Gaussian (bbox clamped to side x side).
    # Anisotropic per-axis extents from the linearized screen covariance +
    # an opacity-aware cutoff (alpha = opac*exp(-q/2) >= 1/255 bounds the
    # footprint at q_cut = 2 ln(255 opac)) shrink the bbox vs the old
    # circumscribed-circle radius; the exact ellipse/rect test below then
    # drops the bbox tiles the ellipse doesn't touch (corner tiles, and
    # most of the row/column for elongated surfels).
    px, py = aux[:, 0], aux[:, 1]
    s00 = jnp.clip(aux[:, 2], 1e-8)
    s01 = aux[:, 3]
    s11 = jnp.clip(aux[:, 4], 1e-8)
    opac = aux[:, 5]
    q_cut = jnp.clip(2.0 * jnp.log(jnp.clip(opac, 1e-6) * 255.0), 0.05)
    sig = jnp.sqrt(q_cut)
    # the coverage is min(rho3d, rho2d) with rho2d = 2*d^2: the low-pass
    # filter alone reaches d = sqrt(q_cut/2) <= 2.36 px, and the ellipse is
    # a center linearization of the exact ray-splat rho3d — 2.5 px of slack
    # covers both
    MARGIN = 2.5
    rx = sig * jnp.sqrt(s00) + MARGIN
    ry = sig * jnp.sqrt(s11) + MARGIN
    tx0 = jnp.clip(jnp.floor((px - rx) / tile), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((py - ry) / tile), 0, nty - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((px + rx) / tile), 0, ntx - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((py + ry) / tile), 0, nty - 1).astype(jnp.int32)
    # clamp the span, keeping the center tile inside
    ctx = jnp.clip((px / tile).astype(jnp.int32), tx0, tx1)
    cty = jnp.clip((py / tile).astype(jnp.int32), ty0, ty1)
    tx0 = jnp.maximum(tx0, ctx - (side - 1))
    ty0 = jnp.maximum(ty0, cty - (side - 1))
    tx1 = jnp.minimum(tx1, tx0 + side - 1)
    ty1 = jnp.minimum(ty1, ty0 + side - 1)

    dk = jnp.arange(K, dtype=jnp.int32)
    dxk = (dk % side)[None, :]
    dyk = (dk // side)[None, :]
    tx = tx0[:, None] + dxk                      # (V, K)
    ty = ty0[:, None] + dyk
    cand_valid = (visible[:, None] & (tx <= tx1[:, None])
                  & (ty <= ty1[:, None]))

    # exact ellipse/tile-rect intersection: minimum of the conic quadratic
    # q(p) = (p-c)^T Sigma^{-1} (p-c) over the (margin-expanded) tile rect —
    # interior, else the min over each of the 4 edges with clamped argmin.
    # Keep the candidate iff q_min <= q_cut.
    detS = jnp.clip(s00 * s11 - s01 * s01, 1e-12)
    A = (s11 / detS)[:, None]                    # conic xx
    B = (-s01 / detS)[:, None]                   # conic xy
    D = (s00 / detS)[:, None]                    # conic yy
    rA = 1.0 / A
    rD = 1.0 / D
    x0 = tx.astype(jnp.float32) * tile - MARGIN - px[:, None]
    x1 = tx.astype(jnp.float32) * tile + (tile - 1) + MARGIN - px[:, None]
    y0 = ty.astype(jnp.float32) * tile - MARGIN - py[:, None]
    y1 = ty.astype(jnp.float32) * tile + (tile - 1) + MARGIN - py[:, None]
    inside = (x0 <= 0) & (0 <= x1) & (y0 <= 0) & (0 <= y1)

    def q_edge_x(xe):
        ys = jnp.clip(-B * xe * rD, y0, y1)
        return (A * xe + 2.0 * B * ys) * xe + D * ys * ys

    def q_edge_y(ye):
        xs = jnp.clip(-B * ye * rA, x0, x1)
        return (D * ye + 2.0 * B * xs) * ye + A * xs * xs

    q_min = jnp.minimum(jnp.minimum(q_edge_x(x0), q_edge_x(x1)),
                        jnp.minimum(q_edge_y(y0), q_edge_y(y1)))
    q_min = jnp.where(inside, 0.0, q_min)
    cand_valid &= q_min <= q_cut[:, None]
    tile_id = (ty * ntx + tx).astype(jnp.uint32)

    # ---- single sort groups by (tile, depth): row index IS the depth rank.
    # lax.sort carries (key, candidate-id) together — the argsort+`key[perm]`
    # re-gather it replaces was a 589k-scalar latency-bound gather (~4 ms).
    rank = jax.lax.broadcasted_iota(jnp.uint32, (v_cap, K), 0)
    INVALID = jnp.uint32(0xFFFFFFFF)
    key = jnp.where(cand_valid, (tile_id << RANK_BITS) | rank,
                    INVALID).reshape(-1)
    cand_id = jnp.arange(v_cap * K, dtype=jnp.int32)
    skey, perm = jax.lax.sort((key, cand_id), num_keys=1, is_stable=False)
    s_rank = perm // K                            # compact (depth-rank) row
    s_valid = skey != INVALID
    s_tile = (skey >> RANK_BITS).astype(jnp.int32)

    n_total = jnp.sum(s_valid.astype(jnp.int32))
    overflow = n_total > p_cap
    # keep only the first p_cap sorted candidates

    def fit(x, fill):
        if x.shape[0] >= p_cap:
            return x[:p_cap]
        pad = jnp.full((p_cap - x.shape[0],), fill, x.dtype)
        return jnp.concatenate([x, pad])

    s_rank = fit(s_rank, 0)
    s_k = fit((perm % K).astype(jnp.int32), 0)   # candidate tile ordinal
    s_valid = fit(s_valid, False)
    # invalid candidates carry tile id 0xFFF (> T), keeping the array sorted
    s_tile = fit(s_tile, (1 << (32 - RANK_BITS)) - 1)

    # ---- per-tile counts via VECTORIZED bisection on the SORTED tile ids
    # (jnp.searchsorted lowers to a serial scalar-core loop: ~1.2 ms per
    # camera for 406 queries; the hand-rolled bisection is ~20 gathers of
    # T+1 elements. The 589k-add segment_sum both replace was ~2.3 ms.)
    bounds = _vsearch_left(s_tile, jnp.arange(T + 1, dtype=jnp.int32))
    counts = bounds[1:] - bounds[:-1]                          # (T,)
    # per-tile depth cap: keep only the tile_cap NEAREST pairs of each tile
    # (candidates are depth-ordered within a tile, so the cap keeps a run
    # prefix). Transmittance saturates long before: T < 1e-4 after ~90
    # splats even at the 0.1 init opacity, and the kernel's early
    # termination already skips those pairs' COMPUTE — the cap also stops
    # paying their sort/gather/reduce cost. 0 = uncapped. At bench scale
    # (median 699, p99 1131 pairs/tile) tile_cap=512 drops ~34% of pairs.
    if tile_cap > 0:
        counts = jnp.minimum(counts, tile_cap)
    padded = ((counts + chunk - 1) // chunk) * chunk
    # every tile gets >= 1 chunk so its output block is initialized by the
    # kernel's first-chunk write (empty tiles render all-zero)
    padded = jnp.maximum(padded, chunk)
    pad_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(padded)]).astype(jnp.int32)  # (T+1,)
    raw_off = bounds

    # destination slot: padded tile start + within-tile depth rank, i.e.
    # dest = (pos - raw_off[t]) + pad_off[t]. Instead of two 262k gathers
    # from the offset tables (~4 ms of latency: 1-D gathers from small
    # tables still pay per-element latency), scatter each table's value at
    # its tile's run start and propagate with a running max — both tables
    # are nondecreasing in t, and empty tiles share a boundary position
    # where the max picks the right (latest) value.
    pos = jnp.arange(p_cap, dtype=jnp.int32)
    raw_at = jnp.zeros((p_cap,), jnp.int32).at[raw_off[:T]].max(
        raw_off[:T], mode="drop")
    raw_at = jax.lax.associative_scan(jnp.maximum, raw_at)
    pad_at = jnp.zeros((p_cap,), jnp.int32).at[raw_off[:T]].max(
        pad_off[:T], mode="drop")
    pad_at = jax.lax.associative_scan(jnp.maximum, pad_at)
    rank_in_tile = pos - raw_at
    keep = s_valid if tile_cap <= 0 else s_valid & (rank_in_tile < tile_cap)
    dest = jnp.where(keep, rank_in_tile + pad_at, p_cap)
    # clamp: padded layout may not fit in p_cap when overflowing
    dest = jnp.where(dest < p_cap, dest, p_cap)
    s_valid = keep

    # ONE packed scatter for (compact row, valid): bit 22 carries validity.
    # Invalid slots resolve to compact row v_cap — the render-side gather
    # table carries one extra all-zeros row there, so padding pairs read a
    # dead payload with NO per-pair validity multiply (render.py:46-75).
    packed_slot = jnp.where(s_valid, s_rank + (1 << 22), 0)
    slots = jnp.zeros((p_cap,), jnp.int32).at[dest].set(packed_slot,
                                                        mode="drop")
    pair_valid = slots >= (1 << 22)
    pair_idx = jnp.where(pair_valid, slots & ((1 << 22) - 1), v_cap)

    # ---- chunk metadata: rank of each chunk among the (T+1,) padded chunk
    # boundaries. The boundary array is small, so a fused compare-matrix
    # reduce beats both jnp.searchsorted (serial scalar loop, ~1.2 ms) and
    # bisection here.
    chunk_bounds = pad_off // chunk               # (T+1,) monotone
    total_chunks = jnp.minimum(chunk_bounds[-1], c_cap)
    cidx = jnp.arange(c_cap, dtype=jnp.int32)
    chunk_tile = jnp.sum(chunk_bounds[None, :] <= cidx[:, None],
                         axis=1).astype(jnp.int32) - 1
    chunk_tile = jnp.clip(chunk_tile, 0, T - 1).astype(jnp.int32)
    chunk_first = (cidx == chunk_bounds[chunk_tile]).astype(jnp.int32)
    # out-of-range chunks: retarget at the last real tile, never "first",
    # flagged not-in-range so the kernel skips their per-pair math entirely
    last_tile = chunk_tile[jnp.maximum(total_chunks - 1, 0)]
    in_range = cidx < total_chunks
    chunk_tile = jnp.where(in_range, chunk_tile, last_tile)
    # packed flags: bit0 = first chunk of tile, bit1 = in range
    chunk_first = jnp.where(in_range, chunk_first, 0) + \
        2 * in_range.astype(jnp.int32)

    # ---- inverse pair map for the backward GATHER-reduce (see BinnedScene
    # docstring): one more fixed-size set-scatter, amortized over the
    # 25-50 train iterations that reuse this binning. Values are `dest`
    # directly: candidates dropped by the p_cap clamp carry dest == p_cap,
    # which is exactly the grad table's all-zeros sentinel row.
    grad_tbl = None
    if need_grad:
        tgt = jnp.where(s_valid, s_rank * K + s_k, v_cap * K)
        grad_tbl = jnp.full((v_cap * K,), p_cap, jnp.int32).at[tgt].set(
            dest, mode="drop").reshape(v_cap, K)
    n_kept = jnp.sum(counts) if tile_cap > 0 else jnp.minimum(n_total,
                                                              p_cap)
    # pair slots are laid out PADDED (each tile's run padded to a chunk
    # multiple), so capacity demand is pad_off[T], not the raw pair count —
    # when it exceeds p_cap the dest clamp silently drops the trailing
    # tiles' pairs. Report it so the capacity tuner sizes buckets on the
    # real demand, and flag overflow either way.
    n_padded = pad_off[T]
    overflow = overflow | (n_padded > p_cap)
    return BinnedScene(pair_idx=pair_idx, pair_valid=pair_valid, sel=sel,
                       chunk_tile=chunk_tile, chunk_first=chunk_first,
                       n_chunks=total_chunks.astype(jnp.int32),
                       n_pairs=n_kept, overflow=overflow,
                       grad_tbl=grad_tbl, n_padded=n_padded)
