"""Micro-bench: pair-grad -> compact-Gaussian reduction variants at bench
scale (the `_take_rows` VJP, render.py:76-85 — the top non-kernel cost in
the mapper train loop at ~3.4 ms/iter for the unsorted segment_sum).

Variants:
  A  segment_sum over unsorted pair_idx (current)
  B  fixed-fan-in gather: (V+1, K) table of pair slots per compact row,
     one (V+1)*K row gather from the (P+1, C) pair-grad table, sum over K
  C  like B but the pair-grad table is cast to bf16 behind an
     optimization_barrier (small enough for XLA to stage in VMEM)
  D  like C but table padded to 32 lanes (layout probe)

Timing: each variant runs R times inside one jitted fori_loop with an
iteration-dependent input (prevents hoisting); wall/R after one warm call.
Run: python scripts/bench_scatter.py
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.mapper.train import KeyframeBatch, bin_stack
from vings_mono_tpu.mapper.densify import add_frame
from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

H, W = 240, 432
cfg = load_config(overrides={
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 128, "side": 3, "visible_capacity": 1 << 16,
               "kf_capacity": 8,
               "points_per_frame": 20000, "points_first_frame": 30000},
})
mapper = GaussianMapper(cfg)
rng = np.random.default_rng(0)
K = 8
imgs = jnp.asarray(rng.uniform(0, 1, (K, 3, H, W)), jnp.float32)
depths = jnp.asarray(rng.uniform(2, 20, (K, 1, H, W)), jnp.float32)
covs = jnp.full((K, 1, H, W), 0.01, jnp.float32)
w2cs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1))
w2cs = w2cs.at[:, 0, 3].set(jnp.arange(K) * 0.1)
batch = KeyframeBatch(images=imgs, depths=depths, depths_cov=covs,
                      w2cs=w2cs, global_kf_id=jnp.arange(K, dtype=jnp.int32),
                      n_valid=jnp.asarray(K, jnp.int32))
intr4 = jnp.asarray([220.0, 220.0, W / 2, H / 2], jnp.float32)
key = jax.random.PRNGKey(0)
for i in range(2):
    mapper.state, mapper.opt, n, _ = add_frame(
        mapper.state, mapper.opt, batch.w2cs[i], intr4, batch.images[i],
        batch.depths[i], jax.random.fold_in(key, i), batch.global_kf_id[i],
        height=H, width=W, n_points=30000, first=True,
        render_kwargs=mapper.render_kwargs)
jax.block_until_ready(mapper.state.xyz)

binned = bin_stack(mapper.state, batch, intr4, H, W, **mapper.bin_kwargs)
pair_idx = np.asarray(binned.pair_idx[0])      # (P,) compact row or V
sel = np.asarray(binned.sel[0])
P = pair_idx.shape[0]
V = sel.shape[0]
SIDE = mapper.bin_kwargs.get("side", 3)
KMAX = SIDE * SIDE
C = 24
print(f"P={P} V={V} valid_pairs={(pair_idx < V).sum()} KMAX={KMAX}",
      flush=True)

# host-built (V+1, KMAX) inverse table: pair slots per compact row
tbl = np.full((V + 1, KMAX), P, np.int32)
fill = np.zeros(V + 1, np.int32)
valid = pair_idx < V
rows = pair_idx[valid]
slots = np.nonzero(valid)[0].astype(np.int32)
deg = np.zeros(V + 1, np.int32)
for r, s in zip(rows, slots):
    if deg[r] < KMAX:
        tbl[r, deg[r]] = s
        deg[r] += 1
print(f"max degree={deg.max()} mean={deg[:V].mean():.2f}", flush=True)

g0 = jnp.asarray(rng.standard_normal((P, C)), jnp.float32)
pair_idx_d = jnp.asarray(pair_idx)
tbl_d = jnp.asarray(tbl)
R = 50


def timeit(name, fn):
    reps = jax.jit(lambda g: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + fn(g * (1.0 + 1e-6 * i)),
        jnp.zeros((V + 1, C), jnp.float32)))
    out = reps(g0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = reps(g0)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3 / R
    print(f"{name:<40} {ms:7.3f} ms", flush=True)
    return out / R  # approx (scaled) for sanity


def v_a(g):
    return jax.ops.segment_sum(g, pair_idx_d, num_segments=V + 1)


def v_b(g):
    gp = jnp.concatenate([g, jnp.zeros((1, C), g.dtype)])
    return jnp.sum(gp[tbl_d], axis=1)


def v_c(g):
    gp = jax.lax.optimization_barrier(
        jnp.concatenate([g, jnp.zeros((1, C), g.dtype)]).astype(jnp.bfloat16))
    return jnp.sum(gp[tbl_d].astype(jnp.float32), axis=1)


def v_d(g):
    gp = jnp.concatenate([g, jnp.zeros((1, C), g.dtype)])
    gp = jnp.pad(gp, ((0, 0), (0, 8)))
    gp = jax.lax.optimization_barrier(gp.astype(jnp.bfloat16))
    return jnp.sum(gp[tbl_d].astype(jnp.float32), axis=1)[:, :C]


# ---- sorted-domain variants: pairs permuted so each compact row's <=K
# pairs are contiguous; reduce via segmented Hillis-Steele scan (4 passes
# for K<=16) + ONE boundary gather. The permute is a bijection (every pair
# slot read exactly once) unlike the (V+1,K) table gather.
order = np.argsort(pair_idx, kind="stable").astype(np.int32)   # (P,)
rid = pair_idx[order]                                          # sorted rows
bounds = np.searchsorted(rid, np.arange(V + 1)).astype(np.int32)  # (V+1,)
mask_v = jnp.asarray((bounds[1:] > bounds[:-1]).astype(np.float32))  # (V,)
last = np.clip(bounds[1:] - 1, 0, P - 1).astype(np.int32)      # (V,)
order_d = jnp.asarray(order)
rid_d = jnp.asarray(rid.astype(np.int32))
last_d = jnp.asarray(last)
nseg = int(np.ceil(np.log2(KMAX)))


def seg_scan_reduce2(gs):
    s = gs
    shift = 1
    for _ in range(nseg):
        same = (rid_d[shift:] == rid_d[:-shift])[:, None]
        pad = jnp.zeros((shift, gs.shape[1]), gs.dtype)
        s = s + jnp.concatenate([pad, jnp.where(same, s[:-shift], 0)])
        shift *= 2
    return s[last_d] * mask_v[:, None]


def v_e(g):
    gs = g[order_d]
    return jnp.concatenate([seg_scan_reduce2(gs),
                            jnp.zeros((1, C), g.dtype)])


def v_f(g):
    gs = jax.lax.optimization_barrier(g.astype(jnp.bfloat16))[order_d]
    return jnp.concatenate(
        [seg_scan_reduce2(gs.astype(jnp.float32)),
         jnp.zeros((1, C), g.dtype)])


def v_g(g):  # pure permute gather cost probe (wrong values, same (V+1,C))
    gs = g[order_d]
    return gs[:V + 1]


def v_h(g):  # bf16 permute probe
    gs = jax.lax.optimization_barrier(g.astype(jnp.bfloat16))[order_d]
    return gs[:V + 1].astype(jnp.float32)


def v_i(g):  # sorted segment_sum
    gs = g[order_d]
    return jax.ops.segment_sum(gs, rid_d, num_segments=V + 1,
                               indices_are_sorted=True)


# ---- feature-major variants: the bwd kernel already emits grads as
# (C, P); (P, 24) row-major arrays pad lanes 24->128 (5.3x bandwidth).
def timeit_fm(name, fn):
    g0T = g0.T  # (C, P)
    reps = jax.jit(lambda g: jax.lax.fori_loop(
        0, R, lambda i, acc: acc + fn(g * (1.0 + 1e-6 * i)),
        jnp.zeros((V + 1, C), jnp.float32)))
    out = reps(g0T)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = reps(g0T)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) * 1e3 / R
    print(f"{name:<40} {ms:7.3f} ms", flush=True)
    return out / R


def seg_scan_fm(gs):
    """Segmented inclusive scan along lanes; gs (C, P)."""
    s = gs
    shift = 1
    for _ in range(nseg):
        same = (rid_d[shift:] == rid_d[:-shift])[None, :]
        pad = jnp.zeros((s.shape[0], shift), s.dtype)
        s = s + jnp.concatenate(
            [pad, jnp.where(same, s[:, :-shift], 0)], axis=1)
        shift *= 2
    return s


def v_j(g):  # g (C, P) f32
    gs = g[:, order_d]
    s = seg_scan_fm(gs)
    seg = (s[:, last_d] * mask_v[None, :]).T
    return jnp.concatenate([seg, jnp.zeros((1, C), jnp.float32)])


def v_k(g):  # g (C, P) bf16 permute, f32 scan
    gs = jax.lax.optimization_barrier(
        g.astype(jnp.bfloat16))[:, order_d].astype(jnp.float32)
    s = seg_scan_fm(gs)
    seg = (s[:, last_d] * mask_v[None, :]).T
    return jnp.concatenate([seg, jnp.zeros((1, C), jnp.float32)])


def v_l(g):  # lane permute probe f32
    return g[:, order_d][:, :V + 1].T


def v_m(g):  # full bf16 chain
    gs = jax.lax.optimization_barrier(
        g.astype(jnp.bfloat16))[:, order_d]
    s = seg_scan_fm(gs)
    seg = (s[:, last_d].astype(jnp.float32) * mask_v[None, :]).T
    return jnp.concatenate([seg, jnp.zeros((1, C), jnp.float32)])


def v_n(g):  # bf16 permute + f32 sorted segment_sum  (the candidate)
    gs = jax.lax.optimization_barrier(g.astype(jnp.bfloat16))[order_d]
    return jax.ops.segment_sum(gs.astype(jnp.float32), rid_d,
                               num_segments=V + 1,
                               indices_are_sorted=True)


def v_o(g):  # same without barrier (does XLA fuse the cast into gather?)
    gs = g.astype(jnp.bfloat16)[order_d]
    return jax.ops.segment_sum(gs.astype(jnp.float32), rid_d,
                               num_segments=V + 1,
                               indices_are_sorted=True)


ra = timeit("A segment_sum", v_a)
rb = timeit("B table gather f32", v_b)
rc = timeit("C table gather bf16+barrier", v_c)
rd = timeit("D bf16 padded32", v_d)
re_ = timeit("E permute f32 + segscan", v_e)
rf = timeit("F permute bf16 + segscan", v_f)
timeit("G permute f32 only (probe)", v_g)
timeit("H permute bf16 only (probe)", v_h)
ri = timeit("I permute + sorted segment_sum", v_i)
rj = timeit_fm("J fm f32 permute+segscan", v_j)
rk = timeit_fm("K fm bf16-permute f32-segscan", v_k)
timeit_fm("L fm lane-permute probe", v_l)
rm = timeit_fm("M fm full bf16", v_m)
def v_p(g):  # unsorted segment_sum in bf16 (halved scatter bytes)
    return jax.ops.segment_sum(g.astype(jnp.bfloat16), pair_idx_d,
                               num_segments=V + 1).astype(jnp.float32)


rn = timeit("N bf16 permute + sorted segsum", v_n)
ro = timeit("O no-barrier bf16 + sorted segsum", v_o)
rp = timeit("P unsorted segsum bf16", v_p)


def relerr(x):
    return float(jnp.max(jnp.abs(ra[:V] - x[:V])) /
                 (jnp.max(jnp.abs(ra[:V])) + 1e-9))


print(f"errs B={relerr(rb):.2e} C={relerr(rc):.2e} E={relerr(re_):.2e} "
      f"F={relerr(rf):.2e} I={relerr(ri):.2e} J={relerr(rj):.2e} "
      f"K={relerr(rk):.2e} M={relerr(rm):.2e} N={relerr(rn):.2e} "
      f"O={relerr(ro):.2e}")
