"""Brute-force kNN mean-squared-distance for Gaussian scale init.

TPU replacement for the reference's `distCUDA2` — which, despite its name,
is a *CPU scipy KDTree* (/root/reference/scripts/gaussian/
gaussian_utils.py:12-16): mean squared distance to the 3 nearest neighbors.
On TPU a chunked dense distance matrix is faster than any tree for the
30-50k point sets used per keyframe, and it jits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_mean_sq_dist(points, valid=None, k=3, chunk=2048):
    """points (N, 3) -> (N,) mean squared distance to the k nearest others.

    `valid` masks out padding rows (they neither query nor serve as
    neighbors, and get distance 0)."""
    N = points.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    n_chunks = (N + chunk - 1) // chunk
    Np = n_chunks * chunk
    big = jnp.float32(1e12)
    pts = jnp.where(valid[:, None], points.astype(jnp.float32), 1e6)
    if Np != N:
        pts = jnp.concatenate([pts, jnp.full((Np - N, 3), 1e6, jnp.float32)])
    vmask = jnp.concatenate([valid, jnp.zeros((Np - N,), bool)]) \
        if Np != N else valid

    # center the cloud first: |q|^2+|p|^2-2qp cancels catastrophically when
    # |p|^2 >> d2 (f32 abs error ~ |p|^2 * 1e-7 vs pixel-scale d2 ~ 1e-4)
    ctr = jnp.sum(jnp.where(valid[:, None], points, 0.0), axis=0) \
        / jnp.clip(jnp.sum(valid), 1)
    pts = jnp.where(jnp.abs(pts) < 1e5, pts - ctr[None, :], pts)
    pn = jnp.sum(pts * pts, axis=1)                    # (Np,)

    def body(i, out):
        q = jax.lax.dynamic_slice(pts, (i * chunk, 0), (chunk, 3))
        qn = jax.lax.dynamic_slice(pn, (i * chunk,), (chunk,))
        # |q - p|^2 = |q|^2 + |p|^2 - 2 q.p — the cross term runs on the
        # MXU; the elementwise (q[:,None]-pts[None])^2 form was ~3x the
        # device time on the VPU
        d2 = qn[:, None] + pn[None, :] - 2.0 * jax.lax.dot_general(
            q, pts, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, Np), 0) + i * chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, Np), 1)
        d2 = jnp.where((rows == cols) | ~vmask[None, :], big, d2)
        # TPU-native approximate top-k: one pass over the (chunk, Np)
        # distance block instead of k full min-extraction rewrites (the
        # block is ~170 MB at bench scale — this is bandwidth, not FLOPs).
        # recall_target 0.95 on 3-NN mean distance only perturbs the scale
        # INIT of new Gaussians, which training re-fits immediately.
        neg, _ = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
        acc = jnp.sum(jnp.minimum(-neg, big), axis=1)
        return jax.lax.dynamic_update_slice(out, acc / k, (i * chunk,))

    out = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((Np,), jnp.float32))
    return jnp.where(valid, out[:N], 0.0)
