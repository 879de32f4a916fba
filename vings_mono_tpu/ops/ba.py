"""Dense bundle adjustment in pure XLA — the TPU replacement for DROID's
CUDA `droid_backends.ba` / `BACore` (call surface: /root/repo/SURVEY.md §2.9;
numeric spec: /root/reference/scripts/frontend/geom/ba.py:29-104 and
chol.py:46-73).

Gauss-Newton over keyframe poses + per-pixel inverse depths:
  * per-edge Jacobians from ops.projective (analytic),
  * block Hessian assembled with segment-sums over the edge list
    (replaces torch_scatter),
  * per-pixel depth blocks marginalized by a Schur complement (C is
    diagonal over pixels), damped pose system solved with Cholesky,
  * left-multiplicative SE3 retraction + disparity update.

Everything is fixed-shape over a static max edge count — dead edge slots
carry ii=jj=0 with zero weight and contribute nothing, which is how the
sliding-window graph stays jit-compatible (SURVEY §7 "dynamic structure
under jit").

The same routine exposes the two half-steps the VIO fusion needs
(`BACore.hessian` / `.retract` in the reference, depth_video.py:554-650):
`ba_hessian` returns the depth-marginalized pose Hessian/rhs (camera frame),
and `ba_retract` applies an externally solved pose delta and solves depths.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from . import projective as pops


def _seg_mat(vals, idx, n_seg):
    """vals (N, D, D') summed into (n_seg, D, D') by idx (N,)."""
    return jax.ops.segment_sum(vals, idx, num_segments=n_seg)


class BASystem(NamedTuple):
    H: jnp.ndarray     # (P, P, 6, 6) pose-pose blocks (depth-marginalized S)
    v: jnp.ndarray     # (P, 6)
    # depth back-substitution pieces:
    Q: jnp.ndarray     # (M, HW) inverse depth-block diagonal
    E: jnp.ndarray     # (P, M, 6, HW) pose-depth coupling
    w: jnp.ndarray     # (M, HW) depth rhs
    kx: jnp.ndarray    # (M,) unique source-frame ids (fixed = arange window)


def build_system(target, weight, eta, poses, disps, intrinsics, ii, jj,
                 edge_valid, fixedp=1, m_frames=None):
    """Assemble the BA normal equations.

    target/weight (N, 2, H, W) [DROID layout], eta (M, H, W) damping,
    poses (P, 7) w2c, disps (P, H, W), ii/jj (N,) int32, edge_valid (N,).
    Depth blocks are indexed by source frame directly (M = P; the reference
    compacts to unique ii — with fixed window shapes indexing by frame id is
    equivalent and cheaper).
    """
    P, ht, wd = disps.shape
    N = ii.shape[0]
    D = 6
    HW = ht * wd
    if m_frames is None:
        m_frames = P

    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True)

    tgt = jnp.moveaxis(target, 1, -1)                  # (N, H, W, 2)
    r = (tgt - coords) * valid
    wgt = 0.001 * jnp.moveaxis(weight, 1, -1) * valid  # (N, H, W, 2)
    wgt = wgt * edge_valid[:, None, None, None].astype(wgt.dtype)

    Jif = Ji.reshape(N, HW, 2, D)
    Jjf = Jj.reshape(N, HW, 2, D)
    Jzf = Jz.reshape(N, HW, 2, 1)
    rf = r.reshape(N, HW, 2, 1)
    wf = wgt.reshape(N, HW, 2, 1)

    wJi = wf * Jif
    wJj = wf * Jjf

    # pose-pose blocks (N, 6, 6): sum over pixels and the 2 coords
    def blk(A, B):
        return jnp.einsum("npcd,npce->nde", A, B)

    Hii, Hij = blk(wJi, Jif), blk(wJi, Jjf)
    Hji, Hjj = blk(wJj, Jif), blk(wJj, Jjf)
    vi = jnp.einsum("npcd,npcz->nd", wJi, rf)
    vj = jnp.einsum("npcd,npcz->nd", wJj, rf)

    # pose-depth coupling (N, 6, HW) and depth diagonal/rhs (N, HW)
    Ei = jnp.einsum("npcd,npcz->ndp", wJi, Jzf)
    Ej = jnp.einsum("npcd,npcz->ndp", wJj, Jzf)
    Ck = jnp.einsum("npcz,npcz->np", wf * Jzf, Jzf)
    wk = jnp.einsum("npcz,npcz->np", wf * Jzf, rf)

    # scatter into window-sized blocks; fixed poses drop via index < 0
    Pa = P - fixedp
    iia = ii - fixedp
    jja = jj - fixedp

    def safe_mat(vals, a, b, na, nb):
        ok = (a >= 0) & (b >= 0)
        idx = jnp.where(ok, a * nb + b, na * nb)
        return jax.ops.segment_sum(vals, idx, num_segments=na * nb + 1)[:-1] \
            .reshape(na, nb, *vals.shape[1:])

    def safe_vec(vals, a, na):
        idx = jnp.where(a >= 0, a, na)
        return jax.ops.segment_sum(vals, idx, num_segments=na + 1)[:-1]

    H = (safe_mat(Hii, iia, iia, Pa, Pa) + safe_mat(Hij, iia, jja, Pa, Pa)
         + safe_mat(Hji, jja, iia, Pa, Pa) + safe_mat(Hjj, jja, jja, Pa, Pa))
    v = safe_vec(vi, iia, Pa) + safe_vec(vj, jja, Pa)

    # depth blocks keyed by source frame ii (not compacted)
    E = (safe_mat(Ei, iia, ii, Pa, m_frames)
         + safe_mat(Ej, jja, ii, Pa, m_frames))       # (Pa, M, 6, HW)
    C = safe_vec(Ck, ii, m_frames)                    # (M, HW)
    w = safe_vec(wk, ii, m_frames)

    C = C + eta.reshape(m_frames, HW) + 1e-7
    return H, v, E, C, w


def schur_reduce(H, v, E, C, w):
    """Marginalize depths: S = H - E Q E^T, v' = v - E Q w. Q = 1/C."""
    Pa, M, D, HW = E.shape
    Q = 1.0 / C                                        # (M, HW)
    EQ = E * Q[None, :, None, :]                       # (Pa, M, 6, HW)
    S = jnp.einsum("pmdh,qmeh->pqde", EQ, E)           # (Pa, Pa, 6, 6)
    S = H - S
    v2 = v - jnp.einsum("pmdh,mh->pd", EQ, w)
    return S, v2, Q


def damped_solve(S, v, ep=0.1, lm=1e-4):
    """Dense damped solve of the (Pa*6, Pa*6) pose system via Cholesky."""
    Pa = S.shape[0]
    A = jnp.transpose(S, (0, 2, 1, 3)).reshape(Pa * 6, Pa * 6)
    eye = jnp.eye(Pa * 6, dtype=A.dtype)
    A = A + (ep + lm * A) * eye
    b = v.reshape(Pa * 6)
    L, lower = jax.scipy.linalg.cho_factor(A, lower=True)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, eye)
    dx = jax.scipy.linalg.cho_solve((L, True), jnp.where(ok, b, 0.0))
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    return dx.reshape(Pa, 6)


def depth_backsub(dx, E, Q, w):
    """dz = Q (w - E^T dx)."""
    Et_dx = jnp.einsum("pmdh,pd->mh", E, dx)
    return Q * (w - Et_dx)


def retract(poses, disps, dx, dz, fixedp=1):
    P = poses.shape[0]
    dx_full = jnp.concatenate(
        [jnp.zeros((fixedp, 6), dx.dtype), dx], axis=0)
    poses = lie.se3_retr(poses, dx_full)
    disps = disps + dz.reshape(disps.shape)
    disps = jnp.where(disps > 10.0, 0.0, disps)
    disps = jnp.clip(disps, 0.0)
    return poses, disps


@functools.partial(jax.jit, static_argnames=("fixedp", "iters"))
def ba(target, weight, eta, poses, disps, intrinsics, ii, jj, edge_valid,
       fixedp=1, iters=1, ep=0.1, lm=1e-4):
    """Full visual-only dense BA (droid_backends.ba equivalent).

    Updates poses (P,7 w2c) and disps (P,H,W) in `iters` Gauss-Newton steps.
    """
    def step(_, carry):
        poses, disps = carry
        H, v, E, C, w = build_system(target, weight, eta, poses, disps,
                                     intrinsics, ii, jj, edge_valid, fixedp)
        S, v2, Q = schur_reduce(H, v, E, C, w)
        dx = damped_solve(S, v2, ep, lm)
        dz = depth_backsub(dx, E, Q, w)
        return retract(poses, disps, dx, dz, fixedp)

    return jax.lax.fori_loop(0, iters, step, (poses, disps))


def _mask_fixed(S, v, free_mask):
    """Pin poses with free_mask=False: identity rows/cols in S, zero rhs.
    free_mask (Pa,) refers to the post-fixedp indexing."""
    m = free_mask.astype(S.dtype)
    mm = m[:, None, None, None] * m[None, :, None, None]
    eye6 = jnp.eye(6, dtype=S.dtype)
    diag = (1.0 - m)[:, None, None] * eye6[None]
    S = S * mm
    # add identity on fixed diagonal blocks to keep the system well-posed
    S = S + jnp.einsum("pq,pde->pqde", jnp.eye(S.shape[0], dtype=S.dtype),
                       diag)
    v = v * m[:, None]
    return S, v


@functools.partial(jax.jit, static_argnames=("iters",))
def ba_window(target, weight, eta, poses, disps, intrinsics, ii, jj,
              edge_valid, t0, iters=1, ep=0.1, lm=1e-4):
    """Dense BA over a fixed-size window with a *traced* first-free index t0
    (frames < t0 keep their poses; all depths stay free). This is the shape
    the sliding-window frontend needs: the window tensors have static size,
    but which prefix is pinned changes frame to frame
    (covisible_graph.py:214-352 passes t0/t1 dynamically)."""
    P = poses.shape[0]
    free = jnp.arange(P) >= t0

    def step(_, carry):
        poses_c, disps_c = carry
        H, v, E, C, w = build_system(target, weight, eta, poses_c, disps_c,
                                     intrinsics, ii, jj, edge_valid,
                                     fixedp=0)
        S, v2, Q = schur_reduce(H, v, E, C, w)
        S, v2 = _mask_fixed(S, v2, free)
        dx = damped_solve(S, v2, ep, lm)
        dx = dx * free[:, None].astype(dx.dtype)
        dz = depth_backsub(dx, E, Q, w)
        return retract(poses_c, disps_c, dx, dz, fixedp=0)

    return jax.lax.fori_loop(0, iters, step, (poses, disps))


@functools.partial(jax.jit, static_argnames=("iters",))
def ba_global(target, weight, eta, poses, disps, intrinsics, ii, jj,
              edge_valid, group_idx, group_valid, free_mask, iters=2,
              ep=0.1, lm=1e-4):
    """Full-trajectory dense-depth BA with an *edge-sparse* Schur
    complement — the terminate/global-BA pass (reference:
    frontend_vo/.../visual_frontend.py:1460-1542 `backend`/`update_lowmem`).

    The window BA above materializes the pose-depth coupling E as a dense
    (P, M, 6, HW) tensor — fine for a 16-frame window, impossible for a
    2500-frame trajectory. Here the Schur term S -= E Q E^T is accumulated
    per *depth frame* over a capped adjacency list instead:

      group_idx (T, d) int32 — ids of edges whose source frame ii == m
      group_valid (T, d) bool — padding mask

    For depth frame m the only poses coupled through its depth block are m
    itself (via every edge's Ei) and the d destination frames jj[e] (via
    Ej). Stacking those d+1 rows gives R_m (d+1, 6, HW); the Schur
    contribution is the (d+1)x(d+1) block outer product R_m Q_m R_m^T,
    scattered into the dense pose Hessian by (pose_a, pose_b). Memory is
    O(T*(d+1)*6*HW) instead of O(T^2*6*HW).

    free_mask (T,) bool — poses to optimize (False = pinned, e.g. frame 0).
    Returns (poses, disps) updated in `iters` Gauss-Newton steps.
    """
    T, ht, wd = disps.shape
    HW = ht * wd
    d = group_idx.shape[1]

    tgt = jnp.moveaxis(target, 1, -1)                   # (E, H, W, 2)

    def step(_, carry):
        poses_c, disps_c = carry
        coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
            poses_c, disps_c, intrinsics, ii, jj, jacobian=True)
        N = ii.shape[0]
        r = (tgt - coords) * valid
        wgt = 0.001 * jnp.moveaxis(weight, 1, -1) * valid
        wgt = wgt * edge_valid[:, None, None, None].astype(wgt.dtype)

        Jif = Ji.reshape(N, HW, 2, 6)
        Jjf = Jj.reshape(N, HW, 2, 6)
        Jzf = Jz.reshape(N, HW, 2, 1)
        rf = r.reshape(N, HW, 2, 1)
        wf = wgt.reshape(N, HW, 2, 1)
        wJi = wf * Jif
        wJj = wf * Jjf

        def blk(A, B):
            return jnp.einsum("npcd,npce->nde", A, B)

        # dense pose-pose part (T*6 x T*6 is small even at T=2500)
        def mat(vals, a, b):
            idx = a * T + b
            return jax.ops.segment_sum(
                vals, idx, num_segments=T * T).reshape(T, T, 6, 6)

        def vec(vals, a):
            return jax.ops.segment_sum(vals, a, num_segments=T)

        H = (mat(blk(wJi, Jif), ii, ii) + mat(blk(wJi, Jjf), ii, jj)
             + mat(blk(wJj, Jif), jj, ii) + mat(blk(wJj, Jjf), jj, jj))
        v = vec(jnp.einsum("npcd,npcz->nd", wJi, rf), ii) + \
            vec(jnp.einsum("npcd,npcz->nd", wJj, rf), jj)

        # per-edge depth couplings (E-sparse)
        Ei = jnp.einsum("npcd,npcz->ndp", wJi, Jzf)     # (N, 6, HW)
        Ej = jnp.einsum("npcd,npcz->ndp", wJj, Jzf)
        Ck = jnp.einsum("npcz,npcz->np", wf * Jzf, Jzf)
        wk = jnp.einsum("npcz,npcz->np", wf * Jzf, rf)

        C = vec(Ck, ii) + eta.reshape(T, HW) + 1e-7     # (T, HW)
        wrhs = vec(wk, ii)
        Q = 1.0 / C

        # adjacency rows: R[m, 0] = sum_e(ii=m) Ei_e ; R[m, 1+k] = Ej_gk
        R0 = jax.ops.segment_sum(Ei, ii, num_segments=T)  # (T, 6, HW)
        gmask = group_valid[..., None, None].astype(Ej.dtype)
        Rk = Ej[group_idx] * gmask                       # (T, d, 6, HW)
        R = jnp.concatenate([R0[:, None], Rk], axis=1)   # (T, d+1, 6, HW)
        pid = jnp.concatenate(
            [jnp.arange(T, dtype=jnp.int32)[:, None],
             jnp.where(group_valid, jj[group_idx], 0)], axis=1)  # (T, d+1)

        QR = R * Q[:, None, None, :]
        Sblk = jnp.einsum("madh,mbeh->mabde", QR, R)     # (T,d+1,d+1,6,6)
        sidx = (pid[:, :, None] * T + pid[:, None, :]).reshape(-1)
        Ssub = jax.ops.segment_sum(
            Sblk.reshape(-1, 6, 6), sidx,
            num_segments=T * T).reshape(T, T, 6, 6)
        vblk = jnp.einsum("madh,mh->mad", QR, wrhs)      # (T, d+1, 6)
        vsub = jax.ops.segment_sum(vblk.reshape(-1, 6), pid.reshape(-1),
                                   num_segments=T)

        S = H - Ssub
        v2 = v - vsub
        S, v2 = _mask_fixed(S, v2, free_mask)
        dx = damped_solve(S, v2, ep, lm)
        dx = dx * free_mask[:, None].astype(dx.dtype)

        # depth back-substitution over the same adjacency rows
        Rt_dx = jnp.einsum("madh,mad->mh", R, dx[pid])   # (T, HW)
        dz = Q * (wrhs - Rt_dx)
        return retract(poses_c, disps_c, dx, dz, fixedp=0)

    return jax.lax.fori_loop(0, iters, step, (poses, disps))


def _band_neighbors(T, band):
    """Column c of band storage holds block (a, a + c - band)."""
    idx = jnp.arange(T)[:, None] + jnp.arange(2 * band + 1)[None, :] - band
    ok = (idx >= 0) & (idx < T)
    return jnp.clip(idx, 0, T - 1), ok


def band_matvec(Sb, x, band):
    """y[a] = sum_c Sb[a, c] @ x[a + c - band]; Sb (T, 2b+1, 6, 6)."""
    idx, ok = _band_neighbors(x.shape[0], band)
    xg = x[idx] * ok[..., None].astype(x.dtype)
    return jnp.einsum("twde,twe->td", Sb, xg)


def banded_pcg(Sb, b, band, iters=128, tol=1e-8):
    """Block-Jacobi-preconditioned conjugate gradients on the block-banded
    SPD pose system. O(T * band * 36) per iteration — no dense (T*6)^2
    matrix ever exists, which is what caps the dense `damped_solve` at
    T~2000 (VERDICT r3 weak #4; reference scale: save_buffer 8000,
    configs/kitti360/unsync/*_0002.yaml:111)."""
    T = b.shape[0]
    eye6 = jnp.eye(6, dtype=Sb.dtype)
    D = Sb[:, band] + 1e-8 * eye6[None]
    Dinv = jnp.linalg.inv(D)
    Dinv = jnp.where(jnp.isfinite(Dinv), Dinv, eye6[None])

    def precond(r):
        return jnp.einsum("tde,te->td", Dinv, r)

    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    rz0 = rz

    def cond(c):
        i, _, _, _, _, rz = c
        return (i < iters) & (rz > tol * rz0) & jnp.isfinite(rz)

    def body(c):
        i, x, r, z, p, rz = c
        Ap = band_matvec(Sb, p, band)
        alpha = rz / (jnp.sum(p * Ap) + 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / (rz + 1e-20)
        p = z + beta * p
        return i + 1, x, r, z, p, rz_new

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, z, p, rz))
    return jnp.where(jnp.isfinite(x), x, 0.0)


@functools.partial(jax.jit, static_argnames=("iters", "band", "cg_iters"))
def ba_global_banded(target, weight, eta, poses, disps, intrinsics, ii, jj,
                     edge_valid, group_idx, group_valid, free_mask,
                     iters=2, ep=0.1, lm=1e-4, band=128, cg_iters=128):
    """`ba_global` with the pose system in BLOCK-BAND storage + a PCG
    solve: memory O(T * band * 36) instead of the dense path's O(T^2 * 36)
    (900 MB at T=2500, 9.2 GB at the kitti360 save_buffer=8000 scale).

    Requires |ii - jj| <= band/2 for every edge (the GlobalBA proposal is
    banded at 64, and the Schur complement fills in up to twice the edge
    band: poses a, b couple through depth frame m when both are within the
    edge band of m). Out-of-band blocks are dropped — callers must pick
    `band` >= 2 * proposal band. Matches `ba_global` exactly on small T
    (tests/test_backend.py).
    """
    T, ht, wd = disps.shape
    HW = ht * wd
    W = 2 * band + 1

    tgt = jnp.moveaxis(target, 1, -1)

    def step(_, carry):
        poses_c, disps_c = carry
        coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
            poses_c, disps_c, intrinsics, ii, jj, jacobian=True)
        N = ii.shape[0]
        r = (tgt - coords) * valid
        wgt = 0.001 * jnp.moveaxis(weight, 1, -1) * valid
        wgt = wgt * edge_valid[:, None, None, None].astype(wgt.dtype)

        Jif = Ji.reshape(N, HW, 2, 6)
        Jjf = Jj.reshape(N, HW, 2, 6)
        Jzf = Jz.reshape(N, HW, 2, 1)
        rf = r.reshape(N, HW, 2, 1)
        wf = wgt.reshape(N, HW, 2, 1)
        wJi = wf * Jif
        wJj = wf * Jjf

        def blk(A, B):
            return jnp.einsum("npcd,npce->nde", A, B)

        def matb(vals, a, b):
            c = b - a + band
            ok = (c >= 0) & (c < W)
            idx = jnp.where(ok, a * W + c, T * W)
            return jax.ops.segment_sum(
                vals, idx, num_segments=T * W + 1)[:T * W].reshape(
                    T, W, 6, 6)

        def vec(vals, a):
            return jax.ops.segment_sum(vals, a, num_segments=T)

        Hb = (matb(blk(wJi, Jif), ii, ii) + matb(blk(wJi, Jjf), ii, jj)
              + matb(blk(wJj, Jif), jj, ii) + matb(blk(wJj, Jjf), jj, jj))
        v = vec(jnp.einsum("npcd,npcz->nd", wJi, rf), ii) + \
            vec(jnp.einsum("npcd,npcz->nd", wJj, rf), jj)

        Ei = jnp.einsum("npcd,npcz->ndp", wJi, Jzf)
        Ej = jnp.einsum("npcd,npcz->ndp", wJj, Jzf)
        Ck = jnp.einsum("npcz,npcz->np", wf * Jzf, Jzf)
        wk = jnp.einsum("npcz,npcz->np", wf * Jzf, rf)

        C = vec(Ck, ii) + eta.reshape(T, HW) + 1e-7
        wrhs = vec(wk, ii)
        Q = 1.0 / C

        R0 = jax.ops.segment_sum(Ei, ii, num_segments=T)
        gmask = group_valid[..., None, None].astype(Ej.dtype)
        Rk = Ej[group_idx] * gmask
        R = jnp.concatenate([R0[:, None], Rk], axis=1)
        d1 = R.shape[1]
        pid = jnp.concatenate(
            [jnp.arange(T, dtype=jnp.int32)[:, None],
             jnp.where(group_valid, jj[group_idx], 0)], axis=1)

        QR = R * Q[:, None, None, :]
        Sblk = jnp.einsum("madh,mbeh->mabde", QR, R)
        pa = jnp.broadcast_to(pid[:, :, None], (T, d1, d1))
        pb = jnp.broadcast_to(pid[:, None, :], (T, d1, d1))
        cc = pb - pa + band
        ok = (cc >= 0) & (cc < W)
        sidx = jnp.where(ok, pa * W + cc, T * W).reshape(-1)
        Ssub = jax.ops.segment_sum(
            Sblk.reshape(-1, 6, 6), sidx,
            num_segments=T * W + 1)[:T * W].reshape(T, W, 6, 6)
        vblk = jnp.einsum("madh,mh->mad", QR, wrhs)
        vsub = jax.ops.segment_sum(vblk.reshape(-1, 6), pid.reshape(-1),
                                   num_segments=T)

        Sb = Hb - Ssub
        v2 = v - vsub

        # pin fixed poses (banded _mask_fixed): zero their rows/cols,
        # identity diagonal block, zero rhs
        m = free_mask.astype(Sb.dtype)
        idx, _ = _band_neighbors(T, band)
        Sb = Sb * m[:, None, None, None] * m[idx][..., None, None]
        eye6 = jnp.eye(6, dtype=Sb.dtype)
        Sb = Sb.at[:, band].add((1.0 - m)[:, None, None] * eye6[None])
        v2 = v2 * m[:, None]

        # damping mirrors damped_solve: diag elements scaled by (1 + lm)
        # plus ep
        dg = Sb[:, band]
        dd = jnp.einsum("tdd->td", dg)
        Sb = Sb.at[:, band].set(
            dg + jnp.einsum("td,de->tde", ep + lm * dd, eye6))

        dx = banded_pcg(Sb, v2, band, iters=cg_iters)
        dx = dx * free_mask[:, None].astype(dx.dtype)

        Rt_dx = jnp.einsum("madh,mad->mh", R, dx[pid])
        dz = Q * (wrhs - Rt_dx)
        return retract(poses_c, disps_c, dx, dz, fixedp=0)

    return jax.lax.fori_loop(0, iters, step, (poses, disps))


@functools.partial(jax.jit, static_argnames=("fixedp",))
def ba_hessian(target, weight, eta, poses, disps, intrinsics, ii, jj,
               edge_valid, fixedp=0):
    """Depth-marginalized pose Hessian/rhs in the camera frame — the
    `BACore.hessian` half-step consumed by the VIO factor graph
    (depth_video.py:554-650). fixedp=0: all window poses are free there.
    Returns (S (Pa,Pa,6,6), v (Pa,6), aux for retraction)."""
    H, v, E, C, w = build_system(target, weight, eta, poses, disps,
                                 intrinsics, ii, jj, edge_valid, fixedp)
    S, v2, Q = schur_reduce(H, v, E, C, w)
    return S, v2, (E, Q, w)


def depth_covariance(S, E, Q, disps, free_mask=None, ep=0.1, lm=1e-4):
    """Per-pixel inverse-depth covariance after marginalizing poses —
    rebuild of compute_covariances (/root/reference/scripts/frontend/
    depth_video.py:676-726):

      Sigma_z = Q + rowsum( (Q E^T L^-T)^2 ),   L = chol(S_damped)
      depth_cov = Sigma_z / disps^4

    S (P,P,6,6), E (P,M,6,HW), Q (M,HW) from schur_reduce/ba_hessian aux.
    Returns (M, H, W) metric-depth covariance.
    """
    P = S.shape[0]
    M, HW = Q.shape
    A = jnp.transpose(S, (0, 2, 1, 3)).reshape(P * 6, P * 6)
    eye = jnp.eye(P * 6, dtype=A.dtype)
    if free_mask is not None:
        m = free_mask.astype(A.dtype)
        mm = jnp.repeat(m, 6)
        A = A * mm[:, None] * mm[None, :] + jnp.diag(1.0 - mm)
    A = A + (ep + lm * A) * eye
    L, _ = jax.scipy.linalg.cho_factor(A, lower=True)
    ok = jnp.all(jnp.isfinite(L))
    L = jnp.where(ok, L, eye)
    # F = (Q * E^T) L^{-T}: solve L^T X = (Q E^T)^T => X^T = Q E^T L^{-T}
    QE = (E * Q[None, :, None, :])              # (P, M, 6, HW)
    QE = jnp.transpose(QE, (0, 2, 1, 3)).reshape(P * 6, M * HW)
    X = jax.scipy.linalg.solve_triangular(L, QE, lower=True)  # L^{-1} QE
    delta = jnp.sum(X * X, axis=0).reshape(M, HW)
    z_cov = jnp.where(ok, Q + delta, Q)
    d = disps.reshape(M, HW)
    cov = z_cov / (d ** 4 + 1e-6)
    return cov.reshape(disps.shape)


@functools.partial(jax.jit, static_argnames=("fixedp",))
def ba_retract(poses, disps, dx, aux, fixedp=0):
    """Apply an externally solved pose delta; back-substitute depths
    (`BACore.retract`)."""
    E, Q, w = aux
    dz = depth_backsub(dx, E, Q, w)
    return retract(poses, disps, dx, dz, fixedp)
