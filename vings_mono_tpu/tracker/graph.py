"""Covisible factor graph — fixed-slot TPU rebuild of
/root/reference/scripts/frontend/covisible_graph.py.

Split of responsibilities:
  * tiny, shape-changing bookkeeping (edge lists ii/jj, ages, NMS edge
    proposal, slot allocation) stays on the HOST as numpy — it is O(max
    factors) integers per frame,
  * every per-edge tensor (GRU state, correlation pyramids, targets,
    weights) lives in fixed-capacity device arrays indexed by slot, and the
    hot loop (reproject -> corr lookup -> GRU -> weight tricks -> dense BA
    -> convex upsample) is ONE jitted program over the sliding window.

The BA runs over a fixed-size window of W_BA frames ending at the newest
keyframe; edges whose frames fall out of that window are masked out (the
reference's active edges live within frontend_window=25 anyway).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..models.droid_net import UpdateModule
from ..ops import ba as ba_ops
from ..ops import corr as corr_ops
from ..ops import projective as pops
from ..ops.upsample import upsample_disp
from .video import DepthVideo, VideoBuffers


@flax.struct.dataclass
class EdgeStore:
    net: jnp.ndarray       # (E, h, w, 128) GRU hidden per edge
    inp: jnp.ndarray       # (E, h, w, 128) context per edge
    target: jnp.ndarray    # (E, h, w, 2)
    weight: jnp.ndarray    # (E, h, w, 2)
    corr1: jnp.ndarray     # (E, hw, h, w)      pyramid level 0
    corr2: jnp.ndarray     # (E, hw, h/2, w/2)
    corr3: jnp.ndarray     # (E, hw, h/4, w/4)
    corr4: jnp.ndarray     # (E, hw, h/8, w/8)


@flax.struct.dataclass
class InactiveStore:
    target: jnp.ndarray    # (I, h, w, 2)
    weight: jnp.ndarray    # (I, h, w, 2)


def empty_edges(e_cap, h, w):
    """Corr pyramids live in bf16: halves the dominant memory+traffic cost
    (the reference kept them fp16 under AMP, covisible_graph.py:102)."""
    z = jnp.zeros
    bf = jnp.bfloat16
    return EdgeStore(
        net=z((e_cap, h, w, 128), jnp.float32),
        inp=z((e_cap, h, w, 128), jnp.float32),
        target=z((e_cap, h, w, 2), jnp.float32),
        weight=z((e_cap, h, w, 2), jnp.float32),
        corr1=z((e_cap, h * w, h, w), bf),
        corr2=z((e_cap, h * w, h // 2, w // 2), bf),
        corr3=z((e_cap, h * w, h // 4, w // 4), bf),
        corr4=z((e_cap, h * w, h // 8, w // 8), bf),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _add_edges_kernel(edges: EdgeStore, bufs: VideoBuffers, slots, ii, jj,
                      valid):
    """Fill edge slots: corr pyramid (fmap_i x fmap_j), GRU state from the
    source frame, target from current reprojection, zero weight."""
    f1 = bufs.fmaps[ii]
    f2 = bufs.fmaps[jj]
    pyr = corr_ops.build_pyramid(f1, f2, dtype=jnp.bfloat16)
    coords, _ = pops.projective_transform(bufs.poses, bufs.disps,
                                          bufs.intrinsics, ii, jj)
    idx = jnp.where(valid, slots, edges.net.shape[0])
    return edges.replace(
        net=edges.net.at[idx].set(bufs.nets[ii], mode="drop"),
        inp=edges.inp.at[idx].set(bufs.inps[ii], mode="drop"),
        target=edges.target.at[idx].set(coords, mode="drop"),
        weight=edges.weight.at[idx].set(0.0, mode="drop"),
        corr1=edges.corr1.at[idx].set(pyr.levels[0], mode="drop"),
        corr2=edges.corr2.at[idx].set(pyr.levels[1], mode="drop"),
        corr3=edges.corr3.at[idx].set(pyr.levels[2], mode="drop"),
        corr4=edges.corr4.at[idx].set(pyr.levels[3], mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(1, 2))
def _reseed_targets_kernel(bufs, edges: EdgeStore, inac: InactiveStore,
                           packed):
    """Overwrite stored edge targets with the plain reprojection under the
    CURRENT poses/disps. packed int32 = [e_slots | e_ii | e_jj | e_valid |
    i_slots | i_ii | i_jj | i_valid], each segment padded to its store
    capacity so one compiled program serves any edge count."""
    e = edges.target.shape[0]
    ic = inac.target.shape[0]
    es, ei, ej, ev = packed[0:e], packed[e:2 * e], packed[2 * e:3 * e], \
        packed[3 * e:4 * e] != 0
    o = 4 * e
    isl, ii_, ij, iv = packed[o:o + ic], packed[o + ic:o + 2 * ic], \
        packed[o + 2 * ic:o + 3 * ic], packed[o + 3 * ic:o + 4 * ic] != 0
    coords, _ = pops.projective_transform(
        bufs.poses, bufs.disps, bufs.intrinsics,
        jnp.concatenate([ei, ii_]), jnp.concatenate([ej, ij]))
    edges = edges.replace(target=edges.target.at[
        jnp.where(ev, es, e)].set(coords[:e], mode="drop"))
    inac = inac.replace(target=inac.target.at[
        jnp.where(iv, isl, ic)].set(coords[e:], mode="drop"))
    return edges, inac


@functools.partial(jax.jit, donate_argnums=(0,))
def _store_inactive_kernel(inac: InactiveStore, edges: EdgeStore,
                           e_slots, i_slots, valid):
    idx = jnp.where(valid, i_slots, inac.target.shape[0])
    return inac.replace(
        target=inac.target.at[idx].set(edges.target[e_slots], mode="drop"),
        weight=inac.weight.at[idx].set(edges.weight[e_slots], mode="drop"))


@functools.partial(jax.jit, static_argnames=("w_ba", "iters", "update_apply",
                                             "do_ba", "compute_cov",
                                             "e_cap", "i_cap",
                                             "far_threshold",
                                             "mask_threshold", "bf16"),
                   donate_argnums=(2, 3))
def _fused_update(params, update_apply, bufs: VideoBuffers,
                  edges: EdgeStore, inac: InactiveStore,
                  packed, *, e_cap: int, i_cap: int, w_ba: int, iters: int,
                  far_threshold: float = -1.0, mask_threshold: float = -1.0,
                  do_ba: bool = True, compute_cov: bool = False,
                  bf16: bool = True):
    """One GRU+BA update over the active graph (covisible_graph.py:214-352).

    `packed` is ONE int32 host upload carrying all the per-call integers
    (each separate jnp.asarray is a 1-40 ms tunnel round trip):
    [slots(e) | ii(e) | jj(e) | valid(e) | inac slots/ii/jj/valid(i each) |
    base, t0, t1, imu_enabled, visual_only]. base: first frame of the BA
    window (t1 - w_ba, clipped). t0: first free pose.
    """
    e, ic = e_cap, i_cap
    slots = packed[0:e]
    ii = packed[e:2 * e]
    jj = packed[2 * e:3 * e]
    valid = packed[3 * e:4 * e] != 0
    o = 4 * e
    inac_slots = packed[o:o + ic]
    inac_ii = packed[o + ic:o + 2 * ic]
    inac_jj = packed[o + 2 * ic:o + 3 * ic]
    inac_valid = packed[o + 3 * ic:o + 4 * ic] != 0
    base = packed[o + 4 * ic]
    t0 = packed[o + 4 * ic + 1]
    t1 = packed[o + 4 * ic + 2]
    imu_enabled_i = packed[o + 4 * ic + 3]
    vis_only_i = packed[o + 4 * ic + 4]
    h, w = bufs.disps.shape[1:3]
    coords0 = pops.coords_grid(h, w)

    # ---- reproject + corr lookup + GRU ------------------------------
    coords1, _ = pops.projective_transform(bufs.poses, bufs.disps,
                                           bufs.intrinsics, ii, jj)
    motn = jnp.concatenate([coords1 - coords0,
                            edges.target[slots] - coords1], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    pyr = corr_ops.CorrPyramid(levels=[edges.corr1[slots],
                                       edges.corr2[slots],
                                       edges.corr3[slots],
                                       edges.corr4[slots]])
    corr = corr_ops.lookup(pyr, coords1)

    # GraphAgg aggregates per *window-relative* source frame
    ii_rel = jnp.clip(ii - base, 0, w_ba - 1)
    # bf16 GRU compute: the update module's convs are the tracker's
    # dominant device cost (f32 ran at ~25% of the f32-via-bf16 MXU
    # envelope — BENCH_NOTES MFU table); params + activations are cast at
    # this boundary, outputs return to f32 before the BA solve (which
    # needs f32 conditioning)
    if bf16:
        bt = jnp.bfloat16
        p_in = jax.tree.map(
            lambda x: x.astype(bt) if x.dtype == jnp.float32 else x, params)
        gru_in = [edges.net[slots].astype(bt), edges.inp[slots].astype(bt),
                  corr.astype(bt), motn.astype(bt)]
    else:
        p_in = params
        gru_in = [edges.net[slots], edges.inp[slots], corr, motn]
    net_new, delta, weight, eta, upmask = update_apply(
        p_in, *gru_in, jnp.where(valid, ii_rel, w_ba), w_ba + 1, True)
    net_new, delta, weight, eta, upmask = jax.tree.map(
        lambda x: x.astype(jnp.float32), (net_new, delta, weight, eta,
                                          upmask))

    target = coords1 + delta
    vmask = valid[:, None, None, None].astype(weight.dtype)
    weight = weight * vmask

    edges = edges.replace(net=edges.net.at[slots].set(net_new),
                          target=edges.target.at[slots].set(target),
                          weight=edges.weight.at[slots].set(weight))

    # damping: update rows of frames that have edges (unique(ii))
    has_edge = jax.ops.segment_sum(valid.astype(jnp.float32), ii_rel,
                                   num_segments=w_ba + 1)[:w_ba] > 0
    damping_win = jax.lax.dynamic_slice_in_dim(bufs.damping, base, w_ba)
    damping_win = jnp.where(has_edge[:, None, None], eta[:w_ba],
                            damping_win)
    bufs = bufs.replace(damping=jax.lax.dynamic_update_slice_in_dim(
        bufs.damping, damping_win, base, axis=0))

    # ---- weight tricks (covisible_graph.py:317-335) -------------------
    imu_enabled = imu_enabled_i > 0
    vis_only = vis_only_i > 0
    far_thresh = jnp.float32(far_threshold)
    mask_thresh = jnp.float32(mask_threshold)

    disp_i = bufs.disps[ii]                       # (E, h, w)
    far_mask = (disp_i < far_thresh)[..., None]
    cond_far = ((far_thresh > 0) & (imu_enabled | vis_only))
    weight = jnp.where(cond_far & far_mask, weight / 1000.0, weight)

    from ..ops import lie
    rel = lie.se3_mul(bufs.poses[ii], lie.se3_inv(bufs.poses[jj]))
    small_t = jnp.linalg.norm(rel[:, :3], axis=-1) < mask_thresh
    cond_small = ((mask_thresh > 0) & (imu_enabled | vis_only))
    weight = jnp.where(cond_small & small_t[:, None, None, None],
                       weight / 1000.0, weight)

    ii_max = jnp.max(jnp.where(valid, ii, -1))
    jj_max = jnp.max(jnp.where(valid, jj, -1))
    weight = jnp.where((ii == ii_max)[:, None, None, None], weight / 10.0,
                       weight)
    weight = jnp.where((jj == jj_max)[:, None, None, None], weight / 4.0,
                       weight)

    # ---- assemble BA inputs over the window ---------------------------
    poses_win = jax.lax.dynamic_slice_in_dim(bufs.poses, base, w_ba)
    disps_win = jax.lax.dynamic_slice_in_dim(bufs.disps, base, w_ba)
    dsens_win = jax.lax.dynamic_slice_in_dim(bufs.disps_sens, base, w_ba)
    intr_win = jax.lax.dynamic_slice_in_dim(bufs.intrinsics, base, w_ba)
    eta_ba = 0.2 * damping_win + 1e-7

    jj_rel = jnp.clip(jj - base, 0, w_ba - 1)
    in_win = (ii >= base) & (jj >= base) & (ii < base + w_ba) & \
        (jj < base + w_ba)
    ev_act = valid & in_win

    i_ii = jnp.clip(inac_ii - base, 0, w_ba - 1)
    i_jj = jnp.clip(inac_jj - base, 0, w_ba - 1)
    i_in = (inac_ii >= base) & (inac_jj >= base) & \
        (inac_ii < base + w_ba) & (inac_jj < base + w_ba)
    # reference additionally gates by t0 - inac_range (host precomputes
    # inac_valid with that)
    ev_in = inac_valid & i_in

    all_ii = jnp.concatenate([ii_rel, i_ii])
    all_jj = jnp.concatenate([jj_rel, i_jj])
    all_valid = jnp.concatenate([ev_act, ev_in])
    all_target = jnp.concatenate([target, inac.target[inac_slots]])
    all_weight = jnp.concatenate([weight, inac.weight[inac_slots]])

    tgt = jnp.moveaxis(all_target, -1, 1)        # (N, 2, h, w)
    wgt = jnp.moveaxis(all_weight, -1, 1)

    if not do_ba:
        # VIO path: hand the assembled BA inputs back; the inertial fusion
        # layer solves poses on the host factor graph and retracts depths
        # via ops.ba.ba_retract, then _finish_update writes back+upsamples
        ba_inputs = (tgt, wgt, eta_ba, all_ii, all_jj, all_valid,
                     poses_win, disps_win, dsens_win, intr_win,
                     upmask[:w_ba], has_edge)
        return bufs, edges, ba_inputs

    t0_rel = t0 - base
    poses_win, disps_win = ba_ops.ba_window(
        tgt, wgt, eta_ba, poses_win, disps_win, intr_win, all_ii, all_jj,
        all_valid, t0_rel, iters=iters)

    # honor metric-depth priors the way depth_video.ba's fallback does:
    # where disps_sens > 0 keep it pinned (depth_video.py:376-379 uses it in
    # the CUDA kernel; we re-pin after the solve)
    disps_win = jnp.where(dsens_win > 0, dsens_win, disps_win)

    if compute_cov:
        # depth covariance at the final linearization (the reference's
        # compute_covariances, depth_video.py:676-726), upsampled with the
        # same convex mask as the disparities
        H_, v_, E_, C_, w_ = ba_ops.build_system(
            tgt, wgt, eta_ba, poses_win, disps_win, intr_win, all_ii,
            all_jj, all_valid, fixedp=0)
        S_, v2_, Q_ = ba_ops.schur_reduce(H_, v_, E_, C_, w_)
        free = jnp.arange(w_ba) >= t0_rel
        cov = ba_ops.depth_covariance(S_, E_, Q_, disps_win,
                                      free_mask=free)
        cov = jnp.clip(cov, 1e-6, 1e6)
        cov_old = jax.lax.dynamic_slice_in_dim(bufs.depths_cov, base, w_ba)
        cov = jnp.where(has_edge[:, None, None], cov, cov_old)
        cov_up = upsample_disp(cov, upmask[:w_ba])
        cov_up = jnp.clip(cov_up, 1e-6, 1e6)
        bufs = bufs.replace(
            depths_cov=jax.lax.dynamic_update_slice_in_dim(
                bufs.depths_cov, cov, base, axis=0),
            depths_cov_up=jax.lax.dynamic_update_slice_in_dim(
                bufs.depths_cov_up, cov_up, base, axis=0))

    bufs = _writeback_window(bufs, base, poses_win, disps_win,
                             upmask[:w_ba], has_edge, w_ba)
    return bufs, edges


def _writeback_window(bufs, base, poses_win, disps_win, upmask, has_edge,
                      w_ba):
    bufs = bufs.replace(
        poses=jax.lax.dynamic_update_slice_in_dim(bufs.poses, poses_win,
                                                  base, axis=0),
        disps=jax.lax.dynamic_update_slice_in_dim(bufs.disps, disps_win,
                                                  base, axis=0))
    up = upsample_disp(disps_win, upmask)
    up_old = jax.lax.dynamic_slice_in_dim(bufs.disps_up, base, w_ba)
    up = jnp.where(has_edge[:, None, None], up, up_old)
    return bufs.replace(disps_up=jax.lax.dynamic_update_slice_in_dim(
        bufs.disps_up, up, base, axis=0))


@functools.partial(jax.jit, static_argnames=("w_ba",), donate_argnums=(0,))
def _finish_update(bufs, base, poses_win, disps_win, dsens_win, upmask,
                   has_edge, *, w_ba: int):
    disps_win = jnp.where(dsens_win > 0, dsens_win, disps_win)
    return _writeback_window(bufs, base, poses_win, disps_win, upmask,
                             has_edge, w_ba)


class CovisibleGraph:
    """Host-side graph bookkeeping over device edge slots."""

    def __init__(self, video: DepthVideo, update_apply, params, cfg):
        self.video = video
        self.update_apply = update_apply
        self.params = params
        fe = cfg["frontend"]
        self.max_factors = int(fe["max_factors"])
        self.edge_batch = int(fe.get("edge_batch", 16))
        self.e_cap = int(fe.get("edge_capacity", 2 * self.max_factors))
        self.i_cap = int(fe.get("inactive_capacity", 4 * self.max_factors))
        self.w_ba = int(fe.get("ba_window", 34))
        self.far_threshold = float(fe.get("far_threshold", -1.0))
        self.inac_range = int(fe.get("inac_range", 9))
        self.mask_threshold = float(fe.get("mask_threshold", -1.0))
        self.skip_edge = fe.get("skip_edge", False)
        self.frontend_window = int(fe.get("frontend_window", 25))
        self.bf16_gru = bool(fe.get("bf16_gru", True))

        h, w = video.ht // 8, video.wd // 8
        self.h, self.w = h, w
        self.edges = empty_edges(self.e_cap, h, w)
        self.inac = InactiveStore(
            target=jnp.zeros((self.i_cap, h, w, 2), jnp.float32),
            weight=jnp.zeros((self.i_cap, h, w, 2), jnp.float32))

        # host-side edge lists
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.slot = np.zeros(0, np.int64)
        self.free_slots = list(range(self.e_cap))

        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.slot_inac = np.zeros(0, np.int64)
        self.free_inac = list(range(self.i_cap))

        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

    # ------------------------------------------------------------------
    def _edge_set(self):
        return set(zip(self.ii.tolist(), self.jj.tolist())) | \
            set(zip(self.ii_inac.tolist(), self.jj_inac.tolist()))

    def add_factors(self, ii, jj, remove=False):
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        eset = self._edge_set()
        keep = [k for k in range(len(ii))
                if (ii[k], jj[k]) not in eset]
        # also dedupe within the batch
        seen = set()
        keep2 = []
        for k in keep:
            if (ii[k], jj[k]) not in seen:
                seen.add((ii[k], jj[k]))
                keep2.append(k)
        ii, jj = ii[keep2], jj[keep2]
        if len(ii) == 0:
            return

        if (self.max_factors > 0 and remove
                and len(self.ii) + len(ii) > self.max_factors):
            n_drop = len(self.ii) + len(ii) - self.max_factors
            order = np.argsort(-self.age)        # oldest first
            drop = np.zeros(len(self.ii), bool)
            drop[order[:n_drop]] = True
            self.rm_factors(drop, store=True)

        n_room = min(len(ii), len(self.free_slots))
        ii, jj = ii[:n_room], jj[:n_room]
        if n_room == 0:
            return
        slots = np.asarray([self.free_slots.pop(0) for _ in range(n_room)],
                           np.int64)
        # pad to a fixed batch size so the kernel compiles once
        B = self.edge_batch
        for s0 in range(0, n_room, B):
            n = min(B, n_room - s0)
            pad_slots = np.zeros(B, np.int64)
            pad_ii = np.zeros(B, np.int64)
            pad_jj = np.zeros(B, np.int64)
            pad_valid = np.zeros(B, bool)
            pad_slots[:n] = slots[s0:s0 + n]
            pad_ii[:n] = ii[s0:s0 + n]
            pad_jj[:n] = jj[s0:s0 + n]
            pad_valid[:n] = True
            self.edges = _add_edges_kernel(
                self.edges, self.video.bufs,
                jnp.asarray(pad_slots, jnp.int32),
                jnp.asarray(pad_ii, jnp.int32),
                jnp.asarray(pad_jj, jnp.int32), jnp.asarray(pad_valid))
        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])
        self.slot = np.concatenate([self.slot, slots])

    def rm_factors(self, mask, store=False):
        mask = np.asarray(mask, bool)
        if mask.sum() == 0:
            return
        if store:
            e_slots = self.slot[mask]
            n = len(e_slots)
            n_room = min(n, len(self.free_inac))
            i_slots = np.asarray([self.free_inac.pop(0)
                                  for _ in range(n_room)], np.int64)
            B = self.edge_batch
            for s0 in range(0, n_room, B):
                nn = min(B, n_room - s0)
                pe = np.zeros(B, np.int64)
                pi = np.zeros(B, np.int64)
                pv = np.zeros(B, bool)
                pe[:nn] = e_slots[s0:s0 + nn]
                pi[:nn] = i_slots[s0:s0 + nn]
                pv[:nn] = True
                self.inac = _store_inactive_kernel(
                    self.inac, self.edges, jnp.asarray(pe, jnp.int32),
                    jnp.asarray(pi, jnp.int32), jnp.asarray(pv))
            if n_room > 0:
                self.ii_inac = np.concatenate([self.ii_inac,
                                               self.ii[mask][:n_room]])
                self.jj_inac = np.concatenate([self.jj_inac,
                                               self.jj[mask][:n_room]])
                self.slot_inac = np.concatenate([self.slot_inac, i_slots])
        self.free_slots.extend(self.slot[mask].tolist())
        self.ii = self.ii[~mask]
        self.jj = self.jj[~mask]
        self.age = self.age[~mask]
        self.slot = self.slot[~mask]

    def _drop_inactive(self, mask):
        self.free_inac.extend(self.slot_inac[mask].tolist())
        self.ii_inac = self.ii_inac[~mask]
        self.jj_inac = self.jj_inac[~mask]
        self.slot_inac = self.slot_inac[~mask]

    def rm_keyframe(self, ix):
        self.video.rm_keyframe(ix)
        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac[self.ii_inac >= ix] -= 1
        self.jj_inac[self.jj_inac >= ix] -= 1
        if m.any():
            self._drop_inactive(m)
        m = (self.ii == ix) | (self.jj == ix)
        self.ii[self.ii >= ix] -= 1
        self.jj[self.jj >= ix] -= 1
        self.rm_factors(m, store=False)

    def shift_indices(self, n):
        """After a video rollup of n frames, rebase edge indices; edges that
        reference spilled frames are dropped."""
        m = (self.ii < n) | (self.jj < n)
        self.rm_factors(m, store=False)
        self.ii -= n
        self.jj -= n
        mi = (self.ii_inac < n) | (self.jj_inac < n)
        self._drop_inactive(mi)
        self.ii_inac -= n
        self.jj_inac -= n

    def filter_edges(self):
        """Remove long-range edges whose learned confidence collapsed."""
        if len(self.ii) == 0:
            return
        wmean = np.asarray(jax.device_get(jnp.mean(
            self.edges.weight[jnp.asarray(self.slot, jnp.int32)],
            axis=(1, 2, 3))))
        mask = (np.abs(self.ii - self.jj) > 2) & (wmean < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    # ------------------------------------------------------------------
    def _pad(self, x, cap, fill=0):
        out = np.full(cap, fill, np.int64)
        out[:len(x)] = x
        return out

    def update(self, t0=None, t1=None, iters=2, use_inactive=True):
        if len(self.ii) == 0:
            return
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1
        base = max(0, t1 - self.w_ba)

        e = self.e_cap
        i_cap = self.i_cap
        if use_inactive and len(self.ii_inac) > 0:
            m = (self.ii_inac >= t0 - self.inac_range) & \
                (self.jj_inac >= t0 - self.inac_range)
        else:
            m = np.zeros(len(self.ii_inac), bool)

        # ONE packed int32 upload for all per-call integers (see
        # _fused_update docstring)
        packed = np.zeros(4 * e + 4 * i_cap + 5, np.int32)
        na = len(self.ii)
        packed[0:na] = self.slot
        packed[e:e + na] = self.ii
        packed[2 * e:2 * e + na] = self.jj
        packed[3 * e:3 * e + na] = 1
        o = 4 * e
        nm = int(m.sum())
        packed[o:o + nm] = self.slot_inac[m]
        packed[o + i_cap:o + i_cap + nm] = self.ii_inac[m]
        packed[o + 2 * i_cap:o + 2 * i_cap + nm] = self.jj_inac[m]
        packed[o + 3 * i_cap:o + 3 * i_cap + nm] = 1
        packed[o + 4 * i_cap:] = [base, t0, t1,
                                  1 if self.video.imu_enabled else 0,
                                  1 if self.video.visual_only_init else 0]

        args = (self.params, self.update_apply, self.video.bufs, self.edges,
                self.inac, jnp.asarray(packed))
        kw = dict(e_cap=e, i_cap=i_cap, w_ba=self.w_ba, iters=iters,
                  far_threshold=self.far_threshold,
                  mask_threshold=self.mask_threshold, bf16=self.bf16_gru)

        compute_cov = getattr(self, "_next_update_cov", False)
        self._next_update_cov = False
        # abstract signature for MFU accounting (utils/mfu.py)
        self._mfu_sig = (jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, args), dict(kw, do_ba=True))
        inertial = getattr(self, "inertial", None)
        if inertial is not None and self.video.imu_enabled:
            # VIO: GRU on TPU, pose fusion on the host factor graph
            self.video.bufs, self.edges, ba_in = _fused_update(
                *args, **kw, do_ba=False)
            (tgt, wgt, eta_ba, all_ii, all_jj, all_valid, poses_win,
             disps_win, dsens_win, intr_win, upmask, has_edge) = ba_in
            poses_win, disps_win = inertial.multi_sensor_ba(
                tgt, wgt, eta_ba, all_ii, all_jj, all_valid, base, t1,
                poses_win, disps_win, intr_win)
            self.video.bufs = _finish_update(
                self.video.bufs, jnp.asarray(base, jnp.int32), poses_win,
                disps_win, dsens_win, upmask, has_edge, w_ba=self.w_ba)
        else:
            self.video.bufs, self.edges = _fused_update(
                *args, **kw, do_ba=True, compute_cov=compute_cov)
        self.age += 1

    # ------------------------------------------------------------------
    def reseed_targets(self):
        """Re-seed every stored edge target (active + inactive) to the
        reprojection under the CURRENT poses/disps. Called after a loop
        rectification non-rigidly bends the live window: stored targets
        are pseudo-measurements of the OLD relative geometry, so left in
        place (a) inactive edges make every subsequent BA update fight
        the correction with frozen weights, and (b) active edges feed the
        GRU a garbage motion context (target - coords1 saturates the ±64
        clip). Measured on the GT-instrumented loop e2e: closure-time ATE
        improved 0.91 -> 0.78, then post-closure tracking drifted back to
        1.40 before this re-seed. Weights are kept — the confidence
        structure of each measurement is still valid."""
        e, ic = self.e_cap, self.i_cap
        packed = np.zeros(4 * e + 4 * ic, np.int32)
        na = len(self.ii)
        packed[0:na] = self.slot
        packed[e:e + na] = self.ii
        packed[2 * e:2 * e + na] = self.jj
        packed[3 * e:3 * e + na] = 1
        o = 4 * e
        nm = len(self.ii_inac)
        packed[o:o + nm] = self.slot_inac
        packed[o + ic:o + ic + nm] = self.ii_inac
        packed[o + 2 * ic:o + 2 * ic + nm] = self.jj_inac
        packed[o + 3 * ic:o + 3 * ic + nm] = 1
        self.edges, self.inac = _reseed_targets_kernel(
            self.video.bufs, self.edges, self.inac, jnp.asarray(packed))

    # ------------------------------------------------------------------
    # edge proposal (host logic, device distances)
    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def _proximity_pairs(self, t0, t1, t):
        """Candidate (ii, jj) grid for a proximity proposal at frame count
        `t`, plus the grid size cc (skip_edge candidates append after cc).
        Deterministic in (t0, t1, t) — shared by the live proposal and the
        end-of-frame prefetch so both query identical pairs."""
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return None, None, 0
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        cc = ii.shape[0]
        if self.skip_edge:
            if ii.max() - ii.min() == self.frontend_window - 1:
                jj_add = ii.min() + np.asarray(self.skip_edge, np.int64)
                jj_add = jj_add[jj_add > 0]
                ii_add = np.full_like(jj_add, ii.max())
                jj = np.concatenate([jj, jj_add])
                ii = np.concatenate([ii, ii_add])
        return ii, jj, cc

    def prefetch_proximity(self, t0, t1, beta):
        """Enqueue the NEXT frame's proximity-distance query now (end of the
        current update, when every input — poses, disps after the final BA —
        is already final; the motion filter's append only touches
        image/fmap/net/inp, which distance() never reads) and start its d2h
        DMA. By the time the next _update's proposal needs the values, the
        transfer has landed: the ~30-40 ms blocking tunnel sync becomes a
        free pull. Correct regardless of motion-filter skips: t0/t1/counter
        only advance when a frame IS appended, so the key still matches at
        whichever frame triggers the next update."""
        t = self.video.counter + 1
        ii, jj, cc = self._proximity_pairs(t0, t1, t)
        if ii is None:
            self._prox_prefetch = None
            return
        d = self.video.distance_async(ii, jj, beta=beta)
        self._prox_prefetch = ((t0, t1, t, float(beta)), len(ii), d)

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        t = self.video.counter
        ii, jj, cc = self._proximity_pairs(t0, t1, t)
        if ii is None:
            return

        pref = getattr(self, "_prox_prefetch", None)
        self._prox_prefetch = None
        if pref is not None and pref[0] == (t0, t1, t, float(beta)) \
                and pref[1] == len(ii):
            self._prox_hits = getattr(self, "_prox_hits", 0) + 1
            d = np.asarray(jax.device_get(pref[2]))[:len(ii)]
        else:
            d = self.video.distance(ii, jj, beta=beta)
        d = np.asarray(d, np.float64)
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if (t0 <= i1 < t) and (t1 <= j1 < t):
                            k = (i1 - t0) * (t - t1) + (j1 - t1)
                            if 0 <= k < cc:
                                d[k] = np.inf

        for i, j in zip(np.concatenate([self.ii, self.ii_bad,
                                        self.ii_inac]),
                        np.concatenate([self.jj, self.jj_bad,
                                        self.jj_inac])):
            suppress(int(i), int(j))

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                k = (i - t0) * (t - t1) + (j - t1)
                if k >= 0 and k < cc:
                    d[k] = np.inf

        for k in np.argsort(d):
            if k >= cc or d[k] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if ii.shape[0] > cc:
            sk = np.argsort(d[cc:ii.shape[0]])
            if d[cc + sk[0]] < thresh and d[cc + sk[0]] > 0:
                es.append((int(ii[cc + sk[0]]), int(jj[cc + sk[0]])))
                es.append((int(jj[cc + sk[0]]), int(ii[cc + sk[0]])))

        if es:
            a, b = np.asarray(es, np.int64).T
            self.add_factors(a, b, remove)
