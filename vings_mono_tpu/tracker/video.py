"""DepthVideo — the tracker's central keyframe store, TPU edition.

Rebuild of /root/reference/scripts/frontend/depth_video.py's state layer:
fixed-capacity device ring buffers for everything per-keyframe (poses w2c
tq7, 1/8-res disparities, features, GRU states, upsampled maps), plus
host-side (numpy) "save" buffers that receive keyframes as they scroll out
of the optimization window (depth_video.py:93-107,386-424). The reference's
mp.Value lock disappears: the tracker is single-threaded host code driving
jitted device programs.

All mutating ops are jitted scatter updates; the window `counter` lives on
the host so Python can branch on it (warmup, rollup, keyframe removal).
"""

from __future__ import annotations

import functools
import threading as _threading
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, projective as pops


@flax.struct.dataclass
class VideoBuffers:
    tstamp: jnp.ndarray       # (B,)
    images: jnp.ndarray       # (B, H, W, 3) float32 [0,1] RGB
    poses: jnp.ndarray        # (B, 7) w2c lietorch layout
    disps: jnp.ndarray        # (B, h, w) 1/8-res inverse depth
    disps_sens: jnp.ndarray   # (B, h, w) metric-prior disparity (0 = none)
    disps_up: jnp.ndarray     # (B, H, W)
    depths_cov: jnp.ndarray   # (B, h, w)
    depths_cov_up: jnp.ndarray  # (B, H, W)
    intrinsics: jnp.ndarray   # (B, 4) [fx fy cx cy] at 1/8 res
    fmaps: jnp.ndarray        # (B, h, w, 128)
    nets: jnp.ndarray         # (B, h, w, 128)
    inps: jnp.ndarray         # (B, h, w, 128)
    damping: jnp.ndarray      # (B, h, w) BA damping from GraphAgg


def empty_buffers(buf: int, height: int, width: int) -> VideoBuffers:
    h, w = height // 8, width // 8
    z = jnp.zeros
    return VideoBuffers(
        tstamp=z((buf,), jnp.float32),  # full-precision copies live on host
        images=z((buf, height, width, 3), jnp.float32),
        poses=jnp.tile(lie.se3_identity()[None], (buf, 1)),
        disps=jnp.ones((buf, h, w), jnp.float32),
        disps_sens=z((buf, h, w), jnp.float32),
        disps_up=z((buf, height, width), jnp.float32),
        depths_cov=jnp.ones((buf, h, w), jnp.float32),
        depths_cov_up=jnp.ones((buf, height, width), jnp.float32),
        intrinsics=z((buf, 4), jnp.float32),
        fmaps=z((buf, h, w, 128), jnp.float32),
        nets=z((buf, h, w, 128), jnp.float32),
        inps=z((buf, h, w, 128), jnp.float32),
        damping=jnp.full((buf, h, w), 1e-6, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("set_pose", "set_disp"),
                   donate_argnums=(0,))
def _append(bufs: VideoBuffers, idx, tstamp, image, pose, disp, disp_sens,
            intrinsics8, fmap, net, inp, set_pose=True, set_disp=True):
    out = bufs.replace(
        tstamp=bufs.tstamp.at[idx].set(tstamp),
        images=bufs.images.at[idx].set(image),
        disps_sens=bufs.disps_sens.at[idx].set(disp_sens),
        intrinsics=bufs.intrinsics.at[idx].set(intrinsics8),
        fmaps=bufs.fmaps.at[idx].set(fmap),
        nets=bufs.nets.at[idx].set(net),
        inps=bufs.inps.at[idx].set(inp),
    )
    if set_pose:
        out = out.replace(poses=out.poses.at[idx].set(pose))
    if set_disp:
        out = out.replace(disps=out.disps.at[idx].set(disp))
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def _shift_left(bufs: VideoBuffers, ix):
    """Drop keyframe ix: copy slot k+1 -> k for k >= ix (rm_keyframe,
    covisible_graph.py:179-211)."""
    def shift(x):
        rolled = jnp.roll(x, -1, axis=0)
        sel = jnp.arange(x.shape[0]) >= ix
        sel = sel.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(sel, rolled, x)
    return jax.tree.map(shift, bufs)


@functools.partial(jax.jit, donate_argnums=(0,))
def _roll(bufs: VideoBuffers, n):
    """Window rollup: shift all buffers left by n (dbaf_frontend.__rollup,
    dbaf_frontend.py:96-165)."""
    return jax.tree.map(lambda x: jnp.roll(x, -n, axis=0), bufs)


@functools.partial(jax.jit, static_argnames=("steps",))
def _reproject(bufs: VideoBuffers, ii, jj, steps=None):
    coords, _ = pops.projective_transform(bufs.poses, bufs.disps,
                                          bufs.intrinsics, ii, jj)
    return coords


@functools.partial(jax.jit, static_argnames=("beta", "bidirectional"))
def _distance(bufs: VideoBuffers, ii, jj, *, beta: float,
              bidirectional: bool = False):
    d = pops.frame_distance(bufs.poses, bufs.disps, bufs.intrinsics,
                            ii, jj, beta=jnp.float32(beta))
    if bidirectional:
        # fused: two dispatches per proximity query would pay the
        # host->device round trip twice
        d = 0.5 * (d + pops.frame_distance(
            bufs.poses, bufs.disps, bufs.intrinsics, jj, ii,
            beta=jnp.float32(beta)))
    return d


class DepthVideo:
    """Host wrapper: device buffers + python counter + numpy save buffers."""

    def __init__(self, cfg, height, width):
        self.cfg = cfg
        fe = cfg["frontend"]
        self.buf = int(fe["buffer"])
        self.ht, self.wd = height, width
        self.bufs = empty_buffers(self.buf, height, width)
        self.counter = 0
        self.imu_enabled = False
        self.visual_only_init = False
        self.tstamps_host = []   # float64-precision timestamps

        # save buffers for marginalized/rolled-out keyframes (host memory,
        # mirrors depth_video.py:93-107). Rollup spills are ASYNC: the d2h
        # transfers are enqueued with copy_to_host_async and only
        # materialized into the numpy arrays when a reader touches a
        # *_save property — a blocking 30-40 MB pull through the device
        # tunnel stalled the whole pipeline ~1.5 s every rollup.
        ns = int(fe.get("save_buffer", 4096))
        h, w = height // 8, width // 8
        self.count_save = 0
        self._pending_spills = []
        self._spill_lock = _threading.Lock()
        self._tstamp_save = np.zeros(ns, np.float64)
        self._images_save = np.zeros((ns, height, width, 3), np.float32)
        self._poses_save = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0],
                                            np.float32), (ns, 1))
        self._disps_save = np.zeros((ns, h, w), np.float32)
        self._disps_up_save = np.zeros((ns, height, width), np.float32)
        self._depths_cov_save = np.zeros((ns, h, w), np.float32)
        self._depths_cov_up_save = np.zeros((ns, height, width), np.float32)

    # ------------------------------------------------------------------
    def append(self, tstamp, image, pose, disp, disp_sens, intrinsics,
               fmap, net, inp):
        """intrinsics: full-res [fx fy cx cy]; stored at 1/8. pose/disp may
        be None to keep the slot's current value (the frontend pre-seeds the
        next slot each update, dbaf_frontend.py:397-398)."""
        if self.counter >= self.buf:
            raise RuntimeError("video buffer full — rollup should fire first")
        zero = jnp.zeros(())
        self.bufs = _append(
            self.bufs, self.counter, jnp.asarray(float(tstamp), jnp.float32),
            image,
            pose if pose is not None else self.bufs.poses[0] * 0,
            disp if disp is not None else zero,
            disp_sens, jnp.asarray(intrinsics, jnp.float32) / 8.0,
            fmap, net, inp,
            set_pose=pose is not None, set_disp=disp is not None)
        self.tstamps_host.append(float(tstamp))
        self.counter += 1

    def rm_keyframe(self, ix):
        self.bufs = _shift_left(self.bufs, ix)
        del self.tstamps_host[ix]
        self.counter -= 1

    def rollup(self, n):
        """Spill the oldest n keyframes to the host save buffers, then shift
        the device window left by n. The spill slices are enqueued (the
        slice programs run before _roll overwrites the donated buffers —
        stream order) and DMA'd to the host asynchronously; readers of the
        *_save properties drain them."""
        spill = {
            "images": self.bufs.images[:n], "poses": self.bufs.poses[:n],
            "disps": self.bufs.disps[:n], "disps_up": self.bufs.disps_up[:n],
            "depths_cov": self.bufs.depths_cov[:n],
            "depths_cov_up": self.bufs.depths_cov_up[:n]}
        for a in spill.values():
            a.copy_to_host_async()
        s = self.count_save
        e = s + n
        self._tstamp_save[s:e] = np.asarray(self.tstamps_host[:n])
        with self._spill_lock:
            self._pending_spills.append((s, n, spill))
        self.count_save = e
        self.bufs = _roll(self.bufs, n)
        self.tstamps_host = self.tstamps_host[n:]
        self.counter -= n

    def _drain_spills(self):
        with self._spill_lock:
            pending, self._pending_spills = self._pending_spills, []
        for s, n, spill in pending:
            e = s + n
            self._images_save[s:e] = np.asarray(spill["images"])
            self._poses_save[s:e] = np.asarray(spill["poses"])
            self._disps_save[s:e] = np.asarray(spill["disps"])
            self._disps_up_save[s:e] = np.asarray(spill["disps_up"])
            self._depths_cov_save[s:e] = np.asarray(spill["depths_cov"])
            self._depths_cov_up_save[s:e] = \
                np.asarray(spill["depths_cov_up"])

    @property
    def tstamp_save(self):
        return self._tstamp_save  # written synchronously in rollup

    @property
    def images_save(self):
        self._drain_spills()
        return self._images_save

    @property
    def poses_save(self):
        self._drain_spills()
        return self._poses_save

    @property
    def disps_save(self):
        self._drain_spills()
        return self._disps_save

    @property
    def disps_up_save(self):
        self._drain_spills()
        return self._disps_up_save

    @property
    def depths_cov_save(self):
        self._drain_spills()
        return self._depths_cov_save

    @property
    def depths_cov_up_save(self):
        self._drain_spills()
        return self._depths_cov_up_save

    # ------------------------------------------------------------------
    def reproject(self, ii, jj):
        return _reproject(self.bufs, jnp.asarray(ii, jnp.int32),
                          jnp.asarray(jj, jnp.int32))

    def distance_async(self, ii, jj, beta=0.3, bidirectional=False):
        """Enqueue the distance program + its d2h DMA and return the device
        array WITHOUT blocking — the caller pulls it later (by which time
        the transfer has usually landed). Pads the query to power-of-two
        buckets so XLA compiles a handful of shapes instead of one per
        frame."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        n = len(ii)
        cap = max(8, 1 << (n - 1).bit_length())
        pi = np.zeros(cap, np.int64)
        pj = np.zeros(cap, np.int64)
        pi[:n] = ii
        pj[:n] = jj
        di = jnp.asarray(np.stack([pi, pj]), jnp.int32)
        d = _distance(self.bufs, di[0], di[1], beta=float(beta),
                      bidirectional=bool(bidirectional))
        d.copy_to_host_async()
        return d

    def distance(self, ii, jj, beta=0.3, bidirectional=False):
        n = len(np.asarray(ii, np.int64).reshape(-1))
        d = self.distance_async(ii, jj, beta=beta,
                                bidirectional=bidirectional)
        return np.asarray(jax.device_get(d))[:n]

    def c2w_matrices(self, upto=None):
        n = self.counter if upto is None else upto
        return np.asarray(
            lie.se3_matrix(lie.se3_inv(self.bufs.poses[:n])))
