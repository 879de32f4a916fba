"""Sliding-window SLAM frontend (visual-only path) — rebuild of
DBAFusionFrontend (/root/reference/scripts/frontend/dbaf_frontend.py) minus
the GTSAM fusion (the VIO factor graph plugs in through tracker/vio.py):

per new keyframe (__update, reference :167-399):
  * age out stale edges into the inactive store,
  * propose proximity edges (distance-ranked with NMS),
  * iters1 GRU+BA updates,
  * window rollup when t1 > rollup_at (spill oldest 30 to host save buffers),
  * keyframe test: if the (t1-3, t1-2) flow distance is below threshold,
    remove keyframe t1-2, else run iters2 more updates,
  * seed pose/disp of the next incoming slot.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .graph import CovisibleGraph
from .video import DepthVideo


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
def _seed_next_kernel(bufs, packed, cv_alpha):
    """Seed slot t1 for the incoming frame: pose from a damped constant-
    velocity motion model (cv_alpha in [0,1]; 0 = the identity-motion
    seeding of the reference's VO path), disps[t1] = mean of recent disps.
    One compiled program with traced indices (per-frame python-int
    indexing would recompile every frame). packed = [t1, init_flag].

    Rationale (measured r5): at ~3.6 deg/frame yaw the GRU+BA must pull
    the full inter-frame motion from flow every frame when seeded with
    identity; under-pulling accumulates into systematic rotation drift
    (~3 deg/step on the 160-frame orbit). Predicting exp(alpha*log(rel))
    ahead leaves BA only the deviation from constant velocity — the
    standard monocular-SLAM motion model (the reference instead predicts
    with IMU when available, dbaf_frontend.py:242-247)."""
    from ..ops import lie
    t1, init_flag = packed[0], packed[1] != 0
    prev = bufs.poses[t1 - 1]
    if cv_alpha > 0.0:
        prev2 = bufs.poses[jnp.maximum(t1 - 2, 0)]
        rel = lie.se3_mul(prev, lie.se3_inv(prev2))    # w2c: X_k ~ rel*X_{k-1}
        xi = lie.se3_log(rel)
        pred = lie.se3_mul(lie.se3_exp(xi * cv_alpha), prev)
        pred = jnp.where(jnp.isfinite(pred).all(), pred, prev)
        seed = jnp.where(init_flag | (t1 < 2), prev, pred)
    else:
        seed = prev
    win = jax.lax.dynamic_slice_in_dim(bufs.disps, jnp.maximum(t1 - 4, 0),
                                       4, axis=0)
    mean4 = jnp.mean(win)
    mean1 = jnp.mean(bufs.disps[t1 - 1])
    mean = jnp.where(init_flag, mean4, mean1)
    return bufs.replace(poses=bufs.poses.at[t1].set(seed),
                        disps=bufs.disps.at[t1].set(mean))


@functools.partial(jax.jit, donate_argnums=(0,))
def _disp_prior_kernel(bufs, ix):
    new_disp = jnp.where(bufs.disps_sens[ix] > 0, bufs.disps_sens[ix],
                         bufs.disps[ix])
    return bufs.replace(disps=bufs.disps.at[ix].set(new_disp))


class Frontend:
    def __init__(self, video: DepthVideo, graph: CovisibleGraph, cfg):
        self.video = video
        self.graph = graph
        fe = cfg["frontend"]
        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0
        self.warmup = int(fe.get("warm_up", fe.get("warmup", 8)))
        self.beta = float(fe.get("beta", 0.3))
        self.frontend_nms = int(fe.get("frontend_nms", 1))
        self.keyframe_thresh = float(fe.get("keyframe_thresh", 3.5))
        self.frontend_window = int(fe.get("frontend_window", 25))
        self.frontend_thresh = float(fe.get("frontend_thresh", 17.5))
        self.frontend_radius = int(fe.get("frontend_radius", 2))
        self.active_window = int(fe.get("active_window", 12))
        self.max_age = int(fe.get("max_age", 25))
        # constant-velocity seeding strength; VIO overrides the seed with
        # IMU prediction anyway (inertial.on_new_frame). Default 0 =
        # identity-motion seeding (the reference's VO behavior): measured
        # r5 on the 160-frame orbit, full CV seeding DEGRADES ATE
        # 1.507 -> 1.631 (it amplifies last-step BA noise instead of
        # fixing a systematic under-pull)
        self.cv_alpha = float(fe.get("motion_model_alpha", 0.0))
        # 'vo_nerfslam' consolidates onto the VO tracker with per-frame
        # depth covariance (the reference's frontend_vo variant, SURVEY §2.3)
        self.visual_only = cfg.get("mode", "vo") in ("vo", "vo_nerfslam")
        if self.visual_only:
            self.iters1 = int(fe.get("iters1", 4))
            self.iters2 = int(fe.get("iters2", 2))
            self.video.visual_only_init = True
        else:
            self.iters1 = int(fe.get("iters1", 2))
            self.iters2 = int(fe.get("iters2", 1))
        self.rollup_at = int(fe.get("rollup_at", 65))
        self.rollup_n = int(fe.get("rollup_n", 30))
        self.new_frame_added = False
        self.did_rollup = False
        self._kf_dist_prefetch = None
        # hook for the VIO fusion layer (set via attach_inertial)
        self.inertial = None
        # live trajectory/attitude/bias monitor (dbaf_frontend.py:83-90)
        self.monitor = None
        if fe.get("show_plot", False):
            from ..utils.monitor import FrontendMonitor
            self.monitor = FrontendMonitor(cfg)

    def attach_inertial(self, inertial):
        self.inertial = inertial
        self.graph.inertial = inertial

    # ------------------------------------------------------------------
    def __call__(self):
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()

    # ------------------------------------------------------------------
    def _initialize(self):
        self.t0, self.t1 = 0, self.video.counter
        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        if self.inertial is not None:
            self.inertial.init_states()
        for _ in range(8):
            self.graph.update(1, use_inactive=True)
        self.graph.add_proximity_factors(0, 0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        for _ in range(16):
            self.graph.update(1, use_inactive=True)

        self._seed_next(init=True)
        self.is_initialized = True
        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)
        self._prefetch_proximity()

    # ------------------------------------------------------------------
    def _update(self):
        self.new_frame_added = False
        self.did_rollup = False
        self.count += 1
        self.t1 += 1

        if self.inertial is not None:
            self.inertial.on_new_frame(self.t1)

        # age out edges (dbaf_frontend.py:252-258)
        if len(self.graph.ii) > 0:
            stale = (self.graph.ii < self.t1 - self.active_window) | \
                (self.graph.jj < self.t1 - self.active_window)
            if self.visual_only:
                mask = (self.graph.age > self.max_age) & stale
            else:
                mask = (self.graph.age > self.max_age) | stale
            self.graph.rm_factors(mask, store=True)

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True)

        # seed new disparity with the metric prior where available
        self._apply_disp_prior(self.t1 - 1)

        for _ in range(self.iters1):
            self.graph.update(None, None, iters=2, use_inactive=True)

        if self.t1 > self.rollup_at:
            self._rollup(self.rollup_n)
            self.did_rollup = True

        # keyframe decision (dbaf_frontend.py:346-374). thresh <= 0 keeps
        # every keyframe, so the distance pull (a ~30-40 ms blocking tunnel
        # sync that also drains the queued GRU+BA updates) is dead weight —
        # skip it, same shortcut the motion filter takes for filter_thresh<0
        if self.keyframe_thresh <= 0.0:
            d = float("inf")
        else:
            pref = self._kf_dist_prefetch
            self._kf_dist_prefetch = None
            if pref is not None and pref[0] == (self.t1 - 3, self.t1 - 2):
                self._kf_dist_hits = getattr(self, "_kf_dist_hits", 0) + 1
                # enqueued at the end of the previous frame (same trick as
                # prefetch_proximity): the DMA has landed by now, so this
                # pull is latency-free. The distance is one BA-refinement
                # stale (measured from poses/disps before this frame's
                # iters1), which for frames 2-3 steps into the converged
                # window does not move the gate decision
                d = float(np.asarray(jax.device_get(pref[1]))[0])
            else:
                d = float(np.asarray(self.video.distance(
                    [self.t1 - 3], [self.t1 - 2], beta=self.beta,
                    bidirectional=True))[0])
        if d < self.keyframe_thresh:
            self.graph.rm_keyframe(self.t1 - 2)
            if self.inertial is not None:
                self.inertial.on_rm_keyframe(self.t1 - 2)
            self.t1 -= 1
        else:
            for k in range(self.iters2):
                if k == self.iters2 - 1:
                    # depth covariance on the frame's final solve, consumed
                    # by the middleware's uncertainty weighting
                    self.graph._next_update_cov = True
                self.graph.update(None, None, iters=2, use_inactive=True)
            self.new_frame_added = True

        if self.inertial is not None:
            self.inertial.maybe_initialize(self.t1)
            # GNSS geo-referencing once IMU fusion is live
            # (dbaf_frontend.py:392)
            if self.inertial.maybe_init_gnss(self.t1):
                self.graph.update(None, None, iters=2, use_inactive=True)

        if self.monitor is not None:
            self.monitor.record(self)
            if self.did_rollup:  # reference refreshes the panel on rollup
                self.monitor.render()

        self._seed_next()
        self._prefetch_proximity()

    def _prefetch_proximity(self):
        """Enqueue the next frame's proximity distances now (all inputs are
        final after _seed_next) so the next proposal's pull is latency-free.
        VIO runs IMU pose prediction between frames (inertial.on_new_frame),
        which would change the distances — prefetch only in visual-only
        mode."""
        if self.inertial is None:
            self.graph.prefetch_proximity(
                self.t1 - 4, max(self.t1 + 1 - self.frontend_window, 0),
                beta=self.beta)
        # same trick for the next frame's keyframe decision: its pair
        # (t1'-3, t1'-2) is (t1-2, t1-1) in this frame's numbering — both
        # already in the window. Invalidated by rollups (key shift in
        # _rollup) and by VIO (pose prediction between frames)
        if self.inertial is None and self.keyframe_thresh > 0.0 \
                and self.t1 >= 2:
            d = self.video.distance_async(
                [self.t1 - 2], [self.t1 - 1], beta=self.beta,
                bidirectional=True)
            self._kf_dist_prefetch = ((self.t1 - 2, self.t1 - 1), d)

    # ------------------------------------------------------------------
    def _rollup(self, n):
        if self._kf_dist_prefetch is not None:
            # the prefetched distance itself is index-free; only its key
            # (frame indices) shifts with the window
            key, d = self._kf_dist_prefetch
            self._kf_dist_prefetch = ((key[0] - n, key[1] - n), d)
        self.video.rollup(n)
        self.graph.shift_indices(n)
        self.graph.ii_bad = np.maximum(self.graph.ii_bad - n, -1)
        self.graph.jj_bad = np.maximum(self.graph.jj_bad - n, -1)
        self.t0 = max(0, self.t0 - n)
        self.t1 -= n
        if self.inertial is not None:
            self.inertial.on_rollup(n)

    def _apply_disp_prior(self, ix):
        self.video.bufs = _disp_prior_kernel(self.video.bufs,
                                             jnp.asarray(ix, jnp.int32))

    def _seed_next(self, init=False):
        self.video.bufs = _seed_next_kernel(
            self.video.bufs,
            jnp.asarray(np.asarray([self.t1, 1 if init else 0], np.int32)),
            self.cv_alpha)
