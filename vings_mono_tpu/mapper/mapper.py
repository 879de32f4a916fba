"""Host-side mapper orchestration — the TPU `GaussianModel`.

Mirrors run_only_mapping (/root/reference/scripts/gaussian/
gaussian_base.py:446-475): consume the tracker's `viz_out` dict, detect new
keyframes by timestamp, prune+densify, then run the jitted training loop.
All heavy work happens in 3 compiled programs (add_frame, bin_stack,
train_loop); this class only does bookkeeping and fixed-capacity padding.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import ply as ply_io
from .cameras import camera_from_intrinsic
from .densify import add_frame
from .state import empty_state, adam_init
from .train import (KeyframeBatch, bin_stack, bin_rows,
                    permute_scatter_binned, train_loop,
                    stablemask_control, storage_control, make_camera)
from ..ops.rasterizer import render


def _intr4(intr: dict):
    """Reference intrinsic dict -> [fx, fy, cx, cy] (fu/cu are row-major)."""
    return jnp.asarray([intr["fv"], intr["fu"], intr["cv"], intr["cu"]],
                       jnp.float32)


@jax.jit
def _stats_full(n_padded, overflow, psnr):
    return jnp.max(n_padded), jnp.any(overflow), psnr


@jax.jit
def _stats_coarse(n_padded, overflow, n_padded_c, overflow_c, psnr):
    return (jnp.max(n_padded), jnp.any(overflow),
            jnp.max(n_padded_c), jnp.any(overflow_c), psnr)


class GaussianMapper:
    def __init__(self, cfg):
        self.cfg = cfg
        m = cfg["mapper"]
        self.capacity = int(m["capacity"])
        self.kf_capacity = int(m["kf_capacity"])
        # pair_capacity is the UPPER bucket; the mapper walks down to the
        # smallest power-of-two bucket that fits the observed pair count
        # (+30% headroom) — the tile kernel's cost is ~linear in p_cap, so
        # paying for dead capacity is pure waste. Bucket switches recompile
        # once each (2-3 variants) and invalidate the binning cache.
        self._p_cap_max = int(m["pair_capacity"])
        self._p_cap_min = max(int(m.get("pair_capacity_min",
                                        self._p_cap_max // 4)),
                              int(m["chunk"]))
        self._last_npairs = None
        self.bin_kwargs = {"p_cap": self._p_cap_max,
                           "chunk": int(m["chunk"]),
                           "side": int(m["side"]),
                           "v_cap": int(m.get("visible_capacity", 0)),
                           # keep only the tile_depth_cap nearest pairs per
                           # tile: transmittance saturates (T < 1e-4) long
                           # before, and sort/gather/reduce cost tracks the
                           # kept pairs (see binning.py). 0 = uncapped.
                           "tile_cap": int(m.get("tile_depth_cap", 512))}
        self._impl_kwargs = (("impl", m.get("impl", "tile")),
                             ("interpret", bool(m.get("interpret", False))))
        # multi-device data parallelism over the keyframe window (config
        # `parallel: {dp: N}` — VERDICT r3 #3): keyframes+binning shard
        # over a flat dp mesh, Gaussian state replicates, grads psum over
        # ICI. dp=1 (default) keeps the single-device path untouched.
        pcfg = cfg.get("parallel") or {}
        self.dp = int(pcfg.get("dp", 1))
        self.mesh = None
        if self.dp > 1:
            from ..parallel.mesh import make_dp_mesh
            self.mesh = make_dp_mesh(self.dp, pcfg.get("platform"))
            assert self.kf_capacity % self.dp == 0, \
                "mapper.kf_capacity must divide by parallel.dp"
        self.state = empty_state(self.capacity)
        self.opt = adam_init(self.state)
        self.use_sky = bool(cfg.get("use_sky"))
        self.sky = None
        if self.use_sky:
            from .sky import SkyModel
            self.sky = SkyModel(cfg, capacity=int(m.get("sky_capacity",
                                                        1 << 15)))
        self.history = []          # timestamps already mapped
        self.time_idx = 0
        self.initialized = False
        self.key = jax.random.PRNGKey(cfg.get("seed", 0))
        self._metrics_dev = None   # device tree; pulled lazily (d2h syncs
                                   # cost 5-40 ms each through the tunnel)
        self._pending_stats = []
        # drain accumulated end-of-run stats every N keyframes (see
        # _drain_stats; per-keyframe drains stall on the tunnel backlog)
        self.stats_every = int(m.get("stats_every", 4))
        self.H = self.W = None
        # round-robin binning cache: re-bin only `rebin_rows` cameras per
        # keyframe (the new one + the stalest); cached rows follow the
        # sliding window by global_kf_id. 0 = always full re-bin.
        self.rebin_rows = int(m.get("rebin_rows", 3))
        self._binned = None
        self._cached_gids = None
        self._bin_age = None
        # coarse-to-fine: fraction of each keyframe's train iterations run
        # at half resolution (0 = off). Own binning cache + pair bucket —
        # pairs/tiles at half res are ~1/3 of full res.
        self.coarse_frac = float(
            cfg["training_args"].get("coarse_frac", 0.0))
        vc = int(m.get("visible_capacity", 0))
        self.bin_kwargs_c = dict(
            self.bin_kwargs,
            p_cap=max(self._p_cap_min, self._p_cap_max // 2),
            # the half-res phase has 1/4 the pixels; compacting to half the
            # nearest visible Gaussians halves its sort/gather/reduce cost,
            # and the fine phase still trains the full visible set
            v_cap=int(m.get("visible_capacity_coarse",
                            vc // 2 if vc else 0)))
        self._binned_c = None
        self._cached_gids_c = None
        self._bin_age_c = None

    def invalidate_binning(self):
        """Drop both binning caches — REQUIRED after any Gaussian teleport
        (loop rectification) or storage page-in: BinnedScene stores tile
        assignments by Gaussian index."""
        self._binned = None
        self._binned_c = None

    @property
    def render_kwargs(self):
        return tuple(self.bin_kwargs.items()) + self._impl_kwargs

    @property
    def render_kwargs_c(self):
        return tuple(self.bin_kwargs_c.items()) + self._impl_kwargs

    def _drain_stats(self):
        """Materialize the ACCUMULATED end-of-run stats (pair-slot demand,
        overflow, PSNR). run() enqueues each keyframe's stats with an async
        d2h and only drains every `stats_every` keyframes: through the FIFO
        device tunnel a pull waits on the whole enqueued backlog (~300 ms
        measured, scripts/profile_host.py), so per-keyframe draining stalls
        the mapper thread for most of a train_loop. Draining a batch pulls
        values that have long since landed — one cheap sync amortized over N
        keyframes. Bucket tuning/adaptive-iters react up to N keyframes
        later; a missed overflow keyframe only drops its farthest pairs
        until the batch drain grows the bucket."""
        pend = getattr(self, "_pending_stats", None) or []
        if not pend:
            return
        self._pending_stats = []
        pulled_all = jax.device_get([p[0] for p in pend])
        for pulled, (_, had_c) in zip(pulled_all, pend):
            self._tune_pair_capacity(None, pulled=pulled[:2])
            if had_c:
                self._tune_pair_capacity(None, sfx="_c", pulled=pulled[2:4])
            self._last_psnr_host = float(pulled[-1])

    def freeze_buckets(self):
        """Pin both pair-capacity buckets (bench: a bucket switch
        recompiles and must not land inside the measured section). Each
        cache freezes at the smallest ladder bucket covering the largest
        pair count it has observed — the hysteresis path may be sitting a
        bucket too high (e.g. after an early-warmup overflow jump to max),
        and kernel grid length, gathers and the reduce all scale with
        p_cap. Callers should run 1-2 more keyframes after freezing so the
        (possibly re-sized) programs compile outside any measured section.
        Later overflow keyframes just drop their farthest pairs."""
        self._drain_stats()
        for sfx in ("", "_c"):
            seen = getattr(self, "_max_npairs" + sfx, None)
            kw = getattr(self, "bin_kwargs" + sfx)
            if seen:
                fits = [b for b in self._bucket_ladder() if b >= seen]
                want = fits[0] if fits else self._p_cap_max
                if want != kw["p_cap"]:
                    setattr(self, "bin_kwargs" + sfx, dict(kw, p_cap=want))
                    setattr(self, "_binned" + sfx, None)
        self._cap_frozen = True

    def _bucket_ladder(self):
        """Allowed pair-capacity buckets: {min*2^k} plus 1.5x intermediate
        steps (when chunk-divisible), capped at pair_capacity. The finer
        ladder keeps the working bucket stable when the pair count sits
        near a power of two."""
        ch = int(self.bin_kwargs["chunk"])
        out = set()
        m = self._p_cap_min
        while m <= self._p_cap_max:
            out.add(m)
            m15 = m * 3 // 2
            if (m * 3) % 2 == 0 and m15 <= self._p_cap_max \
                    and m15 % ch == 0:
                out.add(m15)
            m *= 2
        out.add(self._p_cap_max)
        return sorted(out)

    def _tune_pair_capacity(self, binned, sfx="", pulled=None):
        """Pick next keyframe's pair-capacity bucket from this keyframe's
        observed PADDED pair-slot demand (binning lays each tile's run
        out padded to a chunk multiple, so pad_off[T] is what a bucket
        must cover — sizing on the raw pair count silently dropped the
        trailing tiles' pairs via the dest clamp). `pulled` lets run()
        batch the full+coarse d2h pulls into ONE sync (each is 5-40 ms
        through the tunnel)."""
        if getattr(self, "_cap_frozen", False):
            return
        if pulled is None:
            pulled = jax.device_get((jnp.max(binned.n_padded),
                                     jnp.any(binned.overflow)))
        n, overflow = int(pulled[0]), bool(pulled[1])
        if sfx == "":
            self._last_npairs = n
        setattr(self, "_max_npairs" + sfx,
                max(n, getattr(self, "_max_npairs" + sfx, 0)))
        kw = getattr(self, "bin_kwargs" + sfx)
        cap = kw["p_cap"]
        # Bucket ladder with 1.5x intermediate steps and a hysteresis band:
        # GROW one step only when pairs actually threaten the cap (overflow
        # or within 5%); SHRINK (3 votes) to the smallest bucket holding
        # 1.15*n. The old pure power-of-two ladder with a projected-1.3*n
        # grow rule flip-flopped whenever n hovered near a boundary — and
        # every bucket switch recompiles bin/train AND drops the binning
        # cache, which profiling showed as the single largest mapper cost
        # (~5 s recompile every few keyframes on the coarse cache).
        buckets = self._bucket_ladder()
        if overflow:
            # hard overflow: true demand unknown (n clipped at cap) — jump
            # straight to max rather than rediscovering it a step at a time
            want = self._p_cap_max
        elif n * 50 > cap * 49:
            bigger = [b for b in buckets if b > cap]
            want = bigger[0] if bigger else cap
        else:
            fits = [b for b in buckets if n * 23 // 20 + 1 <= b]
            want = min(fits[0] if fits else self._p_cap_max, cap)
        votes_attr = "_shrink_votes" + sfx
        if want > cap:                 # grow immediately (overflow drops
            setattr(self, votes_attr, 0)  # pairs -> rendering artifacts)
        elif want < cap:
            # shrink only after 3 consecutive votes — each bucket switch
            # recompiles the bin/train programs
            votes = getattr(self, votes_attr, 0) + 1
            setattr(self, votes_attr, votes)
            if votes < 3:
                return
            setattr(self, votes_attr, 0)
        else:
            setattr(self, votes_attr, 0)
            return
        setattr(self, "bin_kwargs" + sfx, dict(kw, p_cap=want))
        setattr(self, "_binned" + sfx, None)  # cache rows are cap-shaped

    # ---- packing -----------------------------------------------------
    def _pack_batch(self, viz_out) -> KeyframeBatch:
        # host copy of the valid count — int(batch.n_valid) would d2h-sync
        if "n_valid" in viz_out:
            self._n_valid_host = int(viz_out["n_valid"])
        else:
            self._n_valid_host = min(len(viz_out["viz_out_idx_to_f_idx"]),
                                     self.kf_capacity)
        gids = viz_out.get("global_kf_id_host",
                           viz_out.get("global_kf_id"))
        gids = np.asarray(jax.device_get(gids), np.int64)
        kc_ = self.kf_capacity
        if len(gids) > kc_:
            gids = gids[-kc_:]
        elif len(gids) < kc_:
            gids = np.concatenate(
                [gids, np.full(kc_ - len(gids), gids[-1], np.int64)])
        self._gids_host = gids
        pm = viz_out.get("pixel_mask")
        pm = None if pm is None else jnp.asarray(pm, bool)
        if "n_valid" in viz_out and \
                viz_out["images"].shape[0] == self.kf_capacity:
            # middleware already produced a fixed-capacity padded window
            return KeyframeBatch(
                images=jnp.moveaxis(jnp.asarray(viz_out["images"],
                                                jnp.float32), -1, 1),
                depths=jnp.moveaxis(jnp.asarray(viz_out["depths"],
                                                jnp.float32), -1, 1),
                depths_cov=jnp.moveaxis(jnp.asarray(viz_out["depths_cov"],
                                                    jnp.float32), -1, 1),
                w2cs=jnp.linalg.inv(jnp.asarray(viz_out["poses"],
                                                jnp.float32)),
                global_kf_id=jnp.asarray(viz_out["global_kf_id"],
                                         jnp.int32),
                n_valid=jnp.asarray(int(viz_out["n_valid"]), jnp.int32),
                pixel_mask=pm)
        imgs = jnp.moveaxis(jnp.asarray(viz_out["images"], jnp.float32),
                            -1, 1)                    # (K,3,H,W)
        depths = jnp.moveaxis(jnp.asarray(viz_out["depths"], jnp.float32),
                              -1, 1)
        covs = jnp.moveaxis(jnp.asarray(viz_out["depths_cov"], jnp.float32),
                            -1, 1)
        c2ws = jnp.asarray(viz_out["poses"], jnp.float32)
        w2cs = jnp.linalg.inv(c2ws)
        gids = jnp.asarray(viz_out["global_kf_id"], jnp.int32)
        K = imgs.shape[0]
        kc = self.kf_capacity
        if K > kc:
            imgs, depths, covs, w2cs, gids = (x[-kc:] for x in
                                              (imgs, depths, covs, w2cs,
                                               gids))
            K = kc

        def pad(x):
            if x.shape[0] == kc:
                return x
            reps = [kc - x.shape[0]] + [1] * (x.ndim - 1)
            return jnp.concatenate([x, jnp.tile(x[-1:], reps)], axis=0)

        if pm is not None:
            pm = pad(pm[-kc:] if pm.shape[0] > kc else pm)
        return KeyframeBatch(images=pad(imgs), depths=pad(depths),
                             depths_cov=pad(covs), w2cs=pad(w2cs),
                             global_kf_id=pad(gids),
                             n_valid=jnp.asarray(K, jnp.int32),
                             pixel_mask=pm)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        if self.mesh is not None:
            from ..parallel.mesh import put_replicated
            k = put_replicated(self.mesh, k)
        return k

    def _to_mesh(self, tree):
        """Replicate a pytree onto the dp mesh (no-op when dp=1 or when
        the leaves already carry that sharding)."""
        if self.mesh is None:
            return tree
        from ..parallel.mesh import put_replicated
        return put_replicated(self.mesh, tree)

    def _train(self, *targs, **tkw):
        """Route train_loop through the dp mesh when configured."""
        if self.mesh is None:
            return train_loop(*targs, **tkw)
        from ..parallel.mesh import dp_train_loop
        return dp_train_loop(self.mesh, *targs, **tkw)

    # ---- round-robin binning cache -------------------------------------
    def _refresh_binned(self, batch, intr4, height=None, width=None,
                        bin_kwargs=None, sfx=""):
        """Re-bin only the new keyframe + the stalest cached rows; cached
        rows follow the sliding window by global keyframe id. Stale rows
        are safe: the exact-ellipse binning carries 2.5 px of margin (pose
        drift within the window is sub-pixel per keyframe) and pruned
        Gaussians render at zero opacity (projection gates the packed
        payload by `alive`). Newly-densified Gaussians reach every row
        within ceil(K/rebin_rows) keyframes.

        sfx selects the cache: "" = full-res, "_c" = the coarse half-res
        cache (own resolution + pair bucket, same policy)."""
        height = self.H if height is None else height
        width = self.W if width is None else width
        bin_kwargs = self.bin_kwargs if bin_kwargs is None else bin_kwargs
        kc = self.kf_capacity
        R = self.rebin_rows
        gids = self._gids_host
        cached = getattr(self, "_binned" + sfx)
        cached_gids = getattr(self, "_cached_gids" + sfx)
        if self.mesh is not None:
            # dp mode: full dp-sharded re-bin every keyframe — each device
            # bins K/dp cameras in parallel, which is cheaper than the
            # cache's stalest-rows re-bin and has zero staleness
            from ..parallel.mesh import dp_bin_stack
            binned = dp_bin_stack(self.mesh, self.state, batch, intr4,
                                  height, width, **bin_kwargs)
            setattr(self, "_binned" + sfx, binned)
            setattr(self, "_cached_gids" + sfx, gids.copy())
            setattr(self, "_bin_age" + sfx, np.zeros(kc, np.int64))
            return binned
        full_rebin = (R <= 0 or R >= kc or cached is None)
        if not full_rebin:
            perm = np.zeros(kc, np.int64)
            have = np.zeros(kc, bool)
            for pos, g in enumerate(gids):
                w = np.where(cached_gids == g)[0]
                if len(w):
                    perm[pos] = w[0]
                    have[pos] = True
            if int((~have).sum()) > R:
                full_rebin = True
        if full_rebin:
            binned = bin_stack(self.state, batch, intr4, height, width,
                               **bin_kwargs)
            setattr(self, "_binned" + sfx, binned)
            setattr(self, "_cached_gids" + sfx, gids.copy())
            setattr(self, "_bin_age" + sfx, np.zeros(kc, np.int64))
            return binned
        bin_age = getattr(self, "_bin_age" + sfx)
        age = np.where(have, bin_age[perm] + 1, 1 << 30)
        rows = np.argsort(-age)[:R]                # stalest first
        part = bin_rows(self.state, batch.w2cs[jnp.asarray(rows,
                                                           jnp.int32)],
                        intr4, height, width, **bin_kwargs)
        binned = permute_scatter_binned(
            cached, jnp.asarray(perm, jnp.int32), part,
            jnp.asarray(rows, jnp.int32))
        setattr(self, "_binned" + sfx, binned)
        age[rows] = 0
        setattr(self, "_bin_age" + sfx, age)
        setattr(self, "_cached_gids" + sfx, gids.copy())
        return binned

    # ---- new-keyframe detection (judge_new_frame, host logic) ---------
    def _judge_new_frame(self, viz_out):
        ts = np.asarray(viz_out["viz_out_idx_to_f_idx"]).tolist()
        for i, t in enumerate(ts):
            if t not in self.history:
                self.history.append(t)
                return i
        return None

    # ---- main entry (mirrors gaussian_base.run) ------------------------
    def run(self, viz_out):
        if viz_out is None:
            return
        intr = viz_out["intrinsic"]
        self.H, self.W = int(intr["H"]), int(intr["W"])
        intr4 = _intr4(intr)
        batch = self._pack_batch(viz_out)
        if self.mesh is not None:
            # everything the mapper programs touch must live on the mesh
            # (mixing single-device tracker outputs with mesh-replicated
            # state in one jit raises "incompatible devices")
            batch = self._to_mesh(batch)
            intr4 = self._to_mesh(intr4)
            self.state = self._to_mesh(self.state)
            self.opt = self._to_mesh(self.opt)
            if self.use_sky:
                self.sky.state = self._to_mesh(self.sky.state)
                self.sky.opt = self._to_mesh(self.sky.opt)
        ta = self.cfg["training_args"]
        mcfg = self.cfg["mapper"]

        if not self.initialized:
            ts = np.asarray(viz_out["viz_out_idx_to_f_idx"]).tolist()
            self.history = list(ts)
            K = self._n_valid_host
            for i in range(K):
                self.state, self.opt, n_new, _ = add_frame(
                    self.state, self.opt, batch.w2cs[i], intr4,
                    batch.images[i], batch.depths[i], self._next_key(),
                    batch.global_kf_id[i], height=self.H, width=self.W,
                    n_points=int(mcfg["points_first_frame"]), first=True,
                    render_kwargs=self.render_kwargs)
                if self.use_sky:
                    self.sky.add_frame(batch.w2cs[i], intr4,
                                       batch.images[i], self._next_key(),
                                       self.H, self.W)
            self.initialized = True
        else:
            new_id = self._judge_new_frame(viz_out)
            if new_id is None:
                return
            # if window was cropped to kf_capacity, re-locate index
            new_id = min(new_id, self._n_valid_host - 1)
            self.state, self.opt, n_new, n_kill = add_frame(
                self.state, self.opt, batch.w2cs[new_id], intr4,
                batch.images[new_id], batch.depths[new_id],
                self._next_key(), batch.global_kf_id[new_id],
                height=self.H, width=self.W,
                n_points=int(mcfg["points_per_frame"]), first=False,
                accum_thresh=float(self.cfg["adc_args"]["accum_thresh"]),
                render_kwargs=self.render_kwargs)
            if self.use_sky:
                self.sky.add_frame(batch.w2cs[new_id], intr4,
                                   batch.images[new_id], self._next_key(),
                                   self.H, self.W)

        binned = self._refresh_binned(batch, intr4)

        self.refined_poses = None
        if self.cfg.get("use_refine") and self.initialized:
            from .refine import refine_poses, apply_pose_bias_to_gaussians
            new_c2ws, _ = refine_poses(
                self.state, batch, binned, intr4, iters=20,
                height=self.H, width=self.W,
                render_kwargs=self.render_kwargs)
            old_c2ws = jnp.linalg.inv(batch.w2cs)
            self.state = apply_pose_bias_to_gaussians(
                self.state, batch.global_kf_id, old_c2ws, new_c2ws)
            batch = batch._replace(w2cs=jnp.linalg.inv(new_c2ws))
            self.refined_poses = new_c2ws

        iters = int(ta["iters"])
        adaptive = self.cfg["mapper"].get("adaptive_iters")
        if len(getattr(self, "_pending_stats", ())) >= self.stats_every:
            self._drain_stats()
        if adaptive and getattr(self, "_last_psnr_host", None) is not None:
            # converged windows need fewer refinement iterations — halve
            # the budget once the window PSNR clears the bar (two compiled
            # variants; VERDICT r1 next-step 1b). The PSNR host value was
            # pulled in the PREVIOUS keyframe's deferred end-of-run stats —
            # a dedicated device_get here cost a ~30 ms tunnel round trip.
            if self._last_psnr_host > float(adaptive):
                iters = max(iters // 2, 10)

        lrs = self._lrs(ta)
        sky_images = None
        if self.use_sky:
            sky_images = viz_out.get("sky_images")
            sky_images = batch.images if sky_images is None else \
                jnp.moveaxis(jnp.asarray(sky_images, jnp.float32), -1, 1)

        def _sky_kwargs(b, i4, h, w, bkw, images):
            if not self.use_sky:
                return {}
            from .sky import sky_render_params
            sp = sky_render_params(self.sky.state)
            sky_binned = bin_stack(
                self.sky.state.replace(xyz=sp[0], log_scale=sp[1]),
                b, i4, h, w, **bkw) \
                if self.cfg["mapper"].get("impl", "tile") == "tile" else None
            return dict(use_sky=True, sky_state=self.sky.state,
                        sky_opt=self.sky.opt, sky_images=images,
                        sky_binned=sky_binned)

        # coarse-to-fine: run the first coarse_frac of the budget at half
        # resolution (the early iterations move Gaussians toward coarse
        # photometric agreement; pixels-level detail only matters once
        # they've settled — ref runs fixed-res but its CUDA rasterizer is
        # ~10x cheaper per iter, gaussian_base.py:343-434). Cost at half
        # res is ~1/3 of full (tiles AND pairs shrink ~4x, bucket ~2x).
        iters_c = 0
        if (self.coarse_frac > 0 and iters > 1
                and self.H % 2 == 0 and self.W % 2 == 0):
            iters_c = min(int(round(iters * self.coarse_frac)), iters - 1)
        binned_c = None
        if iters_c:
            from .train import half_batch, half_intr4, pool2x2
            batch_c = half_batch(batch)
            intr4_c = half_intr4(intr4)
            hc, wc = self.H // 2, self.W // 2
            binned_c = self._refresh_binned(batch_c, intr4_c, height=hc,
                                            width=wc,
                                            bin_kwargs=self.bin_kwargs_c,
                                            sfx="_c")
            self.state, self.opt, sky_state, sky_opt, _ = self._train(
                self.state, self.opt, batch_c, binned_c, intr4_c,
                self._next_key(), iters=iters_c, height=hc, width=wc,
                weights=ta["loss_weights"], lrs=lrs,
                render_kwargs=self.render_kwargs_c,
                **_sky_kwargs(batch_c, intr4_c, hc, wc, self.bin_kwargs_c,
                              None if sky_images is None
                              else pool2x2(sky_images)))
            if self.use_sky:
                self.sky.state, self.sky.opt = sky_state, sky_opt

        targs = (self.state, self.opt, batch, binned, intr4,
                 self._next_key())
        tkw = dict(iters=iters - iters_c, height=self.H, width=self.W,
                   weights=ta["loss_weights"], lrs=lrs,
                   render_kwargs=self.render_kwargs,
                   **_sky_kwargs(batch, intr4, self.H, self.W,
                                 self.bin_kwargs, sky_images))
        # abstract signature for MFU accounting (utils/mfu.py): shapes only,
        # so the program can be re-lowered for XLA cost analysis without
        # holding (donated) buffers alive
        self._mfu_sig = (jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, targs), tkw, iters - iters_c)
        self.state, self.opt, sky_state, sky_opt, metrics = self._train(
            *targs, **tkw)
        if self.use_sky:
            self.sky.state, self.sky.opt = sky_state, sky_opt
        self._metrics_dev = metrics

        self.time_idx += 1
        if self.time_idx % int(ta["num_keyframe"]) == 0:
            self.state = stablemask_control(self.state)
        if self.time_idx % 4 == 0:
            self.state, _ = storage_control(
                self.state, batch, binned, intr4, height=self.H,
                width=self.W, render_kwargs=self.render_kwargs)
        # enqueue (don't pull) the end-of-run stats: the pull is deferred to
        # the next keyframe's _drain_stats so this thread returns without
        # blocking and the device queue never drains between keyframes
        psnr_dev = metrics["psnr"]
        if binned_c is not None:
            stats = _stats_coarse(binned.n_padded, binned.overflow,
                                  binned_c.n_padded, binned_c.overflow,
                                  psnr_dev)
        else:
            stats = _stats_full(binned.n_padded, binned.overflow, psnr_dev)
        for a in stats:
            a.copy_to_host_async()
        if not isinstance(getattr(self, "_pending_stats", None), list):
            self._pending_stats = []
        self._pending_stats.append((stats, binned_c is not None))

    @staticmethod
    def _lrs(ta):
        lr = ta["lr"]
        return {"xyz": lr["_xyz_lr"], "rgb": lr["_rgb_lr"],
                "log_scale": lr["_scaling_lr"], "quat": lr["_rotation_lr"],
                "logit_opacity": lr["_opacity_lr"]}

    # ---- direct window training (loop-closure retrain) -----------------
    def train_on_window(self, viz_out, iters, weights=None):
        """Train on an explicit keyframe window without the add-frame /
        densify bookkeeping — the loop-closure retrain path
        (loop/rectify.retrain_gaussians; ref loop_rectify.py:463-548)."""
        from .train import bin_stack, train_loop
        intr4 = _intr4(viz_out["intrinsic"])
        if self.H is None:
            self.H = int(viz_out["intrinsic"]["H"])
            self.W = int(viz_out["intrinsic"]["W"])
        batch = self._pack_batch(viz_out)
        if self.mesh is not None:
            batch = self._to_mesh(batch)
            intr4 = self._to_mesh(intr4)
            self.state = self._to_mesh(self.state)
            self.opt = self._to_mesh(self.opt)
            from ..parallel.mesh import dp_bin_stack
            binned = dp_bin_stack(self.mesh, self.state, batch, intr4,
                                  self.H, self.W, **self.bin_kwargs)
        else:
            binned = bin_stack(self.state, batch, intr4, self.H, self.W,
                               **self.bin_kwargs)
        ta = self.cfg["training_args"]
        self.state, self.opt, _, _, metrics = self._train(
            self.state, self.opt, batch, binned, intr4, self._next_key(),
            iters=int(iters), height=self.H, width=self.W,
            weights={**ta["loss_weights"], **(weights or {})},
            lrs=self._lrs(ta), render_kwargs=self.render_kwargs)
        self._metrics_dev = metrics
        self.invalidate_binning()  # cache rows are for the live window

    # ---- rendering for vis / eval --------------------------------------
    def render_at(self, w2c, intr: dict, max_dist=None):
        """Render the map at w2c. max_dist (meters) culls Gaussians farther
        than that from the camera center — the reference's
        `render_indistance` 60 m loop-verification render
        (gaussian_base.py:238-332): at km scale the whole-map render is
        slow and far geometry pollutes the photometric check."""
        cam = camera_from_intrinsic(jnp.asarray(w2c, jnp.float32), intr)
        s = self.state
        alive = s.alive
        if max_dist is not None:
            c2w = jnp.linalg.inv(jnp.asarray(w2c, jnp.float32))
            d2 = jnp.sum((s.xyz - c2w[:3, 3]) ** 2, axis=-1)
            alive = alive & (d2 < float(max_dist) ** 2)
        return render(s.xyz, s.log_scale, s.quat, s.logit_opacity, s.rgb,
                      cam, alive=alive, **dict(self.render_kwargs))

    @property
    def last_metrics(self):
        """Latest train-loop metrics — ONE device_get, on demand only."""
        if self._metrics_dev is None:
            return {}
        return {k: float(v) for k, v in
                jax.device_get(self._metrics_dev).items()}

    @property
    def n_alive(self):
        return int(self.state.n_alive())

    # ---- checkpointing --------------------------------------------------
    def save_ply(self, path, mode="2dgs"):
        s = jax.device_get(self.state)
        m = np.asarray(s.alive)
        ply_io.save_ply(path, np.asarray(s.xyz)[m], np.asarray(s.rgb)[m],
                        np.asarray(s.log_scale)[m], np.asarray(s.quat)[m],
                        np.asarray(s.logit_opacity)[m], mode=mode)

    def save_ckpt(self, path):
        s = jax.device_get(self.state)
        np.savez_compressed(
            path, history=np.asarray(self.history),
            time_idx=self.time_idx,
            **{f: np.asarray(getattr(s, f)) for f in
               ("xyz", "rgb", "log_scale", "quat", "logit_opacity", "alive",
                "stable", "local_scores", "global_scores", "globalkf_id",
                "globalkf_max_scores")})

    def load_ckpt(self, path):
        z = np.load(path)
        self.state = self.state.replace(
            **{f: jnp.asarray(z[f]) for f in
               ("xyz", "rgb", "log_scale", "quat", "logit_opacity", "alive",
                "stable", "local_scores", "global_scores", "globalkf_id",
                "globalkf_max_scores")})
        self.opt = adam_init(self.state)
        self.history = z["history"].tolist()
        self.time_idx = int(z["time_idx"])
        self.initialized = True
