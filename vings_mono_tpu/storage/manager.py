"""HBM <-> host paging of the Gaussian map by keyframe distance — rebuild of
StorageManager (/root/reference/scripts/storage/storage_manage.py): keyframes
farther than `distance_threshold` from the current camera have their
Gaussians evicted to host memory; returning keyframes page them back in.

TPU adaptation: the mapper's arrays are capacity-capped with an alive mask,
so eviction = device_get rows + kill (slots recycle), and page-in = scatter
into dead slots with fresh Adam moments. This is what keeps km-scale scenes
inside one chip's HBM (SURVEY §2.6).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mapper.state import write_rows, kill_rows
from ..ops import lie

FIELDS = ("xyz", "rgb", "log_scale", "quat", "logit_opacity",
          "stable", "local_scores", "global_scores", "globalkf_id",
          "globalkf_max_scores")


class StorageManager:
    def __init__(self, cfg):
        self.cfg = cfg
        self.threshold = float(cfg["storage_manager"]["distance_threshold"])
        self.host = {f: None for f in FIELDS}
        self.n_host = 0
        # 0 = host, 1 = device; grows with the global keyframe count
        self.place = np.zeros(0, np.float32)
        # cumulative paging stats (rows moved / events) for observability
        self.pages_out = 0
        self.pages_in = 0
        self.evict_events = 0
        self.pagein_events = 0

    def _ensure_host(self, like):
        if self.host["xyz"] is None:
            for f in FIELDS:
                arr = np.asarray(like[f])
                self.host[f] = np.zeros((0,) + arr.shape[1:], arr.dtype)

    # ------------------------------------------------------------------
    def run(self, tracker, mapper, viz_out):
        if viz_out is None or not mapper.initialized:
            return
        last_gid = int(np.asarray(viz_out["global_kf_id"])[-1])
        if last_gid <= 0:
            return
        # distances of all historical keyframes to the current camera
        w2c_tq = jnp.asarray(tracker.video.poses_save[:last_gid],
                             jnp.float32)
        c2ws = np.array(np.asarray(lie.se3_matrix(lie.se3_inv(w2c_tq))))
        # live-window keyframes beyond the save buffer
        live = tracker.video.c2w_matrices()
        n_live = last_gid - tracker.video.count_save
        if n_live > 0:
            c2ws[tracker.video.count_save:last_gid] = live[:n_live][
                :last_gid - tracker.video.count_save]
        cur_c2w = np.asarray(viz_out["poses"][-1])
        rel = np.linalg.inv(cur_c2w)[None] @ c2ws
        dist = np.linalg.norm(rel[:, :3, 3], axis=-1)

        grow = last_gid - len(self.place)
        if grow > 0:
            self.place = np.concatenate([self.place,
                                         np.ones(grow, np.float32)])

        self.cpu2gpu(mapper, dist)
        self.gpu2cpu(mapper, dist)

    # ------------------------------------------------------------------
    def gpu2cpu(self, mapper, dist):
        far_kf = np.where((self.place[:len(dist)] == 1)
                          & (dist > self.threshold))[0]
        if len(far_kf) == 0:
            return
        state = jax.device_get(mapper.state)
        gid = np.asarray(state.globalkf_id)
        alive = np.asarray(state.alive)
        m = alive & np.isin(gid, far_kf)
        if m.sum() == 0:
            self.place[far_kf] = 0
            return
        self._ensure_host({f: getattr(state, f) for f in FIELDS})
        for f in FIELDS:
            rows = np.asarray(getattr(state, f))[m]
            self.host[f] = np.concatenate([self.host[f], rows])
        self.n_host = len(self.host["xyz"])
        mapper.state = kill_rows(mapper.state, jnp.asarray(m))
        self.place[far_kf] = 0
        self.pages_out += int(m.sum())
        self.evict_events += 1

    def cpu2gpu(self, mapper, dist):
        near_kf = np.where((self.place[:len(dist)] == 0)
                           & (dist < self.threshold))[0]
        if len(near_kf) == 0 or self.n_host == 0:
            return
        m = np.isin(self.host["globalkf_id"], near_kf)
        n = int(m.sum())
        if n == 0:
            self.place[near_kf] = 1
            return
        from ..mapper.densify import dead_slots
        slots, ok = dead_slots(mapper.state, n)
        valid = np.asarray(ok)
        params = {f: jnp.asarray(self.host[f][m]) for f in
                  ("xyz", "rgb", "log_scale", "quat", "logit_opacity")}
        gids = jnp.asarray(self.host["globalkf_id"][m])
        mapper.state, mapper.opt = write_rows(
            mapper.state, mapper.opt, slots, jnp.asarray(valid), params,
            gids)
        # restore lifecycle state for the rows that fit
        idx = jnp.where(jnp.asarray(valid), slots,
                        mapper.state.capacity)
        mapper.state = mapper.state.replace(
            stable=mapper.state.stable.at[idx].set(
                jnp.asarray(self.host["stable"][m]), mode="drop"),
            local_scores=mapper.state.local_scores.at[idx].set(
                jnp.asarray(self.host["local_scores"][m]), mode="drop"),
            global_scores=mapper.state.global_scores.at[idx].set(
                jnp.asarray(self.host["global_scores"][m]), mode="drop"),
            globalkf_max_scores=mapper.state.globalkf_max_scores.at[idx]
            .set(jnp.asarray(self.host["globalkf_max_scores"][m]),
                 mode="drop"))
        # drop paged-in rows from the host store (overflow rows stay)
        kept = ~m
        if not valid.all():
            # rows that didn't fit remain on host
            unfit = np.where(m)[0][~valid[:n]]
            kept[unfit] = True
        for f in FIELDS:
            self.host[f] = self.host[f][kept]
        self.n_host = len(self.host["xyz"])
        self.place[near_kf] = 1
        self.pages_in += int(np.asarray(valid[:n]).sum())
        self.pagein_events += 1
        # paged-in rows exist in no cached binning row — they would
        # silently not render until the round-robin cache cycles past them
        mapper.invalidate_binning()
