"""Full-session checkpoint/resume — beyond the reference's debug-only
snapshots (dbaf.py:73-121, gaussian_base.py:492-525): one call captures
tracker video buffers + save buffers, the covisible graph (correlation
pyramids are NOT stored — they are deterministically rebuilt from the saved
feature maps), frontend counters, the inertial state, and the mapper, so a
run can resume mid-sequence."""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp


def save_session(path, tracker, mapper, inertial=None):
    os.makedirs(path, exist_ok=True)
    video = tracker.video
    bufs = jax.device_get(video.bufs)
    np.savez_compressed(
        os.path.join(path, "video.npz"),
        **{f: np.asarray(getattr(bufs, f)) for f in
           ("tstamp", "images", "poses", "disps", "disps_sens", "disps_up",
            "depths_cov", "depths_cov_up", "intrinsics", "fmaps", "nets",
            "inps", "damping")})
    np.savez_compressed(
        os.path.join(path, "save_buffers.npz"),
        tstamp=video.tstamp_save[:video.count_save],
        images=video.images_save[:video.count_save],
        poses=video.poses_save[:video.count_save],
        disps=video.disps_save[:video.count_save],
        disps_up=video.disps_up_save[:video.count_save],
        depths_cov=video.depths_cov_save[:video.count_save],
        depths_cov_up=video.depths_cov_up_save[:video.count_save])

    g = tracker.graph
    edges = jax.device_get(g.edges)
    np.savez_compressed(
        os.path.join(path, "graph.npz"),
        net=np.asarray(edges.net), inp=np.asarray(edges.inp),
        target=np.asarray(edges.target), weight=np.asarray(edges.weight),
        inac_target=np.asarray(jax.device_get(g.inac.target)),
        inac_weight=np.asarray(jax.device_get(g.inac.weight)))

    host = {
        "counter": video.counter, "count_save": video.count_save,
        "tstamps_host": video.tstamps_host,
        "imu_enabled": video.imu_enabled,
        "visual_only_init": video.visual_only_init,
        "graph": {k: getattr(g, k) for k in
                  ("ii", "jj", "age", "slot", "free_slots", "ii_inac",
                   "jj_inac", "slot_inac", "free_inac", "ii_bad", "jj_bad")},
        "frontend": {k: getattr(tracker.frontend, k) for k in
                     ("t0", "t1", "is_initialized", "count",
                      "new_frame_added")},
        "mapper": {"history": mapper.history, "time_idx": mapper.time_idx,
                   "initialized": mapper.initialized},
        "local_to_global_bias": tracker.local_to_global_bias,
    }
    if inertial is not None:
        host["inertial"] = {
            "states": [(s.R, s.p, s.v, s.b) for s in inertial.states],
            "preints": [(p.bg, p.ba, p.meas) for p in inertial.preints],
            "imu_enabled": inertial.imu_enabled,
            "vi_init_t1": inertial.vi_init_t1,
            "last_t0": inertial.last_t0, "last_t1": inertial.last_t1,
            # marginal/anchor priors + geo-referencing state: without these
            # a resumed VIO session is unanchored (vi_init_t1 is restored so
            # maybe_initialize/set_prior never re-run) and a geo-referenced
            # run would re-derive a fresh ECEF reference
            "marg_prior": inertial.marg_prior,
            "prior_factors": inertial.prior_factors,
            "gnss_init_t1": inertial.gnss_init_t1,
            "ten0": inertial.ten0,
            "vi_init_time": inertial.vi_init_time,
            "cur_ii": inertial.cur_ii, "cur_jj": inertial.cur_jj,
            "cur_valid": inertial.cur_valid,
        }
    with open(os.path.join(path, "host.pkl"), "wb") as f:
        pickle.dump(host, f)

    mapper.save_ckpt(os.path.join(path, "mapper.npz"))


def load_session(path, tracker, mapper, inertial=None):
    video = tracker.video
    z = np.load(os.path.join(path, "video.npz"))
    video.bufs = video.bufs.replace(
        **{f: jnp.asarray(z[f]) for f in z.files})
    s = np.load(os.path.join(path, "save_buffers.npz"))
    n = len(s["tstamp"])
    video.count_save = n
    video.tstamp_save[:n] = s["tstamp"]
    video.images_save[:n] = s["images"]
    video.poses_save[:n] = s["poses"]
    video.disps_save[:n] = s["disps"]
    video.disps_up_save[:n] = s["disps_up"]
    video.depths_cov_save[:n] = s["depths_cov"]
    video.depths_cov_up_save[:n] = s["depths_cov_up"]

    with open(os.path.join(path, "host.pkl"), "rb") as f:
        host = pickle.load(f)
    video.counter = host["counter"]
    video.tstamps_host = host["tstamps_host"]
    video.imu_enabled = host["imu_enabled"]
    video.visual_only_init = host["visual_only_init"]
    tracker.local_to_global_bias = host["local_to_global_bias"]
    for k, v in host["frontend"].items():
        setattr(tracker.frontend, k, v)

    g = tracker.graph
    for k, v in host["graph"].items():
        setattr(g, k, v)
    gz = np.load(os.path.join(path, "graph.npz"))
    g.edges = g.edges.replace(net=jnp.asarray(gz["net"]),
                              inp=jnp.asarray(gz["inp"]),
                              target=jnp.asarray(gz["target"]),
                              weight=jnp.asarray(gz["weight"]))
    g.inac = g.inac.replace(target=jnp.asarray(gz["inac_target"]),
                            weight=jnp.asarray(gz["inac_weight"]))
    # rebuild correlation pyramids deterministically from saved fmaps
    if len(g.ii):
        from .. import tracker as _t  # noqa: F401 (package import)
        from ..tracker.graph import _add_edges_kernel
        B = g.edge_batch
        ii, jj, slots = g.ii, g.jj, g.slot
        for s0 in range(0, len(ii), B):
            nn_ = min(B, len(ii) - s0)
            ps = np.zeros(B, np.int64)
            pi = np.zeros(B, np.int64)
            pj = np.zeros(B, np.int64)
            pv = np.zeros(B, bool)
            ps[:nn_] = slots[s0:s0 + nn_]
            pi[:nn_] = ii[s0:s0 + nn_]
            pj[:nn_] = jj[s0:s0 + nn_]
            pv[:nn_] = True
            g.edges = _add_edges_kernel(
                g.edges, video.bufs, jnp.asarray(ps, jnp.int32),
                jnp.asarray(pi, jnp.int32), jnp.asarray(pj, jnp.int32),
                jnp.asarray(pv))
        # the kernel also reset net/target/weight; restore the saved ones
        g.edges = g.edges.replace(net=jnp.asarray(gz["net"]),
                                  inp=jnp.asarray(gz["inp"]),
                                  target=jnp.asarray(gz["target"]),
                                  weight=jnp.asarray(gz["weight"]))

    # motion-filter state = features of the last keyframe (same buffers)
    c = video.counter - 1
    if c >= 0:
        tracker.filter.fmap = video.bufs.fmaps[c][None]
        tracker.filter.net = video.bufs.nets[c][None]
        tracker.filter.inp = video.bufs.inps[c][None]

    mapper.load_ckpt(os.path.join(path, "mapper.npz"))
    mapper.history = host["mapper"]["history"]
    mapper.time_idx = host["mapper"]["time_idx"]
    mapper.initialized = host["mapper"]["initialized"]

    if inertial is not None and "inertial" in host:
        from ..tracker import factor_graph as fg
        from ..tracker.imu import Preintegration
        hi = host["inertial"]
        inertial.states = [fg.FrameState(R, p, v, b)
                           for R, p, v, b in hi["states"]]
        inertial.preints = []
        for bg, ba, meas in hi["preints"]:
            pre = Preintegration(inertial.params, bg=bg, ba=ba)
            for acc, gyro, dt in meas:
                pre.integrate(acc, gyro, dt)
            inertial.preints.append(pre)
        inertial.imu_enabled = hi["imu_enabled"]
        inertial.vi_init_t1 = hi["vi_init_t1"]
        inertial.last_t0 = hi["last_t0"]
        inertial.last_t1 = hi["last_t1"]
        inertial.gnss_meas = [None] * len(inertial.states)
        inertial.odo_meas = [None] * len(inertial.states)
        if "marg_prior" in hi:
            inertial.marg_prior = hi["marg_prior"]
            inertial.prior_factors = hi["prior_factors"]
            inertial.gnss_init_t1 = hi["gnss_init_t1"]
            inertial.ten0 = hi["ten0"]
            inertial.vi_init_time = hi["vi_init_time"]
            inertial.cur_ii = hi["cur_ii"]
            inertial.cur_jj = hi["cur_jj"]
            inertial.cur_valid = hi["cur_valid"]
