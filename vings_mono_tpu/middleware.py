"""Tracker -> mapper data contract: `judge_and_package`
(/root/reference/scripts/vings_utils/middleware_utils.py:199-250, v3).

Produces the `viz_out` dict (SURVEY §1): images (K,H,W,3 in [0,1]), depths,
depths_cov (K,H,W,1), poses (K,4,4 c2w), viz_out_idx_to_f_idx (timestamps),
intrinsic dict, pixel_mask, global_kf_id — padded to a FIXED window
capacity (cfg mapper.kf_capacity) with `n_valid`, so the whole packaging is
one compiled program (variable window sizes would recompile every frame).

One deliberate divergence from the reference: it selects "valid local
keyframes" by indexing the *edge array by position* t0..t1
(middleware_utils.py:216) — a quirk approximating "frames >= t0 that source
an edge, minus the newest"; we implement that intent directly.

Variant coverage:
  * v3 (default) — the covisible-window packaging below;
  * v0_kitti360 (middleware.variant) — save-buffer + sky-crop packaging;
  * nerfslam (middleware_utils.py:256-301 + the frontend's dirty-KF
    marking, visual_frontend.py:1544-1616) — same gating math as v3
    (depth > max_depth OR cov > cov_times*median, rgb zeroed with depth),
    but a different SELECTION: every keyframe the BA re-optimized since
    the last packaging (`viz_idx[kf0:kf_idx+1] = True`), INCLUDING the
    newest frame — the mapper refreshes poses/depths of the whole dirty
    window instead of receiving only settled covisible frames.
    mode=vo_nerfslam (or middleware.variant=nerfslam) routes here.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ops import lie


@functools.partial(jax.jit, static_argnames=("k_cap", "max_depth",
                                             "cov_times"))
def _package_kernel(bufs, sel, *, k_cap, max_depth, cov_times):
    rgbs = bufs.images[sel]                              # (K, H, W, 3)
    depths = (1.0 / (bufs.disps_up[sel] + 1e-6))[..., None]
    covs = bufs.depths_cov_up[sel][..., None]
    K = k_cap
    cov_med = jnp.median(covs.reshape(K, -1), axis=1)[:, None, None, None]
    zero = (depths > max_depth) | (covs > cov_times * cov_med)
    depths = jnp.where(zero, 0.0, depths)
    cov_fill = jnp.max(jnp.where(depths > 0, covs, 0.0))
    covs = jnp.where(depths == 0, cov_fill, covs)
    rgbs = jnp.where(depths == 0, 0.0, rgbs)
    c2ws = lie.se3_matrix(lie.se3_inv(bufs.poses[sel]))
    return rgbs, depths, covs, c2ws


def judge_and_package_v0_kitti360(tracker, cfg=None):
    """KITTI-360 packaging variant (middleware_utils.py:51-92,
    judge_and_package_v0_kitti360unsync): the mapper trains on the last 8
    *marginalized* keyframes from the host save buffers — their depths are
    final (no longer being optimized) — and the sky band is cropped off:
    only the bottom `new_H` rows are packaged, with cu re-centered.
    new_H = image_size[0] * (intrinsic.new_H / intrinsic.H), rounded to /8.
    """
    cfg = cfg if cfg is not None else tracker.cfg
    video = tracker.video
    if not tracker.frontend.new_frame_added:
        return None
    ns = video.count_save
    k_cap = int(cfg["mapper"]["kf_capacity"])
    lo = max(ns - 8, 0)
    sel = np.arange(lo, ns)
    if len(sel) == 0:
        return None
    K = min(len(sel), k_cap)
    sel = sel[-K:]

    H, W = video.ht, video.wd
    ic = cfg["intrinsic"]
    u_scale = float(ic.get("new_H", ic["H"])) / float(ic["H"])
    new_H = int(u_scale * H) // 8 * 8
    new_cu = new_H / 2.0

    depths = (1.0 / (video.disps_up_save[sel] + 1e-6))[..., None]
    covs = video.depths_cov_up_save[sel][..., None]
    cov_med = np.median(covs.reshape(K, -1), axis=1)[:, None, None, None]
    mw = cfg["middleware"]
    zero = (depths > float(mw["max_depth"])) | \
        (covs > float(mw["cov_times"]) * cov_med)
    depths = np.where(zero, 0.0, depths)
    rgbs = np.where(depths == 0, 0.0, video.images_save[sel])
    c2ws = np.asarray(lie.se3_matrix(lie.se3_inv(
        jnp.asarray(video.poses_save[sel]))))

    intr = np.asarray(jax.device_get(video.bufs.intrinsics[0])) * 8.0
    intrinsic = {"fu": float(intr[1]), "fv": float(intr[0]),
                 "cu": float(new_cu), "cv": float(intr[2]),
                 "H": int(new_H), "W": int(W)}

    def pad(x):
        if x.shape[0] == k_cap:
            return x
        reps = [k_cap - x.shape[0]] + [1] * (x.ndim - 1)
        return np.concatenate([x, np.tile(x[-1:], reps)], axis=0)

    return {
        "images": pad(rgbs[:, -new_H:]),
        "depths": pad(depths[:, -new_H:]),
        "depths_cov": pad(covs[:, -new_H:]),
        "poses": pad(c2ws),
        "viz_out_idx_to_f_idx": video.tstamp_save[sel],
        "intrinsic": intrinsic,
        "pixel_mask": np.ones((k_cap, new_H, W), bool),
        "global_kf_id": pad(np.asarray(sel, np.int64)),
        "valid_localkf_id": sel,
        "n_valid": K,
    }


def judge_and_package_nerfslam(tracker, cfg):
    """Dirty-window packaging (the NeRF-SLAM frontend's get_viz_out,
    visual_frontend.py:1544-1616): the frontend marks every keyframe its
    BA touched as dirty (`viz_idx[kf0:kf_idx+1] = True`); packaging sends
    ALL of them — the full current BA window, newest frame included — so
    the mapper refreshes poses/depths for keyframes that moved, not only
    newly-settled ones. Selection differs from v3; the per-pixel gating
    (middleware_utils.py:256-301) is shared via _package_kernel."""
    fe = tracker.frontend
    graph = tracker.graph
    video = tracker.video
    if not fe.new_frame_added:
        return None
    if len(graph.ii) == 0:
        return None
    t1 = fe.t1
    lo = max(0, int(graph.ii.min()))
    valid_localkf = np.arange(lo, t1)
    if len(valid_localkf) == 0:
        return None

    k_cap = int(cfg["mapper"]["kf_capacity"])
    if len(valid_localkf) > k_cap:
        valid_localkf = valid_localkf[-k_cap:]
    K = len(valid_localkf)
    sel = np.full(k_cap, valid_localkf[-1], np.int64)
    sel[:K] = valid_localkf

    tracker.local_to_global_bias = video.count_save
    global_kf_id = sel + video.count_save
    mw = cfg["middleware"]
    rgbs, depths, covs, c2ws = _package_kernel(
        video.bufs, jnp.asarray(sel, jnp.int32), k_cap=k_cap,
        max_depth=float(mw["max_depth"]), cov_times=float(mw["cov_times"]))
    H, W = video.ht, video.wd
    intrinsic = getattr(tracker, "_intr_cache", None)
    if intrinsic is None:
        intr = np.asarray(jax.device_get(video.bufs.intrinsics[0])) * 8.0
        intrinsic = {"fu": float(intr[1]), "fv": float(intr[0]),
                     "cu": float(intr[3]), "cv": float(intr[2]),
                     "H": int(H), "W": int(W)}
        tracker._intr_cache = intrinsic
    tstamps = np.asarray([video.tstamps_host[i] for i in sel])
    mask = getattr(tracker, "_pixel_mask_cache", None)
    if mask is None or mask.shape != (k_cap, H, W):
        mask = jnp.ones((k_cap, H, W), bool)
        tracker._pixel_mask_cache = mask
    return {
        "images": rgbs,
        "depths": depths,
        "depths_cov": covs,
        "poses": c2ws,
        "viz_out_idx_to_f_idx": tstamps[:K],
        "intrinsic": intrinsic,
        "pixel_mask": mask,
        "global_kf_id": jnp.asarray(global_kf_id, jnp.int32),
        "global_kf_id_host": global_kf_id,
        "valid_localkf_id": valid_localkf,
        "n_valid": K,
    }


def judge_and_package(tracker, cfg=None):
    cfg = cfg if cfg is not None else tracker.cfg
    variant = cfg.get("middleware", {}).get("variant")
    if variant == "v0_kitti360":
        return judge_and_package_v0_kitti360(tracker, cfg)
    if variant == "nerfslam" or cfg.get("mode") == "vo_nerfslam":
        return judge_and_package_nerfslam(tracker, cfg)
    fe = tracker.frontend
    graph = tracker.graph
    video = tracker.video
    if not fe.new_frame_added:
        return None
    if len(graph.ii) == 0:
        return None

    t0 = max(1, int(graph.ii.min()) + 1)
    m = (graph.ii_inac >= t0 - graph.inac_range) & \
        (graph.jj_inac >= t0 - graph.inac_range)
    ii = np.concatenate([graph.ii_inac[m], graph.ii])
    cand = np.unique(ii[ii >= t0])
    if len(cand) > 1:
        valid_localkf = np.sort(cand)[:-1]
    else:
        valid_localkf = cand
    if len(valid_localkf) == 0:
        return None

    k_cap = int(cfg["mapper"]["kf_capacity"])
    if len(valid_localkf) > k_cap:
        valid_localkf = valid_localkf[-k_cap:]
    K = len(valid_localkf)
    sel = np.full(k_cap, valid_localkf[-1], np.int64)
    sel[:K] = valid_localkf

    # our save buffers hold exactly the rolled-out keyframes, so global id =
    # count_save + local index (the reference spills at the edge-window
    # boundary and subtracts min(ii) instead — same mapping, different
    # spill point, depth_video.py:386-424)
    tracker.local_to_global_bias = video.count_save
    global_kf_id = sel + video.count_save

    mw = cfg["middleware"]
    rgbs, depths, covs, c2ws = _package_kernel(
        video.bufs, jnp.asarray(sel, jnp.int32), k_cap=k_cap,
        max_depth=float(mw["max_depth"]), cov_times=float(mw["cov_times"]))

    H, W = video.ht, video.wd
    # intrinsics are constant per run — cache the d2h pull (5-40 ms each)
    intrinsic = getattr(tracker, "_intr_cache", None)
    if intrinsic is None:
        intr = np.asarray(jax.device_get(video.bufs.intrinsics[0])) * 8.0
        # buffer intrinsics are [fx fy cx cy]; the viz_out dict uses the
        # reference's row-major fu/cu naming (fu = fy)
        intrinsic = {"fu": float(intr[1]), "fv": float(intr[0]),
                     "cu": float(intr[3]), "cv": float(intr[2]),
                     "H": int(H), "W": int(W)}
        tracker._intr_cache = intrinsic
    tstamps = np.asarray([video.tstamps_host[i] for i in sel])

    mask = getattr(tracker, "_pixel_mask_cache", None)
    if mask is None or mask.shape != (k_cap, H, W):
        mask = jnp.ones((k_cap, H, W), bool)
        tracker._pixel_mask_cache = mask
    return {
        "images": rgbs,
        "depths": depths,
        "depths_cov": covs,
        "poses": c2ws,
        "viz_out_idx_to_f_idx": tstamps[:K],
        "intrinsic": intrinsic,
        "pixel_mask": mask,
        "global_kf_id": jnp.asarray(global_kf_id, jnp.int32),
        # host copy: _pack_batch needs these on host, and a per-keyframe
        # device_get costs a ~30 ms blocking tunnel round trip
        "global_kf_id_host": global_kf_id,
        "valid_localkf_id": valid_localkf,
        "n_valid": K,
    }


def retrieve_to_tracker(viz_out, new_poses, tracker):
    """Write mapper-refined c2w poses back into the tracker window
    (middleware_utils.py:320-353, use_refine path)."""
    K = viz_out.get("n_valid", len(viz_out["valid_localkf_id"]))
    sel = jnp.asarray(viz_out["valid_localkf_id"][:K], jnp.int32)
    w2c = jnp.linalg.inv(new_poses[:K])
    tq = lie.se3_from_matrix(w2c)
    bufs = tracker.video.bufs
    tracker.video.bufs = bufs.replace(poses=bufs.poses.at[sel].set(tq))
