"""Flagship single-process pipeline (reference scripts/run.py):
dataset -> tracker -> middleware -> mapper [-> looper -> storage] -> outputs.

Usage: python -m vings_mono_tpu.runners.run <config.yaml> [--prefix NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build(cfg):
    from ..datasets.base import get_dataset
    from ..tracker.tracker import Tracker
    from ..mapper.mapper import GaussianMapper

    dataset = get_dataset(cfg)
    H, W = (int(cfg["frontend"]["image_size"][0]),
            int(cfg["frontend"]["image_size"][1]))
    cfg["frontend"]["c2i"] = getattr(dataset, "c2i", np.eye(4))
    weights = cfg["frontend"].get("weight")
    tracker = Tracker(cfg, H, W, weights_path=weights)
    mapper = GaussianMapper(cfg)

    looper = None
    if cfg.get("use_loop"):
        from ..loop.loop_model import LoopModel
        looper = LoopModel(cfg)
    storage = None
    if cfg.get("use_storage_manager"):
        from ..storage.manager import StorageManager
        storage = StorageManager(cfg)
    metric = None
    if cfg.get("use_metric"):
        from ..models.metric_depth import MetricDepth
        metric = MetricDepth(cfg)
    dynamic = None
    if cfg.get("use_dynamic"):
        from ..dynamic.dynamic_model import DynamicModel
        dynamic = DynamicModel(cfg)
    return dataset, tracker, mapper, looper, storage, metric, dynamic


def run(cfg, save_dir, max_frames=None, on_frame=None, resume=None,
        checkpoint_every=None, start_frame=0):
    from ..middleware import judge_and_package
    from ..utils.trajectory import save_trajectory
    from ..utils.profiling import StageTimer

    dataset, tracker, mapper, looper, storage, metric, dynamic = build(cfg)
    if cfg.get("mode") == "vio":
        from ..tracker.vio import InertialFusion
        imu = dataset.preload_imu()
        # optional GNSS/wheel-odometry streams [(M,4) t,xyz] when the
        # dataset provides them (the reference wires these by hand,
        # dbaf_frontend.py:43)
        gnss = getattr(dataset, "preload_gnss", lambda: None)()
        odo = getattr(dataset, "preload_odo", lambda: None)()
        tracker.frontend.attach_inertial(InertialFusion(
            tracker.video, cfg, imu, np.asarray(cfg["frontend"]["c2i"]),
            all_gnss=gnss, all_odo=odo))

    if resume:
        from ..utils.checkpoint import load_session
        load_session(resume, tracker, mapper,
                     tracker.frontend.inertial)
        start_frame = max(start_frame, len(tracker.video.tstamps_host)
                          + tracker.video.count_save)

    timer = StageTimer()
    n = len(dataset) if max_frames is None else min(len(dataset),
                                                    max_frames)
    kf_count = 0
    for idx in range(start_frame, n):
        if checkpoint_every and idx and idx % checkpoint_every == 0:
            from ..utils.checkpoint import save_session
            save_session(os.path.join(save_dir, "session"), tracker,
                         mapper, tracker.frontend.inertial)
        pkt = dataset[idx]
        if metric is not None:
            with timer("metric"):
                pkt["depth"] = metric.predict(pkt["rgb"], pkt["intrinsic"])
        with timer("track"):
            tracker.track(pkt)
        with timer("package"):
            viz_out = judge_and_package(tracker, cfg)
        if viz_out is not None:
            if dynamic is not None:
                with timer("dynamic"):
                    viz_out = dynamic.apply_to_viz_out(viz_out, mapper)
            with timer("map"):
                mapper.run(viz_out)
            if cfg.get("use_refine") and \
                    getattr(mapper, "refined_poses", None) is not None:
                from ..middleware import retrieve_to_tracker
                retrieve_to_tracker(viz_out, mapper.refined_poses, tracker)
            kf_count += 1
            if looper is not None and kf_count > \
                    cfg["looper"]["start_after"] and \
                    kf_count % cfg["looper"]["every"] == 0:
                with timer("loop"):
                    looper.run(mapper, tracker, viz_out, idx)
        if storage is not None and idx % cfg["storage_manager"]["every"] \
                == cfg["storage_manager"]["every"] - 1:
            with timer("storage"):
                storage.run(tracker, mapper, viz_out)
        if cfg.get("use_vis") and viz_out is not None:
            with timer("vis"):
                _save_vis(cfg, save_dir, tracker, mapper, storage, viz_out,
                          kf_count)
        if on_frame is not None:
            on_frame(idx, tracker, mapper, viz_out)

    if cfg.get("use_global_ba"):
        # terminate pass: full-trajectory BA removes the online drift the
        # sliding window could not (ref visual_frontend.py:1460-1542)
        from ..tracker.backend import GlobalBA
        loop_pairs = [(t["cand_gid"], t["cur_gid"])
                      for t in getattr(looper, "loop_traces", [])
                      if "rejected" not in t] if looper is not None else []
        with timer("global_ba"):
            stats = GlobalBA(tracker, cfg, extra_edges=loop_pairs).run()
        print(f"global BA: {stats}")
    save_trajectory(tracker, save_dir)
    mapper.save_ply(os.path.join(save_dir, "ply", "final_2dgs.ply"))
    return tracker, mapper, timer


def _save_vis(cfg, save_dir, tracker, mapper, storage, viz_out, kf_count):
    import numpy as np
    from ..utils.vis import save_rgbdnua, vis_map, vis_bev
    from ..utils.trajectory import tracker_c2ws
    kf = -1
    w2c = np.linalg.inv(np.asarray(viz_out["poses"][kf]))
    rets = mapper.render_at(w2c, viz_out["intrinsic"])
    gt_rgb = np.moveaxis(np.asarray(viz_out["images"][kf]), -1, 0)
    gt_depth = np.moveaxis(np.asarray(viz_out["depths"][kf]), -1, 0)
    gt_cov = np.moveaxis(np.asarray(viz_out["depths_cov"][kf]), -1, 0)
    ts = float(np.asarray(viz_out["viz_out_idx_to_f_idx"])[kf])
    save_rgbdnua(save_dir, ts, rets, gt_rgb, gt_depth, gt_cov)
    if (kf_count - 1) % 10 == 0:
        vcfg = cfg.get("vis", {}) or {}
        map_size = tuple(vcfg.get("map_size", (480, 640)))
        bev_size = tuple(vcfg.get("bev_size", (320, 320)))
        _, c2ws = tracker_c2ws(tracker)
        vis_map(mapper, np.asarray(c2ws),
                os.path.join(save_dir, "map", f"map_{kf_count:05d}.png"),
                size=map_size, storage=storage)
        vis_bev(mapper, np.asarray(viz_out["poses"][kf]),
                os.path.join(save_dir, "bev", f"bev_{kf_count:05d}.png"),
                size=bev_size)


def main(argv=None):
    from ..utils.config import load_config, make_run_dir
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--prefix", default="")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--resume", default=None,
                   help="session checkpoint dir to resume from")
    p.add_argument("--checkpoint-every", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    save_dir = make_run_dir(cfg, args.prefix)
    import shutil
    shutil.copy(args.config, os.path.join(save_dir, "config.yaml"))
    t0 = time.time()
    tracker, mapper, timer = run(cfg, save_dir, args.max_frames,
                                 resume=args.resume,
                                 checkpoint_every=args.checkpoint_every)
    print(f"done in {time.time() - t0:.1f}s -> {save_dir}")
    print(timer.report())


if __name__ == "__main__":
    main()
