"""Tracking-only runner (reference scripts/run_tracking.py): saves
droid_c2w/*.txt poses and, in debug mode, per-keyframe viz_out replay dumps
consumed by run_mapping.py."""

from __future__ import annotations

import argparse
import os

import numpy as np


def run(cfg, save_dir, max_frames=None):
    from ..datasets.base import get_dataset
    from ..tracker.tracker import Tracker
    from ..middleware import judge_and_package
    from ..utils.trajectory import save_trajectory
    from ..datasets.replay import save_viz_out

    dataset = get_dataset(cfg)
    H, W = (int(cfg["frontend"]["image_size"][0]),
            int(cfg["frontend"]["image_size"][1]))
    cfg["frontend"]["c2i"] = getattr(dataset, "c2i", np.eye(4))
    tracker = Tracker(cfg, H, W,
                      weights_path=cfg["frontend"].get("weight"))
    if cfg.get("mode") == "vio":
        from ..tracker.vio import InertialFusion
        tracker.frontend.attach_inertial(InertialFusion(
            tracker.video, cfg, dataset.preload_imu(),
            np.asarray(cfg["frontend"]["c2i"])))

    # metric-depth prior (reference run.py:73-75 -> disps_sens)
    metric = None
    if cfg.get("use_metric"):
        from ..models.metric_depth import MetricDepth
        metric = MetricDepth(cfg)

    dump_dir = os.path.join(save_dir, "vizout_dict")
    if cfg.get("debug_mode"):
        os.makedirs(dump_dir, exist_ok=True)

    n = len(dataset) if max_frames is None else min(len(dataset),
                                                    max_frames)
    kf = 0
    for idx in range(n):
        pkt = dataset[idx]
        if metric is not None:
            pkt["depth"] = metric.predict(pkt["rgb"], pkt["intrinsic"])
        tracker.track(pkt)
        viz_out = judge_and_package(tracker, cfg)
        if viz_out is not None and cfg.get("debug_mode"):
            save_viz_out(os.path.join(dump_dir, f"vizout_{kf:06d}.npz"),
                         viz_out)
            kf += 1
    if cfg.get("use_global_ba"):
        from ..tracker.backend import GlobalBA
        stats = GlobalBA(tracker, cfg).run()
        print(f"global BA: {stats}")
    n_kf = save_trajectory(tracker, save_dir)
    print(f"saved {n_kf} keyframe poses -> {save_dir}/droid_c2w")
    return tracker


def main(argv=None):
    from ..utils.config import load_config, make_run_dir
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--prefix", default="")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    save_dir = make_run_dir(cfg, args.prefix)
    run(cfg, save_dir, args.max_frames)


if __name__ == "__main__":
    main()
