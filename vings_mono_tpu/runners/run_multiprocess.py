"""Pipelined tracker || mapper — rebuild of the reference's 2-process
spawn pipeline (scripts/run_multiprocess.py: tracking proc -> mp.Queue
(qsize<5 backpressure) -> mapping proc).

TPU adaptation: one chip serves both stages, and JAX device state does not
fork, so the pipeline uses two host THREADS sharing the device — the tracker
thread runs ahead while the mapper thread trains on the previous keyframe
window (compute overlaps at the XLA-program level). The queue contract and
backpressure are identical to the reference; on a multi-chip machine the
stages can be pinned to different devices via cfg['device'].
"""

from __future__ import annotations

import argparse
import os
import queue
import threading

import numpy as np


def tracking_worker(cfg, q, save_dir, max_frames=None):
    from ..datasets.base import get_dataset
    from ..tracker.tracker import Tracker
    from ..middleware import judge_and_package
    from ..utils.trajectory import save_trajectory

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

    n = len(dataset) if max_frames is None else min(len(dataset),
                                                    max_frames)
    for idx in range(n):
        tracker.track(dataset[idx])
        viz_out = judge_and_package(tracker, cfg)
        if viz_out is None:
            continue
        # backpressure: drop the window if the mapper lags
        # (run_multiprocess.py:40)
        if q.qsize() < 5:
            host = {k: (np.asarray(v) if not isinstance(v, (dict, float))
                        else v) for k, v in viz_out.items()}
            q.put(host)
    q.put(None)
    save_trajectory(tracker, save_dir)
    return tracker


def mapping_worker(cfg, q, save_dir, storage=None, fake_tracker=None):
    from ..mapper.mapper import GaussianMapper
    mapper = GaussianMapper(cfg)
    while True:
        viz_out = q.get()
        if viz_out is None:
            break
        mapper.run(viz_out)
        if storage is not None and fake_tracker is not None:
            storage.run(fake_tracker, mapper, viz_out)
    mapper.save_ply(os.path.join(save_dir, "ply", "final_2dgs.ply"))
    return mapper


def run(cfg, save_dir, max_frames=None):
    q = queue.Queue(maxsize=8)
    results = {}

    def _track():
        results["tracker"] = tracking_worker(cfg, q, save_dir, max_frames)

    def _map():
        results["mapper"] = mapping_worker(cfg, q, save_dir)

    t1 = threading.Thread(target=_track, daemon=True)
    t2 = threading.Thread(target=_map, daemon=True)
    t1.start()
    t2.start()
    t1.join()
    t2.join()
    return results["tracker"], results["mapper"]


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
