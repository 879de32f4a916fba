"""Live mobile pipeline — rebuild of scripts/run_multiprocess_mobile.py:
websocket server <-> tracker <-> mapper over three queues; rendered map
frames stream back to the phone."""

from __future__ import annotations

import argparse
import queue
import threading

import numpy as np


def tracking_worker(cfg, s2t, t2m):
    from ..tracker.tracker import Tracker
    from ..middleware import judge_and_package
    H, W = (int(cfg["frontend"]["image_size"][0]),
            int(cfg["frontend"]["image_size"][1]))
    tracker = Tracker(cfg, H, W,
                      weights_path=cfg["frontend"].get("weight"))
    intr = np.asarray([cfg["intrinsic"]["fv"], cfg["intrinsic"]["fu"],
                       cfg["intrinsic"]["cv"], cfg["intrinsic"]["cu"]],
                      np.float32)
    while True:
        pkt = s2t.get()
        if pkt is None:
            t2m.put(None)
            break
        rgb = pkt["rgb"]
        if rgb.shape[:2] != (H, W):
            try:
                import cv2
                rgb = cv2.resize(rgb, (W, H))
            except Exception:
                continue
        tracker.track({"timestamp": pkt["timestamp"], "rgb": rgb,
                       "intrinsic": intr})
        viz = judge_and_package(tracker, cfg)
        if viz is not None and t2m.qsize() < 5:
            t2m.put({k: (np.asarray(v) if not isinstance(v, (dict, float))
                         else v) for k, v in viz.items()})


def mapping_worker(cfg, t2m, m2s):
    from ..mapper.mapper import GaussianMapper
    mapper = GaussianMapper(cfg)
    while True:
        viz = t2m.get()
        if viz is None:
            break
        mapper.run(viz)
        # stream the newest keyframe's render back to the phone
        w2c = np.linalg.inv(np.asarray(viz["poses"][-1]))
        rets = mapper.render_at(w2c, viz["intrinsic"])
        m2s.put(np.moveaxis(np.asarray(rets["rgb"]), 0, -1))


def main(argv=None):
    from ..utils.config import load_config, make_run_dir
    from ..server.server import WebsocketServer
    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    save_dir = make_run_dir(cfg, "mobile_")

    s2t = queue.Queue(maxsize=32)
    t2m = queue.Queue(maxsize=8)
    m2s = queue.Queue(maxsize=4)
    threading.Thread(target=tracking_worker, args=(cfg, s2t, t2m),
                     daemon=True).start()
    threading.Thread(target=mapping_worker, args=(cfg, t2m, m2s),
                     daemon=True).start()
    WebsocketServer(cfg, s2t, m2s, save_dir).run()


if __name__ == "__main__":
    main()
