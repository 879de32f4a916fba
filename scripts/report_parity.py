"""Parity-report harness (VERDICT r2 next-step 7): one command that runs
the FULL pipeline on a dataset and emits {ate, psnr, fps, stage_times}
as JSON into the run dir — the artifact that becomes the Hotel/KITTI-360
parity report the day real data exists (reference ground-truth surface:
datasets/kitti_sync.py:54-62; our GT hook: dataset.load_gt_dict()).

Default config runs the geometric synthetic3d sequence (analytic GT), so
the report is meaningful with no dataset files in the container.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/report_parity.py [config.yaml] [--out DIR]
           [--max-frames N]
"""

import argparse
import json
import os
import sys
import time


def report(cfg, save_dir, max_frames=None):
    from vings_mono_tpu.runners.run import run as run_pipeline
    from vings_mono_tpu.runners.evaluate import (eval_trajectory,
                                                 eval_psnr)
    from vings_mono_tpu.datasets.base import get_dataset

    os.makedirs(os.path.join(save_dir, "ply"), exist_ok=True)
    t0 = time.perf_counter()
    tracker, mapper, timer = run_pipeline(cfg, save_dir,
                                          max_frames=max_frames)
    wall = time.perf_counter() - t0

    dataset = get_dataset(cfg)
    n_frames = len(dataset) if max_frames is None else min(
        len(dataset), max_frames)
    ate = eval_trajectory(save_dir, dataset)
    psnr = eval_psnr(mapper, tracker, n_eval=8)

    out = {
        "dataset": cfg["dataset"]["module"],
        "n_frames": n_frames,
        "ate_rmse_m": None if ate is None else round(float(ate), 5),
        "psnr_db": None if psnr is None else round(float(psnr), 3),
        "fps": round(n_frames / wall, 4),
        "wall_s": round(wall, 2),
        "stage_times_s": {k: round(v, 2)
                          for k, v in sorted(timer.totals.items())},
        "n_keyframes": int(tracker.video.counter) +
        int(tracker.video.count_save),
        "n_gaussians": int(mapper.n_alive),
    }
    path = os.path.join(save_dir, "parity_report.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    return out, path


def default_cfg(overrides=None):
    from vings_mono_tpu.utils.config import load_config
    base = {
        "mode": "vo",
        "dataset": {"module": "synthetic3d", "n_frames": 40},
        "frontend": {
            "image_size": [120, 160], "buffer": 48, "warm_up": 8,
            "filter_thresh": -1.0, "keyframe_thresh": 0.0,
            "frontend_thresh": 1e9, "frontend_window": 12,
            "frontend_radius": 2, "frontend_nms": 1, "max_factors": 48,
            "edge_capacity": 64, "inactive_capacity": 128,
            "ba_window": 16, "iters1": 2, "iters2": 1,
            "active_window": 12, "max_age": 12, "rollup_at": 44,
            "rollup_n": 16, "save_buffer": 256,
        },
        "training_args": {"iters": 30, "num_keyframe": 5},
        "mapper": {"capacity": 1 << 16, "pair_capacity": 1 << 17,
                   "chunk": 128, "side": 3, "visible_capacity": 1 << 15,
                   "kf_capacity": 8, "points_per_frame": 4000,
                   "points_first_frame": 8000},
        "middleware": {"max_depth": 100.0, "cov_times": 1e9},
    }
    if overrides:
        for k, v in overrides.items():
            if isinstance(v, dict):
                base.setdefault(k, {}).update(v)
            else:
                base[k] = v
    return load_config(overrides=base)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--out", default="output/parity")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)
    if args.config:
        from vings_mono_tpu.utils.config import load_config
        cfg = load_config(args.config)
    else:
        from vings_mono_tpu.utils.profiling import enable_compile_cache
        enable_compile_cache()
        cfg = default_cfg()
    out, path = report(cfg, args.out, args.max_frames)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
