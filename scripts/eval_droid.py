"""Evaluate the self-trained DROID weights (scripts/train_droid.py)
against random init on the geometric synthetic3d stream: tracking-only
ATE + motion-filter/keyframe-gating behavior.

This is the VERDICT r2 next-step 2 "done" check: ATE on a synthetic
sequence with the trained net must beat identity-flow (random init),
and the motion filter must produce a real keyframe decision with
filter_thresh > 0 (reference operating point: frontend/dbaf.py uses
filter_thresh 2.4 with the official droid.pth).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/eval_droid.py [--weights vings_mono_tpu/weights/droid_selftrained.npz]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile


def tracking_ate(cfg_overrides, save_dir, max_frames):
    from vings_mono_tpu.runners.run_tracking import run as run_tracking
    from vings_mono_tpu.runners.evaluate import eval_trajectory
    from vings_mono_tpu.datasets.base import get_dataset
    from scripts.report_parity import default_cfg

    cfg = default_cfg(cfg_overrides)
    tracker = run_tracking(cfg, save_dir, max_frames=max_frames)
    ate = eval_trajectory(save_dir, get_dataset(cfg))
    n_kf = int(tracker.video.counter) + int(tracker.video.count_save)
    return (None if ate is None else float(ate)), n_kf


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights",
                   default="vings_mono_tpu/weights/droid_selftrained.npz")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--filter-thresh", type=float, default=1.75)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    work = tempfile.mkdtemp(prefix="eval_droid_")
    results = {}
    runs = [
        # identical gating (all frames keyframed) => ATE isolates flow quality
        ("random", {"frontend": {"filter_thresh": -1.0}}),
        ("trained", {"frontend": {"filter_thresh": -1.0,
                                  "weight": args.weights}}),
        # real gating: the motion filter decides keyframes from learned flow
        ("trained_gated", {"frontend": {"filter_thresh": args.filter_thresh,
                                        "weight": args.weights}}),
    ]
    for name, ov in runs:
        d = os.path.join(work, name)
        os.makedirs(os.path.join(d, "ply"), exist_ok=True)
        ate, n_kf = tracking_ate(ov, d, args.frames)
        results[name] = {"ate_rmse_m": ate, "n_keyframes": n_kf}
        print(f"{name}: ATE {ate} n_kf {n_kf}", file=sys.stderr)

    results["frames"] = args.frames
    results["trained_beats_random"] = (
        results["trained"]["ate_rmse_m"] is not None
        and results["random"]["ate_rmse_m"] is not None
        and results["trained"]["ate_rmse_m"]
        < results["random"]["ate_rmse_m"])
    results["gating_selective"] = (
        0 < results["trained_gated"]["n_keyframes"]
        < results["trained"]["n_keyframes"])
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    return results


if __name__ == "__main__":
    main()
