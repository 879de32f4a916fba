"""Tracking-only ATE on the long multi-revolution trajectory — the lane
that decides whether the tracker SURVIVES reference-scale sequences (the
loop/storage/GlobalBA stack can only earn its keep on a tracker that
hasn't collapsed; measured r5: 160 frames at iters1=2/iters2=1 blow up to
track_rot_err 90-180 deg and positions 5-30x GT scale).

Sweeps BA-iteration budgets (the reference runs iters1=2-4 + iters2=1-2,
dbaf_frontend.py:63-70).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/eval_track_long.py --frames 160
"""

import argparse
import json
import os
import shutil
import sys
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights",
                   default="vings_mono_tpu/weights/droid_selftrained.npz")
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--revs", type=float, default=1.6)
    p.add_argument("--grid", default="2x1,4x2",
                   help="comma list of iters1xiters2 combos")
    p.add_argument("--cv", type=float, default=1.0,
                   help="constant-velocity seeding strength "
                        "(frontend.motion_model_alpha; 0 = identity seed)")
    p.add_argument("--metric-weights", default=None,
                   help="DPT metric-depth weights -> use_metric lane "
                        "(disps_sens pins the depth gauge)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from vings_mono_tpu.runners.run_tracking import run as run_tracking
    from vings_mono_tpu.runners.evaluate import eval_trajectory
    from vings_mono_tpu.utils.config import load_config
    from vings_mono_tpu.datasets.base import get_dataset

    results = {}
    for combo in args.grid.split(","):
        it1, it2 = (int(x) for x in combo.split("x"))
        cfg = load_config(overrides={
            "mode": "vo",
            **({"use_metric": True,
                "metric": {"backend": "flax",
                           "weights": args.metric_weights,
                           "d_max": 80.0}} if args.metric_weights else {}),
            "dataset": {"module": "synthetic3d", "n_frames": args.frames,
                        "room": 4.0, "revs": args.revs, "tex_seed": 5,
                        "sharpness": 1.0},
            "intrinsic": {"fu": 200.0, "fv": 200.0, "cu": 120.0,
                          "cv": 80.0, "H": 240, "W": 160},
            "frontend": {
                "image_size": [240, 160], "buffer": 64, "warm_up": 8,
                "filter_thresh": -1.0, "keyframe_thresh": 0.0,
                "frontend_thresh": 1e9, "frontend_window": 12,
                "frontend_radius": 2, "frontend_nms": 1,
                "max_factors": 48, "edge_capacity": 64,
                "inactive_capacity": 128, "ba_window": 16,
                "iters1": it1, "iters2": it2, "active_window": 12,
                "max_age": 12, "rollup_at": 48, "rollup_n": 16,
                "save_buffer": 256, "weight": args.weights,
                "motion_model_alpha": args.cv,
            },
        })
        d = tempfile.mkdtemp(prefix=f"track_long_{combo}_")
        os.makedirs(os.path.join(d, "ply"), exist_ok=True)
        tracker = run_tracking(cfg, d, max_frames=args.frames)
        ate = eval_trajectory(d, get_dataset(cfg))
        shutil.rmtree(d, ignore_errors=True)
        results[combo] = {"ate_rmse_m": None if ate is None
                          else float(ate)}
        print(f"{combo}: ATE {ate}", file=sys.stderr, flush=True)

    results["frames"] = args.frames
    results["revs"] = args.revs
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
