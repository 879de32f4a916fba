"""Per-step tracking-error profile on the long trajectory: for each
consecutive keyframe pair, the local translation gauge |t_int|/|t_gt|
and the relative-rotation error — locates WHERE (and how: gradual gauge
drift vs a discrete tracking failure) the 160-frame collapse measured in
eval_track_long.py happens.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/debug_track_profile.py --frames 160
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights",
                   default="vings_mono_tpu/weights/droid_selftrained.npz")
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--revs", type=float, default=1.6)
    p.add_argument("--iters1", type=int, default=2)
    p.add_argument("--iters2", type=int, default=1)
    p.add_argument("--ba-window", type=int, default=16)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from vings_mono_tpu.runners.run_tracking import run as run_tracking
    from vings_mono_tpu.utils.config import load_config
    from vings_mono_tpu.datasets.base import get_dataset

    cfg = load_config(overrides={
        "mode": "vo",
        "dataset": {"module": "synthetic3d", "n_frames": args.frames,
                    "room": 4.0, "revs": args.revs, "tex_seed": 5,
                    "sharpness": 1.0},
        "intrinsic": {"fu": 200.0, "fv": 200.0, "cu": 120.0, "cv": 80.0,
                      "H": 240, "W": 160},
        "frontend": {
            "image_size": [240, 160], "buffer": 64, "warm_up": 8,
            "filter_thresh": -1.0, "keyframe_thresh": 0.0,
            "frontend_thresh": 1e9, "frontend_window": 12,
            "frontend_radius": 2, "frontend_nms": 1,
            "max_factors": 48, "edge_capacity": 64,
            "inactive_capacity": 128, "ba_window": args.ba_window,
            "iters1": args.iters1, "iters2": args.iters2,
            "active_window": 12, "max_age": 12, "rollup_at": 48,
            "rollup_n": 16, "save_buffer": 256, "weight": args.weights,
        },
    })
    d = tempfile.mkdtemp(prefix="track_prof_")
    os.makedirs(os.path.join(d, "ply"), exist_ok=True)
    run_tracking(cfg, d, max_frames=args.frames)
    dataset = get_dataset(cfg)

    pose_dir = os.path.join(d, "droid_c2w")
    files = sorted(os.listdir(pose_dir), key=lambda f: float(f[:-4]))
    tss = np.asarray([float(f[:-4]) for f in files])
    c2w = np.stack([np.loadtxt(os.path.join(pose_dir, f)) for f in files])
    rows = []
    for k in range(1, len(tss)):
        a, b = int(round(float(tss[k - 1]))), int(round(float(tss[k])))
        rel_i = np.linalg.inv(c2w[k - 1]) @ c2w[k]
        rel_g = np.linalg.inv(dataset.gt_c2w(a)) @ dataset.gt_c2w(b)
        tn_i = float(np.linalg.norm(rel_i[:3, 3]))
        tn_g = float(np.linalg.norm(rel_g[:3, 3]))
        cosang = (np.trace(rel_i[:3, :3].T @ rel_g[:3, :3]) - 1) / 2
        rot = float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        rows.append({"k": k, "ts": b, "t_ratio": round(tn_i / max(tn_g,
                     1e-9), 3), "rot_err_deg": round(rot, 2)})
    for r in rows:
        print(r, file=sys.stderr)
    out = {"rows": rows, "frames": args.frames}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
