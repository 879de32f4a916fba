"""Measure the tracker's internal gauge profile on the loop-eval
trajectory: per keyframe, (a) the depth gauge med(d_int / d_gt) and
(b) the local translation gauge |t_int|/|t_gt| to the previous keyframe.

Monocular SLAM has one free global gauge; what matters is whether it
DRIFTS. A 4-7x gauge drop along the chain is what makes a loop-closure
endpoint target (measured at the CURRENT local gauge) inconsistent with
the stored chain (integrated at a mixture of gauges) — the exact failure
the reference's scale-aware v4 PGO exists for (loop_rectify.py:209-253).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/debug_scale_profile.py
"""

import json

import numpy as np


def main():
    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from vings_mono_tpu.utils.config import load_config
    from vings_mono_tpu.runners.run import build
    from vings_mono_tpu.middleware import judge_and_package
    from vings_mono_tpu.datasets import synthetic3d
    from vings_mono_tpu.datasets.synthetic3d import render_room
    from vings_mono_tpu.utils.trajectory import tracker_c2ws

    cfg = load_config(overrides={
        "mode": "vo",
        "dataset": {"module": "synthetic3d", "n_frames": 42,
                    "room": 4.0, "tex_seed": 5, "sharpness": 1.0},
        "intrinsic": {"fu": 200.0, "fv": 200.0, "cu": 120.0, "cv": 80.0,
                      "H": 240, "W": 160},
        "frontend": {
            "image_size": [240, 160], "buffer": 64, "warm_up": 8,
            "filter_thresh": -1.0, "keyframe_thresh": 0.0,
            "frontend_thresh": 1e9, "frontend_window": 12,
            "frontend_radius": 2, "frontend_nms": 1, "max_factors": 48,
            "edge_capacity": 64, "inactive_capacity": 128,
            "ba_window": 16, "iters1": 2, "iters2": 1,
            "active_window": 12, "max_age": 12, "rollup_at": 48,
            "rollup_n": 16, "save_buffer": 256,
            "weight": "vings_mono_tpu/weights/droid_selftrained.npz",
        },
    })
    dataset, tracker, *_ = build(cfg)
    dataset.tex = synthetic3d.texture_params(5, sharpness=1.0)

    depth_gauge = {}   # kf ts -> med(d_int / d_gt)
    for idx in range(42):
        tracker.track(dataset[idx])
        viz = judge_and_package(tracker, cfg)
        if viz is None:
            continue
        tss = np.asarray(viz["viz_out_idx_to_f_idx"])
        for i, t in enumerate(tss):
            d_int = np.asarray(viz["depths"][i])[..., 0]
            c2w_gt = dataset.gt_c2w(int(t))
            _, d_gt = render_room(c2w_gt, dataset.intr, dataset.h,
                                  dataset.w, dataset.room,
                                  tex=dataset.tex)
            m = d_int > 0.01
            if m.sum() > 100:
                depth_gauge[float(t)] = float(np.median(d_int[m] /
                                                        d_gt[m]))

    ts, c2ws = tracker_c2ws(tracker)
    rows = []
    prev = None
    for t, m in zip(ts, c2ws):
        gt = dataset.gt_c2w(int(t))
        row = {"t": float(t), "depth_gauge": depth_gauge.get(float(t))}
        if prev is not None:
            dt_int = np.linalg.norm(m[:3, 3] - prev[0][:3, 3])
            dt_gt = np.linalg.norm(gt[:3, 3] - prev[1][:3, 3])
            row["trans_gauge"] = float(dt_int / (dt_gt + 1e-12))
        prev = (m, gt)
        rows.append(row)
    for r in rows:
        print(json.dumps(r))
    return rows


if __name__ == "__main__":
    main()
