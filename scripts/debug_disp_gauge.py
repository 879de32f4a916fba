"""Compare the tracker's 1/8-res BA disparities against the upsampled
full-res disparities and GT: if disps (BA state) and disps_up (what the
middleware/mapper/loop consume) sit at DIFFERENT gauges, everything
downstream of the middleware lives in a different scale than the poses.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/debug_disp_gauge.py
"""

import json

import numpy as np


def main():
    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from vings_mono_tpu.utils.config import load_config
    from vings_mono_tpu.runners.run import build
    from vings_mono_tpu.datasets import synthetic3d
    from vings_mono_tpu.datasets.synthetic3d import render_room

    cfg = load_config(overrides={
        "mode": "vo",
        "dataset": {"module": "synthetic3d", "n_frames": 30,
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
    for idx in range(30):
        tracker.track(dataset[idx])

    v = tracker.video
    n = v.counter
    disps = np.asarray(v.bufs.disps[:n])       # (n, h8, w8)
    disps_up = np.asarray(v.bufs.disps_up[:n])  # (n, H, W)
    tss = v.tstamps_host
    for k in range(0, n, 4):
        t = int(tss[k])
        c2w_gt = dataset.gt_c2w(t)
        _, d_gt = render_room(c2w_gt, dataset.intr, dataset.h, dataset.w,
                              dataset.room, tex=dataset.tex)
        d_gt8 = d_gt[4::8, 4::8][:disps.shape[1], :disps.shape[2]]
        d8 = 1.0 / np.clip(disps[k], 1e-6, None)
        dup = 1.0 / np.clip(disps_up[k], 1e-6, None)
        print(json.dumps({
            "t": t,
            "gauge_ba8": float(np.median(d8 / d_gt8)),
            "gauge_up": float(np.median(dup / d_gt)),
            "med_disp8": float(np.median(disps[k])),
            "med_dispup": float(np.median(disps_up[k])),
        }))


if __name__ == "__main__":
    main()
