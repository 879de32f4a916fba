"""Isolate the loop-detect chain from the tracker: render loop-geometry
frame pairs of the eval trajectory with GT poses/depth, run
extract -> match -> PnP on GT inputs, and score (a) match correctness in
3D (do the matched keypoints' GT-backprojected world points agree?) and
(b) the PnP-recovered relative pose vs GT.

If PnP is translation-squashed even on GT inputs, the failure is in the
detector/matcher (e.g. quasi-periodic texture aliasing), not tracking.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/debug_loop_matches.py
"""

import json

import numpy as np

from vings_mono_tpu.datasets.synthetic3d import (render_room,
                                                 texture_params,
                                                 trajectory_c2w)
from vings_mono_tpu.loop.detect import LoopDetector


def main():
    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    H, W = 240, 160
    f = 200.0
    intr4 = np.asarray([f, f, W / 2, H / 2], np.float32)
    n, room = 42, 4.0
    tex = texture_params(5, sharpness=1.0)
    det = LoopDetector({}, "vings_mono_tpu/weights/"
                           "superpoint_selftrained.npz")

    out = []
    for (ga, gb) in [(8, 20), (16, 28), (23, 36), (35, 38), (30, 32)]:
        c2w_a = trajectory_c2w(ga, n, room)   # history
        c2w_b = trajectory_c2w(gb, n, room)   # current
        rgb_a, dep_a = render_room(c2w_a, intr4, H, W, room, tex=tex)
        rgb_b, dep_b = render_room(c2w_b, intr4, H, W, room, tex=tex)
        feat_b = det.extract(rgb_b)
        feat_a = det.extract(rgb_a)
        kp_b, kp_a = det.match(feat_b, feat_a, img_hw=(H, W))

        def backproject(kp, dep, c2w):
            u = np.clip(kp[:, 0].astype(int), 0, W - 1)
            v = np.clip(kp[:, 1].astype(int), 0, H - 1)
            z = dep[v, u]
            x = (kp[:, 0] - W / 2) / f * z
            y = (kp[:, 1] - H / 2) / f * z
            pc = np.stack([x, y, z], -1)
            return pc @ c2w[:3, :3].T + c2w[:3, 3]

        pw_b = backproject(kp_b, dep_b, c2w_b)
        pw_a = backproject(kp_a, dep_a, c2w_a)
        d3 = np.linalg.norm(pw_b - pw_a, axis=-1)
        rec = {"pair": (ga, gb), "n_matches": int(len(kp_b)),
               "match3d_med": float(np.median(d3)) if len(d3) else None,
               "match3d_frac_lt10cm": float((d3 < 0.10).mean())
               if len(d3) else None}

        # PnP with GT depth of the current frame + GT current pose
        tr = {}
        new_a = det.pnp_history_pose(kp_b, kp_a, dep_b, c2w_b, intr4,
                                     trace=tr, min_inliers=10)
        rec["pnp_inliers"] = tr.get("pnp_inliers")
        if new_a is not None:
            rel_m = np.linalg.inv(new_a) @ c2w_b
            rel_gt = np.linalg.inv(c2w_a) @ c2w_b
            rot = np.degrees(np.arccos(np.clip(
                (np.trace(rel_gt[:3, :3].T @ rel_m[:3, :3]) - 1) / 2,
                -1, 1)))
            rec["rot_err_deg"] = float(rot)
            tm, tg = rel_m[:3, 3], rel_gt[:3, 3]
            rec["t_ratio"] = float(np.linalg.norm(tm) /
                                   (np.linalg.norm(tg) + 1e-12))
            rec["t_dir_deg"] = float(np.degrees(np.arccos(np.clip(
                tm @ tg / (np.linalg.norm(tm) * np.linalg.norm(tg)
                           + 1e-12), -1, 1))))
            rec["t_err_abs"] = float(np.linalg.norm(tm - tg))
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


if __name__ == "__main__":
    main()
