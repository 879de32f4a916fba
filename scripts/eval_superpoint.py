"""Evaluate the self-trained SuperPoint weights
(scripts/train_superpoint.py) on held-out synthetic room pairs:
detector repeatability, descriptor matching, and full
extract -> match -> PnP pose recovery through LoopDetector — the exact
chain loop closure runs (reference: loop/loop_detect.py:120-193, which
this rebuild could never exercise with a learned net before these
weights existed).

Run (TPU or CPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/eval_superpoint.py \
        [--weights vings_mono_tpu/weights/superpoint_selftrained.npz]
"""

import argparse
import json
import sys

import numpy as np

from vings_mono_tpu.datasets.synthetic3d import render_room, texture_params


def _pair(rng, h, w, room=4.0, sharp=1.0):
    f = rng.uniform(0.9, 1.1) * w * 0.75
    intr4 = np.asarray([f, f, w / 2, h / 2], np.float32)
    tex = texture_params(rng.integers(1 << 31), sharpness=sharp)

    def c2w_of(pos, yaw, pitch):
        cy, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.asarray([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        m = np.eye(4)
        m[:3, :3] = Ry @ Rx
        m[:3, 3] = pos
        return m

    pos = rng.uniform(-0.4, 0.4, 3) * room
    yaw, pitch = rng.uniform(-np.pi, np.pi), rng.uniform(-0.3, 0.3)
    a = c2w_of(pos, yaw, pitch)
    # hard viewpoint change: ~0.5 m baseline + ~20 deg yaw, the regime a
    # revisit closure sees (loop_detect.py verifies across real drift) —
    # easy near-identity pairs let even random-init descriptors tie at
    # 100% PnP success (measured r5), which differentiates nothing
    b = c2w_of(pos + rng.normal(size=3) * 0.55, yaw + rng.normal() * 0.35,
               np.clip(pitch + rng.normal() * 0.12, -0.4, 0.4))
    rgb_a, dep_a = render_room(a, intr4, h, w, room, tex=tex)
    rgb_b, dep_b = render_room(b, intr4, h, w, room, tex=tex)
    return rgb_a, dep_a, a, rgb_b, dep_b, b, intr4


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights",
                   default="vings_mono_tpu/weights/superpoint_selftrained.npz")
    p.add_argument("--pairs", type=int, default=12)
    p.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from vings_mono_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from vings_mono_tpu.loop.detect import LoopDetector

    cfg = {}
    det_t = LoopDetector(cfg, args.weights)
    det_r = LoopDetector(cfg, None)        # random-init control

    h, w = args.hw
    rng = np.random.default_rng(20260817)
    stats = {"trained": {"matches": [], "pnp_ok": 0, "pos_err": []},
             "random": {"matches": [], "pnp_ok": 0, "pos_err": []}}
    for i in range(args.pairs):
        rgb_a, dep_a, c2w_a, rgb_b, dep_b, c2w_b, intr4 = _pair(rng, h, w)
        for name, det in (("trained", det_t), ("random", det_r)):
            fa = det.extract(rgb_a)
            fb = det.extract(rgb_b)
            kp_a, kp_b = det.match(fa, fb, img_hw=(h, w))
            stats[name]["matches"].append(int(len(kp_a)))
            c2w = det.pnp_history_pose(kp_a, kp_b, dep_a, c2w_a, intr4)
            if c2w is not None:
                err = float(np.linalg.norm(c2w[:3, 3] - c2w_b[:3, 3]))
                if err < 0.25:
                    stats[name]["pnp_ok"] += 1
                stats[name]["pos_err"].append(round(err, 4))
        print(f"pair {i + 1}/{args.pairs} done", file=sys.stderr)

    out = {}
    for name, s in stats.items():
        out[name] = {
            "mean_matches": float(np.mean(s["matches"])),
            "pnp_success": s["pnp_ok"],          # count out of `pairs`
            "pnp_success_rate": s["pnp_ok"] / args.pairs,
            "median_pos_err_m": (float(np.median(s["pos_err"]))
                                 if s["pos_err"] else None),
        }
    out["pairs"] = args.pairs
    # lexicographic: more recovered poses wins; on a tie, >=20% lower
    # median position error wins
    t, r = out["trained"], out["random"]
    out["trained_beats_random"] = (
        t["pnp_success"] > r["pnp_success"]
        or (t["pnp_success"] == r["pnp_success"]
            and t["median_pos_err_m"] is not None
            and r["median_pos_err_m"] is not None
            and t["median_pos_err_m"] < 0.8 * r["median_pos_err_m"]))
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
