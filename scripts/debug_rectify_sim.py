"""Pure-numpy rectification study (r5): does `rectify_poses` reduce
Sim3-aligned ATE on a synthetically drifted orbit when the closure
measurement is PERFECT? Isolates the interior-distribution quality of
the PGO from detection quality — entirely on CPU, no tracker.

Drift model matched to the measured 160-frame profile
(scripts/debug_track_profile): systematic per-step yaw underestimation
plus heavy-tailed per-step translation scale noise (t_ratio 0.6-6.9).
"""

import argparse
import json

import numpy as np

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vings_mono_tpu.loop.rectify import rectify_poses  # noqa: E402
from vings_mono_tpu.utils.trajectory import ate_rmse  # noqa: E402


def gt_orbit(n, revs=1.6, r=1.8):
    c2ws = []
    for k in range(n):
        th = 2 * np.pi * revs * k / n
        # camera on a circle, looking inward (matches synthetic3d's orbit
        # in spirit; exact geometry is irrelevant for the ATE algebra)
        pos = np.asarray([r * np.cos(th), 0.3 * np.sin(2 * th),
                          r * np.sin(th)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.asarray([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upo = np.cross(fwd, right)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, upo, fwd, pos
        c2ws.append(m)
    return np.stack(c2ws)


def drift(gt, rng, rot_bias=0.985, rot_noise=0.004, scale_sigma=0.35):
    """Compose per-step GT deltas with systematic under-rotation
    (rot_bias < 1 scales the step's rotation angle) + lognormal step
    scale noise. Returns drifted c2ws with pose 0 == GT pose 0."""
    from scipy.spatial.transform import Rotation
    out = [gt[0]]
    for k in range(1, len(gt)):
        d = np.linalg.inv(gt[k - 1]) @ gt[k]
        rv = Rotation.from_matrix(d[:3, :3]).as_rotvec()
        rv = rv * rot_bias + rng.normal(size=3) * rot_noise
        s = float(np.exp(rng.normal() * scale_sigma))
        dn = np.eye(4)
        dn[:3, :3] = Rotation.from_rotvec(rv).as_matrix()
        dn[:3, 3] = d[:3, 3] * s
        out.append(out[-1] @ dn)
    return np.stack(out)


def sim3_ate(est, gt):
    ts = np.arange(len(est), dtype=float)
    return ate_rmse(ts, list(est), ts, list(gt))


def close_at(c2ws, gt, cur, cand, rescale="track", bend_from=None):
    """Perfect-measurement closure exactly as LoopModel.run composes it:
    rel_meas = GT relative pose, optionally magnitude-rescaled into the
    chain's own gauge, then rectify_poses to the target.

    bend_from: start of the BEND segment (>= cand). The loop constraint
    is still cand->cur, but frames already consistent (corrected by a
    previous closure) are held fixed and only the newly drifted tail is
    bent."""
    rel_gt = np.linalg.inv(gt[cand]) @ gt[cur]
    rel_track = np.linalg.inv(c2ws[cand]) @ c2ws[cur]
    rel_used = rel_gt.copy()
    if rescale == "track":
        nm = np.linalg.norm(rel_gt[:3, 3])
        nt = np.linalg.norm(rel_track[:3, 3])
        if nm > 1e-9:
            rel_used[:3, 3] *= nt / nm
    target_cur = c2ws[cand] @ rel_used
    a = cand if bend_from is None else max(cand, min(bend_from, cur - 1))
    return rectify_poses(c2ws, a, cur, target_cur)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--revs", type=float, default=1.6)
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--rescale", default="track", choices=["track", "none"])
    p.add_argument("--bend-from-last", action="store_true",
                   help="bend only the segment after the previous "
                        "closure's endpoint (new drift), holding the "
                        "already-corrected chain fixed")
    args = p.parse_args()

    gt = gt_orbit(args.frames, args.revs)
    closures = [(96, 6), (105, 34), (114, 34), (123, 42), (132, 51),
                (141, 60), (150, 69)]
    rows = []
    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        est = drift(gt, rng)
        a0 = sim3_ate(est, gt)
        deltas = []
        last_cur = None
        for cur, cand in closures:
            b = sim3_ate(est, gt)
            bf = last_cur if args.bend_from_last else None
            est = close_at(est, gt, cur, cand, rescale=args.rescale,
                           bend_from=bf)
            last_cur = cur
            deltas.append((round(b, 3), round(sim3_ate(est, gt), 3)))
        rows.append({"seed": seed, "ate_start": round(a0, 3),
                     "ate_end": round(sim3_ate(est, gt), 3),
                     "deltas": deltas})
        print(json.dumps(rows[-1]))
    imp = [r["ate_start"] - r["ate_end"] for r in rows]
    print(json.dumps({"mean_improvement": round(float(np.mean(imp)), 3),
                      "all_improve": bool(all(i > 0 for i in imp))}))


if __name__ == "__main__":
    main()
