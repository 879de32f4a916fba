"""Evaluation harness: ATE RMSE against the dataset's ground truth and
render PSNR over saved keyframes — the measurement plan of BASELINE.md
(Umeyama-aligned monocular ATE; per-keyframe PSNR like the reference's
online logging, vis_utils.py:313-319)."""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def eval_trajectory(run_dir, dataset):
    files = sorted(glob.glob(os.path.join(run_dir, "droid_c2w", "*.txt")))
    ts = [float(os.path.basename(f)[:-4]) for f in files]
    c2ws = [np.loadtxt(f) for f in files]
    gt = dataset.load_gt_dict()
    if gt is None or len(ts) < 3:
        return None
    from ..utils.trajectory import ate_rmse
    return ate_rmse(ts, c2ws, gt["timestamps"], gt["c2ws"])


def eval_psnr(mapper, tracker, n_eval=10):
    """Render PSNR over evenly spaced keyframes (save buffer; falls back
    to the live window when nothing has spilled yet — short runs)."""
    import jax.numpy as jnp
    from ..mapper.losses import psnr
    from ..ops import lie
    video = tracker.video
    n = video.count_save
    if n > 0:
        poses = video.poses_save[:n]
        images = video.images_save[:n]
        disps_up = video.disps_up_save[:n]
    else:
        n = video.counter
        if n == 0:
            return None
        poses, images, disps_up = (np.asarray(x[:n]) for x in (
            video.bufs.poses, video.bufs.images, video.bufs.disps_up))
    idx = np.linspace(0, n - 1, min(n_eval, n)).astype(int)
    vals = []
    intr = np.asarray(video.bufs.intrinsics[0]) * 8.0
    intr_d = {"fu": float(intr[1]), "fv": float(intr[0]),
              "cu": float(intr[3]), "cv": float(intr[2]),
              "H": video.ht, "W": video.wd}
    for i in idx:
        w2c = np.asarray(lie.se3_matrix(jnp.asarray(
            poses[i], jnp.float32)))
        rets = mapper.render_at(w2c, intr_d)
        gt = jnp.moveaxis(jnp.asarray(images[i]), -1, 0)
        mask = jnp.asarray(disps_up[i] > 0)
        vals.append(float(psnr(rets["rgb"], gt, mask)))
    return float(np.mean(vals))


def main(argv=None):
    from ..utils.config import load_config
    from ..datasets.base import get_dataset
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("run_dir")
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    dataset = get_dataset(cfg)
    ate = eval_trajectory(args.run_dir, dataset)
    print(json.dumps({"ate_rmse_m": ate}))


if __name__ == "__main__":
    main()
