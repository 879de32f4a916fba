"""Dynamic-object masking — rebuild of DynamicModel
(/root/reference/scripts/dynamic/dynamic_utils.py): segments whose pixels
overlap the top-10% render-error region by >= 20% are masked out of
mapping.

Backends for the segmenter:
  * 'precomputed' — per-frame segment masks from disk (the reference itself
    supports offline `sam_anns/*.pt`, dynamic_utils.py:54-61),
  * 'cc' — cv2 connected components over the high-error region (a
    weights-free stand-in for FastSAM's segment-everything),
  * 'flax' — the YOLOv8-seg graph in models/fastsam.py (FastSAM-class
    segment-everything; feed converted weights via dynamic.weights).
"""

from __future__ import annotations

import glob
import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class DynamicModel:
    def __init__(self, cfg):
        dcfg = cfg.get("dynamic", {})
        self.backend = dcfg.get("backend", "cc")
        self.err_quantile = float(dcfg.get("err_quantile", 0.9))
        self.overlap = float(dcfg.get("overlap", 0.2))
        self.ann_files = []
        self.idx = 0
        if self.backend == "precomputed":
            root = dcfg.get("ann_root", "")
            self.ann_files = sorted(glob.glob(os.path.join(root, "*.np*")))
        elif self.backend == "flax":
            import jax
            from ..models.fastsam import FastSAM
            self._seg_model = FastSAM(
                width=float(dcfg.get("width", 0.25)),
                depth=float(dcfg.get("depth", 0.34)))
            w = dcfg.get("weights")
            if w:
                self._seg_params = {"params": np.load(
                    w, allow_pickle=True)["params"].item()}
            else:
                self._seg_params = self._seg_model.init(
                    jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3),
                                                    np.float32))

    def _segments(self, rgb, err_mask):
        """Returns a list of boolean segment masks."""
        if self.backend == "precomputed" and self.idx < len(self.ann_files):
            z = np.load(self.ann_files[self.idx])
            self.idx += 1
            segs = z[z.files[0]] if hasattr(z, "files") else z
            return [segs == k for k in np.unique(segs) if k > 0]
        if self.backend == "flax":
            from ..models.fastsam import segment_everything
            return segment_everything(self._seg_model, self._seg_params,
                                      rgb)
        if cv2 is None:
            return []
        n, labels = cv2.connectedComponents(
            err_mask.astype(np.uint8), connectivity=8)
        return [labels == k for k in range(1, n)]

    def apply_to_viz_out(self, viz_out, mapper):
        """Mask the newest keyframe's dynamic pixels out of the mapper loss
        (run.py wiring of the reference: FastSAM mask -> viz_out pixel_mask
        consumed by get_loss; dynamic_utils.py:64-94 + run.py:77-87).

        Renders the current map at the new keyframe's pose, segments the
        high-error regions, and writes ~dynamic into
        viz_out['pixel_mask'][kf]. No-op until the map exists."""
        if not mapper.initialized:
            return viz_out
        import jax
        import jax.numpy as jnp
        kf = int(viz_out["n_valid"]) - 1
        w2c = np.linalg.inv(np.asarray(
            jax.device_get(viz_out["poses"][kf]), np.float64))
        rets = mapper.render_at(w2c, viz_out["intrinsic"])
        pred_rgb = np.moveaxis(
            np.asarray(jax.device_get(rets["rgb"]), np.float32), 0, -1)
        gt_rgb = np.asarray(jax.device_get(viz_out["images"][kf]),
                            np.float32)
        dyn = self.get_dynamic_mask(gt_rgb, pred_rgb)
        if not dyn.any():
            return viz_out
        viz_out = dict(viz_out)
        viz_out["pixel_mask"] = jnp.asarray(viz_out["pixel_mask"]).at[
            kf].set(jnp.asarray(~dyn))
        return viz_out

    def get_dynamic_mask(self, gt_rgb, pred_rgb, pred_ssim=None):
        """gt/pred (H, W, 3) in [0,1] -> bool (H, W) mask of dynamic pixels
        (dynamic_utils.py:64-94: segments overlapping the top-decile
        L1[xSSIM] error by >= 20%)."""
        err = np.abs(np.asarray(gt_rgb) - np.asarray(pred_rgb)).mean(-1)
        if pred_ssim is not None:
            err = err * (1.0 - np.asarray(pred_ssim))
        thresh = max(float(np.quantile(err, self.err_quantile)), 0.05)
        hot = err >= thresh
        mask = np.zeros_like(hot)
        for seg in self._segments(gt_rgb, hot):
            inter = (seg & hot).sum()
            if seg.sum() > 0 and inter / seg.sum() >= self.overlap:
                mask |= seg
        return mask
