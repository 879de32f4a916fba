"""Monocular metric-depth prior — the reference's Metric3D v2-S wrapper
(/root/reference/scripts/metric/metric_model.py) fed `data_packet['depth']`
-> disps_sens.

Backends:
  * 'npz'   — precomputed per-frame depth maps from disk (the practical
              path in environments without the ViT checkpoint; analogous to
              the reference's offline-prior workflows),
  * 'flax'  — a DPT-style ViT-S depth head in flax (weights must be
              converted from a public Metric3D/ZoeDepth checkpoint; the
              architecture is here, the checkpoint is not shipped),
  * 'none'  — disabled.
"""

from __future__ import annotations

import glob
import os

import numpy as np


class MetricDepth:
    def __init__(self, cfg):
        mcfg = cfg.get("metric", {})
        self.backend = mcfg.get("backend", "npz")
        self.d_max = float(mcfg.get("d_max", 80.0))
        self.files = []
        self.idx = 0
        if self.backend == "npz":
            root = mcfg.get("root", "")
            self.files = sorted(glob.glob(os.path.join(root, "*.np[yz]")))
        elif self.backend == "flax":
            from .dpt_depth import DPTDepth, load_dpt
            self.model, self.params, self._predict = load_dpt(
                mcfg.get("weights"))

    def predict(self, rgb, intrinsic):
        """rgb (H, W, 3) [0,1] -> metric depth (H, W) or None."""
        H, W = rgb.shape[:2]
        if self.backend == "npz":
            if self.idx >= len(self.files):
                return None
            path = self.files[self.idx]
            self.idx += 1
            d = np.load(path)
            if hasattr(d, "files"):
                d = d[d.files[0]]
            if d.shape != (H, W):
                try:
                    import cv2
                    d = cv2.resize(d.astype(np.float32), (W, H),
                                   interpolation=cv2.INTER_NEAREST)
                except Exception:
                    return None
            return np.clip(d, 0, self.d_max).astype(np.float32)
        if self.backend == "flax":
            import jax.numpy as jnp
            d = self._predict(self.params, jnp.asarray(rgb)[None])[0]
            return np.clip(np.asarray(d), 0, self.d_max)
        return None
