"""Loop detection — rebuild of LoopDetector
(/root/reference/scripts/loop/loop_detect.py): SuperPoint features on
512-wide grayscale crops, descriptor matching (mutual-NN backend standing in
for LightGlue until converted weights are supplied), PnP from the current
frame's keypoints + depths to recover the history pose, then render-based
verification against the history image."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.superpoint import (SuperPoint, load_superpoint, nms_keypoints,
                                 sample_descriptors, mutual_nearest_match)

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class LoopDetector:
    def __init__(self, cfg, sp_params_path=None, max_kp=512,
                 lg_params_path=None):
        self.cfg = cfg
        # per-attempt diagnostics (stage the attempt died at + stats);
        # populated by detect(), consumed by scripts/eval_loop_e2e.py
        self.traces = []
        self.model, self.params = load_superpoint(sp_params_path)
        self.max_kp = max_kp
        self._extract = jax.jit(self._extract_impl,
                                static_argnames=("hh", "ww"))
        # LightGlue backend when converted weights are supplied; otherwise
        # mutual-NN matching on SuperPoint descriptors
        self.lg = None
        self.lg_params = None
        if lg_params_path:
            from ..models.lightglue import (LightGlue,
                                            convert_lightglue_checkpoint)
            if str(lg_params_path).endswith(".npz"):
                # self-trained flax checkpoint (scripts/train_lightglue.py)
                # with an `arch` entry carrying the layer count
                data = np.load(lg_params_path, allow_pickle=True)
                layers = int(data["arch"].item()["layers"]) \
                    if "arch" in data.files else None
                self.lg = LightGlue(layers=layers) if layers else LightGlue()
                self.lg_params = {"params": data["params"].item()}
            else:
                if str(lg_params_path).endswith(".onnx"):
                    from ..utils.onnx_weights import load_onnx_initializers
                    sd = load_onnx_initializers(lg_params_path)
                else:
                    import torch
                    sd = torch.load(lg_params_path, map_location="cpu",
                                    weights_only=True)
                self.lg = LightGlue()
                self.lg_params = convert_lightglue_checkpoint(sd)

    # ------------------------------------------------------------------
    def _extract_impl(self, gray, hh, ww):
        heat, desc_map = self.model.apply(self.params, gray[None, ..., None])
        xy, score, valid = nms_keypoints(heat[0], self.max_kp)
        desc = sample_descriptors(xy, desc_map[0], (hh, ww))
        return xy, score, valid, desc

    def extract(self, rgb):
        """rgb (H, W, 3) float [0,1] -> keypoints in (possibly resized)
        pixel coords of the ORIGINAL image + descriptors."""
        H, W = rgb.shape[:2]
        scale = 512.0 / W
        hh = int(round(H * scale / 8)) * 8
        ww = 512
        gray = np.asarray(rgb) @ np.asarray([0.299, 0.587, 0.114])
        if cv2 is not None:
            gray_r = cv2.resize(gray.astype(np.float32), (ww, hh))
        else:
            gray_r = gray[:hh, :ww].astype(np.float32)
        xy, score, valid, desc = self._extract(jnp.asarray(gray_r), hh=hh,
                                               ww=ww)
        xy = np.asarray(xy) * np.asarray([W / ww, H / hh])
        return xy, np.asarray(score), np.asarray(valid), np.asarray(desc)

    def match(self, feat_a, feat_b, img_hw=None):
        xy_a, _, va, da = feat_a
        xy_b, _, vb, db = feat_b
        if self.lg is not None and img_hw is not None:
            from ..models.lightglue import (extract_matches,
                                            normalize_keypoints)
            k0 = normalize_keypoints(jnp.asarray(xy_a, jnp.float32),
                                     img_hw)
            k1 = normalize_keypoints(jnp.asarray(xy_b, jnp.float32),
                                     img_hw)
            scores, _, _ = self.lg.apply(self.lg_params, jnp.asarray(da),
                                         jnp.asarray(db), k0, k1,
                                         jnp.asarray(va), jnp.asarray(vb))
            idx, ok = extract_matches(scores, jnp.asarray(va),
                                      jnp.asarray(vb))
        else:
            idx, ok = mutual_nearest_match(jnp.asarray(da),
                                           jnp.asarray(db),
                                           jnp.asarray(va),
                                           jnp.asarray(vb))
        idx = np.asarray(idx)
        ok = np.asarray(ok)
        return xy_a[ok], xy_b[idx[ok]]

    # ------------------------------------------------------------------
    def pnp_history_pose(self, kp_cur, kp_hist, depth_cur, cur_c2w, intr4,
                         trace=None, min_inliers=10):
        """World points from the current frame's keypoints+depth, solved
        against the history frame's 2D keypoints (loop_detect.py:66-95).
        Returns history c2w or None."""
        if cv2 is None or len(kp_cur) < 12:
            return None
        fx, fy, cx, cy = [float(v) for v in intr4]
        H, W = depth_cur.shape
        u = np.clip(kp_cur[:, 0].astype(int), 0, W - 1)
        v = np.clip(kp_cur[:, 1].astype(int), 0, H - 1)
        z = np.asarray(depth_cur)[v, u]
        good = (z > 0.1) & (z < 100.0)
        if good.sum() < 12:
            return None
        x = (kp_cur[good, 0] - cx) / fx * z[good]
        y = (kp_cur[good, 1] - cy) / fy * z[good]
        pts_cam = np.stack([x, y, z[good]], -1)
        pts_w = pts_cam @ np.asarray(cur_c2w)[:3, :3].T + \
            np.asarray(cur_c2w)[:3, 3]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        pw = pts_w.astype(np.float64)
        ph = kp_hist[good].astype(np.float64).reshape(-1, 1, 2)
        okf, rvec, tvec, inl = cv2.solvePnPRansac(
            pw, ph, K, None, reprojectionError=4.0, iterationsCount=100)
        if trace is not None:
            trace["pnp_inliers"] = 0 if inl is None else int(len(inl))
        if not okf or inl is None or len(inl) < min_inliers:
            return None
        # LM refinement on the consensus set: the RANSAC minimal-set pose
        # alone is noisy, and a loop correction built from it injects that
        # noise into the whole rectified segment (measured: a 17-inlier
        # unrefined closure DEGRADED e2e ATE 0.98 -> 1.47)
        inl = inl[:, 0]
        rvec, tvec = cv2.solvePnPRefineLM(pw[inl], ph[inl], K, None,
                                          rvec, tvec)
        R, _ = cv2.Rodrigues(rvec)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = tvec[:, 0]
        return np.linalg.inv(w2c)

    # ------------------------------------------------------------------
    def detect(self, mapper, cur_img, cur_depth, cur_c2w, hist_img,
               hist_c2w_guess, intr, min_matches=40, min_inliers=30,
               sanity_dist=15.0, verify_thresh=0.15, verify_distance=60.0):
        """Full detect pipeline; returns rectified history c2w or None."""
        tr = {"stage": "match", "matches": 0, "pnp_inliers": 0,
              "rend_frac": None, "sanity_d": None, "verify_px": 0,
              "verify_err": None}
        self.traces.append(tr)
        feat_cur = self.extract(cur_img)
        feat_hist = self.extract(hist_img)
        kp_c, kp_h = self.match(feat_cur, feat_hist,
                                img_hw=cur_img.shape[:2])
        tr["matches"] = int(len(kp_c))
        if len(kp_c) < min_matches:
            return None
        tr["stage"] = "pnp"
        intr4 = np.asarray([intr["fv"], intr["fu"], intr["cv"],
                            intr["cu"]])
        # PnP depth from the RENDERED map where opacity is saturated (the
        # reference uses rendered depth because per-frame tracked
        # disparity is too noisy for RANSAC consensus, loop_detect.py:
        # 66-95 — measured here: 150+ good matches, 0/31 PnP inliers on
        # tracker depth; the Gaussian map's depth is multi-view-consistent)
        pnp_depth = cur_depth
        if mapper is not None:
            rcur = mapper.render_at(np.linalg.inv(cur_c2w), intr,
                                    max_dist=verify_distance)
            acc_c = np.asarray(rcur["accum"])[0]
            dep_c = np.asarray(rcur["depth"])[0]
            use_rend = (acc_c > 0.9) & (dep_c > 0.05)
            tr["rend_frac"] = float(use_rend.mean())
            # gauge repair: on a briefly-trained map the rendered expected
            # depth is CONTRACTED toward the camera (floaters + fore/back
            # mixing at edges), which shrinks the PnP translation by the
            # same factor and teleports the correction (measured r5:
            # |t_meas|/|t_track| ~ 0.25-0.3 with raw rendered depth).
            # The rendered depth's SHAPE is multi-view consistent (good
            # for RANSAC); its SCALE must come from the tracker's own
            # depth gauge, or the correction leaves the trajectory's gauge
            both = use_rend & (cur_depth > 0.05)
            if both.sum() > 100:
                ratio = cur_depth[both] / dep_c[both]
                s_med = float(np.median(ratio))
                tr["depth_ratio_med"] = s_med
                pnp_depth = np.where(use_rend, dep_c * s_med, cur_depth)
            else:
                pnp_depth = np.where(use_rend, dep_c, cur_depth)
            # noise floor for the photometric verify gate: how well the
            # map explains the CURRENT image from the TRUSTED tracked pose.
            # A converged map gives ~0.02-0.05 (the reference's absolute
            # 0.15 gate applies); a briefly-trained map renders soft
            # everywhere, and holding a candidate to a bar the map cannot
            # meet at a known-good pose rejects every genuine closure
            m_self = (acc_c > 0.95) & (dep_c < 15.0)
            if m_self.sum() > 500:
                pred_self = np.moveaxis(np.asarray(rcur["rgb"]), 0, -1)
                err_self = np.abs(pred_self -
                                  np.asarray(cur_img)).mean(-1)
                tr["verify_floor"] = float(err_self[m_self].mean())
        new_c2w = self.pnp_history_pose(kp_c, kp_h, pnp_depth, cur_c2w,
                                        intr4, trace=tr,
                                        min_inliers=min_inliers)
        if new_c2w is None:
            return None
        tr["stage"] = "sanity"
        tr["sanity_d"] = float(np.linalg.norm(
            new_c2w[:3, 3] - np.asarray(hist_c2w_guess)[:3, 3]))
        if tr["sanity_d"] > sanity_dist:
            return None
        # render-verify (loop_detect.py:120-193): the map seen from the
        # recovered pose must photometrically match the history image.
        # Distance-culled like the reference's render_indistance 60 m
        # render (gaussian_base.py:238-332) — fast at km scale, and far
        # geometry can't pollute the check.
        tr["stage"] = "verify"
        rets = mapper.render_at(np.linalg.inv(new_c2w), intr,
                                max_dist=verify_distance)
        acc = np.asarray(rets["accum"])[0]
        dep = np.asarray(rets["depth"])[0]
        m = (acc > 0.95) & (dep < 15.0)
        tr["verify_px"] = int(m.sum())
        if m.sum() < 500:
            return None
        pred = np.moveaxis(np.asarray(rets["rgb"]), 0, -1)
        err = np.abs(pred - np.asarray(hist_img)).mean(-1)
        tr["verify_err"] = float(err[m].mean())
        # self-calibrating gate: absolute reference threshold, relaxed to
        # 1.5x the map's own render error at the trusted current pose
        # when the map is still soft (see verify_floor above)
        gate = verify_thresh
        if tr.get("verify_floor") is not None:
            gate = max(gate, 1.5 * tr["verify_floor"])
        tr["verify_gate"] = float(gate)
        if tr["verify_err"] > gate:
            return None
        tr["stage"] = "ok"
        return new_c2w
