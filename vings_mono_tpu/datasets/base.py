"""Dataset contract (mirrors SURVEY §2.8):

  get_dataset(cfg) -> dataset
  dataset[idx] -> data_packet {'timestamp': float,
                               'rgb': (H, W, 3) float32 RGB in [0,1],
                               'intrinsic': (4,) [fx, fy, cx, cy] at the
                                            resized resolution,
                               optional 'depth': (H, W) metric}
  dataset.preload_imu() -> (M, 7) [t, gyro_xyz(deg/s), acc_xyz] (zeros for VO)
  dataset.preload_camtimestamp() -> (N, 1)
  dataset.c2i -> (4, 4) camera->IMU extrinsic
  dataset.load_gt_dict() -> {'timestamps', 'c2ws'} when ground truth exists

The reference hands out (1, 3, H, W) tensors scaled 0..255 BGR->RGB; our
packets are channel-last float [0,1] (the TPU-native layout) — the tracker
normalizes internally.
"""

from __future__ import annotations

import glob
import importlib
import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def get_dataset(cfg):
    """importlib dispatch like the reference runner (run.py:18)."""
    module = cfg["dataset"]["module"]
    mod = importlib.import_module(f"vings_mono_tpu.datasets.{module}")
    return mod.get_dataset(cfg)


def load_rgb(path, resized_hw):
    h, w = resized_hw
    img = cv2.imread(path)
    img = cv2.resize(img, (w, h))
    return np.ascontiguousarray(img[..., ::-1]).astype(np.float32) / 255.0


class ImageFolderDataset:
    """Common scaffolding: a list of (timestamp, rgb path [, depth path])."""

    rotate_ccw = False  # phone/mobile captures are landscape-rotated

    def __init__(self, cfg):
        self.cfg = cfg
        self.h, self.w = (int(cfg["frontend"]["image_size"][0]),
                          int(cfg["frontend"]["image_size"][1]))
        self.c2i = np.eye(4)
        self.depth_scale = 1.0
        self.timestamps = []
        self.rgb_files = []
        self.depth_files = None
        self._prepare()

    def _prepare(self):
        raise NotImplementedError

    def __len__(self):
        return len(self.rgb_files)

    def _intrinsic(self):
        ic = self.cfg["intrinsic"]
        u_scale = self.h / ic["H"]
        v_scale = self.w / ic["W"]
        return np.asarray([ic["fv"] * v_scale, ic["fu"] * u_scale,
                           ic["cv"] * v_scale, ic["cu"] * u_scale],
                          np.float32)

    def _load_rgb(self, idx):
        if self.rotate_ccw:
            img = cv2.rotate(cv2.imread(self.rgb_files[idx]),
                             cv2.ROTATE_90_COUNTERCLOCKWISE)
            img = cv2.resize(img, (self.w, self.h))
            return np.ascontiguousarray(
                img[..., ::-1]).astype(np.float32) / 255.0
        return load_rgb(self.rgb_files[idx], (self.h, self.w))

    def __getitem__(self, idx):
        pkt = {
            "timestamp": float(self.timestamps[idx]),
            "rgb": self._load_rgb(idx),
            "intrinsic": self._intrinsic(),
        }
        if self.depth_files is not None:
            d = cv2.imread(self.depth_files[idx], cv2.IMREAD_UNCHANGED)
            d = cv2.resize(d.astype(np.float32), (self.w, self.h),
                           interpolation=cv2.INTER_NEAREST)
            pkt["depth"] = d / self.depth_scale
        return pkt

    def preload_camtimestamp(self):
        return np.asarray(self.timestamps, np.float64)[:, None]

    def preload_imu(self):
        imu = np.zeros((len(self.timestamps), 7))
        imu[:, 0] = np.asarray(self.timestamps)
        return imu

    def load_gt_dict(self):
        root = self.cfg["dataset"]["root"]
        pose_dir = os.path.join(root, "pose")
        return load_pose_dir_gt(pose_dir)


def load_pose_dir_gt(pose_dir, stem=lambda f: f.replace(".txt", "")):
    """gt layout shared by most reference loaders: pose/<t>.txt 4x4 c2ws."""
    if not os.path.isdir(pose_dir):
        return None
    files = sorted(os.listdir(pose_dir))
    c2ws = np.asarray([np.loadtxt(os.path.join(pose_dir, f))
                       for f in files])
    ts = np.asarray([float(stem(f)) for f in files])
    order = np.argsort(ts)
    return {"timestamps": ts[order], "c2ws": c2ws[order]}


class GlobVODataset(ImageFolderDataset):
    """Folder-of-frames visual-only dataset — the shape shared by most of
    the reference's VO loaders (waymo.py, hierarchical.py, pocket.py,
    meganerf.py, ...): frames from one glob pattern, frame-index
    timestamps, zero IMU, identity extrinsic, gt in pose/<t>.txt.

    Subclasses set `subdir` / `pattern` (and optionally `sort_key`)."""

    subdir = "color"
    pattern = "*.jpg"
    sort_key = None  # default lexicographic

    def _prepare(self):
        root = self.cfg["dataset"]["root"]
        files = glob.glob(os.path.join(root, self.subdir, self.pattern))
        self.rgb_files = sorted(files, key=self.sort_key)
        self.timestamps = list(range(len(self.rgb_files)))


class LiveFolderDataset(GlobVODataset):
    """Live capture folder that keeps growing while SLAM runs — the
    reference's phone.py/mobile.py pattern: unbounded length, re-scan the
    folder on every fetch and poll until the requested frame lands on
    disk (phone.py:30-90)."""

    subdir = "cam0"
    pattern = "*.png"
    rotate_ccw = True
    poll_s = 0.1

    def __len__(self):
        return 1000000  # live stream: bounded only by the run

    def __getitem__(self, idx):
        import time
        while True:
            self._prepare()
            if idx < len(self.rgb_files):
                break
            time.sleep(self.poll_s)
        return super().__getitem__(idx)
