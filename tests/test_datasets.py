"""Loader contract smoke tests: every dataset module produces packets with
{'timestamp': float, 'rgb': (H, W, 3) float32 [0,1], 'intrinsic': (4,)}
from its expected on-disk layout (SURVEY §2.8)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vings_mono_tpu.datasets.base import get_dataset

H, W = 32, 48


def base_cfg(root, module):
    return {
        "dataset": {"module": module, "root": str(root), "rgb_strip": 2,
                    "imu_delay": 0.0},
        "frontend": {"image_size": [H, W]},
        "intrinsic": {"fv": 40.0, "fu": 40.0, "cv": 32.0, "cu": 24.0,
                      "H": 48, "W": 64},
    }


def write_frames(dirpath, names):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        img = rng.integers(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(os.path.join(dirpath, n), img)


def check_packet(pkt, expect_depth=False):
    assert isinstance(pkt["timestamp"], float)
    assert pkt["rgb"].shape == (H, W, 3)
    assert pkt["rgb"].dtype == np.float32
    assert 0.0 <= pkt["rgb"].min() and pkt["rgb"].max() <= 1.0
    assert pkt["intrinsic"].shape == (4,)
    if expect_depth:
        assert pkt["depth"].shape[0] > 0


GLOB_LAYOUTS = [
    ("waymo", "color", ["000000.jpg", "000001.jpg"]),
    ("hierarchical", "color", ["000000.png", "000001.png"]),
    ("pocket", "color", ["000000.jpg", "000001.jpg"]),
    ("custom", "rgb", ["000000.png", "000001.png"]),
    ("weilai", "nosky_color", ["000000.png", "000001.png"]),
    ("kintinuous", "nosky_color", ["000000.png", "000001.png"]),
    ("meganerf", "rgbs_4", ["000000.jpg", "000001.jpg"]),
    ("urbanscene3d", "rgb_downsample", ["DJI_2.JPG", "DJI_10.JPG"]),
]


@pytest.mark.parametrize("module,subdir,names", GLOB_LAYOUTS)
def test_glob_vo_loaders(tmp_path, module, subdir, names):
    write_frames(tmp_path / subdir, names)
    ds = get_dataset(base_cfg(tmp_path, module))
    assert len(ds) == len(names)
    check_packet(ds[0])
    assert (ds.preload_imu()[:, 1:] == 0).all()
    assert ds.preload_camtimestamp().shape == (len(names), 1)


def test_urbanscene3d_numeric_order(tmp_path):
    write_frames(tmp_path / "rgb_downsample", ["DJI_2.JPG", "DJI_10.JPG"])
    ds = get_dataset(base_cfg(tmp_path, "urbanscene3d"))
    assert [os.path.basename(f) for f in ds.rgb_files] == \
        ["DJI_2.JPG", "DJI_10.JPG"]


def test_bundlefusion_stride_and_gt(tmp_path):
    write_frames(tmp_path, [f"frame-{i:06d}.color.jpg" for i in range(4)])
    for i in range(4):
        np.savetxt(tmp_path / f"frame-{i:06d}.pose.txt", np.eye(4))
    ds = get_dataset(base_cfg(tmp_path, "bundlefusion"))
    assert len(ds) == 2  # rgb_strip=2
    assert ds[1]["timestamp"] == 2.0
    gt = ds.load_gt_dict()
    assert gt["c2ws"].shape == (4, 4, 4)


def test_mobile_offline_imu_swap(tmp_path):
    ns = [1700000000_000000000, 1700000000_100000000]
    write_frames(tmp_path / "pic", [f"{t}.png" for t in ns])
    np.savetxt(tmp_path / "c2i.txt", np.eye(4))
    imu = np.zeros((5, 7))
    imu[:, 0] = np.linspace(1.7e9, 1.7e9 + 0.1, 5)
    imu[:, 1] = 1.0  # gyro x -> should land in column 2
    imu[:, 4] = 2.0  # acc x -> column 5
    header = "t,gx,gy,gz,ax,ay,az"
    np.savetxt(tmp_path / "imu.txt", imu, delimiter=",", header=header)
    ds = get_dataset(base_cfg(tmp_path, "mobile_offline"))
    assert abs(ds.timestamps[1] - ds.timestamps[0] - 0.1) < 1e-6
    out = ds.preload_imu()
    assert (out[:, 2] == 1.0).all() and (out[:, 1] == 0.0).all()
    assert (out[:, 5] == 2.0).all() and (out[:, 4] == 0.0).all()
    check_packet(ds[0])
    # portrait rotation: packet is still the configured landscape size
    assert ds[0]["rgb"].shape == (H, W, 3)


def test_realsense_vio_depth_and_meta(tmp_path):
    write_frames(tmp_path / "image_00" / "data_nodyn",
                 ["a.png", "b.png"])
    os.makedirs(tmp_path / "image_00" / "depth")
    for n in ["a", "b"]:
        np.save(tmp_path / "image_00" / "depth" / f"{n}.npy",
                np.ones((48, 64), np.float32))
    os.makedirs(tmp_path / "DBAF_format")
    with open(tmp_path / "DBAF_format" / "camstamp.txt", "w") as f:
        f.write("100.0 a.png\n100.1 b.png\n")
    np.savetxt(tmp_path / "DBAF_format" / "c2i.txt", np.eye(4))
    np.savetxt(tmp_path / "DBAF_format" / "imu.txt", np.zeros((3, 7)))
    ds = get_dataset(base_cfg(tmp_path, "realsense_vio"))
    check_packet(ds[0], expect_depth=True)
    assert ds.preload_imu().shape == (3, 7)


def test_phone_vio_jpg_fallback_png(tmp_path):
    write_frames(tmp_path / "rgb", ["0.png", "1.png"])
    os.makedirs(tmp_path / "depth")
    np.save(tmp_path / "depth" / "0.npy", np.ones((48, 64), np.float32))
    ds = get_dataset(base_cfg(tmp_path, "phone_vio"))
    assert len(ds) == 2
    check_packet(ds[0], expect_depth=True)
    assert "depth" not in ds[1] or ds[1]["depth"] is not None


def test_live_folder_rotation_and_growth(tmp_path):
    # frame 0 exists up front; the loader reports an unbounded length and
    # re-scans the folder on fetch (reference phone.py:30-90)
    write_frames(tmp_path / "cam0", ["000000.png"])
    ds = get_dataset(base_cfg(tmp_path, "phone"))
    assert len(ds) == 1000000
    check_packet(ds[0])
    write_frames(tmp_path / "cam0", ["000000.png", "000001.png"])
    check_packet(ds[1])


def test_phone_server_push(tmp_path):
    ds = get_dataset(base_cfg(tmp_path, "phone_server"))
    rec = {"rgb": np.zeros((64, 48, 3), np.uint8), "timestamp": 3.25}
    pkt = ds.load_rgb(rec, 0)
    check_packet(pkt)
    assert ds.timestamps == [3.25]
    with pytest.raises(RuntimeError):
        ds[0]


def test_kitti_sync_nosky_paths(tmp_path):
    os.makedirs(tmp_path / "metadata")
    with open(tmp_path / "metadata" / "camstamp.txt", "w") as f:
        f.write("0.0 x.png\n0.1 y.png\n")
    np.savetxt(tmp_path / "metadata" / "c2i.txt", np.eye(4))
    np.savetxt(tmp_path / "metadata" / "imu.txt", np.zeros((3, 7)))
    write_frames(tmp_path / "image_02" / "data_nosky", ["x.png", "y.png"])
    ds = get_dataset(base_cfg(tmp_path, "kitti_sync_nosky"))
    assert "data_nosky" in ds.rgb_files[0]
    check_packet(ds[0])
