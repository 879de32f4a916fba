"""Aux subsystems: geodesy, dynamic masking, metric-depth interface,
threaded pipeline runner."""

import numpy as np
import pytest

from vings_mono_tpu.utils import geodesy
from vings_mono_tpu.dynamic.dynamic_model import DynamicModel
from vings_mono_tpu.utils.config import load_config


def test_geodesy_roundtrip():
    lat, lon, h = np.radians(48.1), np.radians(11.5), 520.0
    xyz = geodesy.geod2cart(lat, lon, h)
    g = geodesy.cart2geod(xyz)
    np.testing.assert_allclose(g, [lat, lon, h], atol=1e-6)
    # ENU of a point 100m east
    east = geodesy.geod2cart(lat, np.radians(11.5013), h)
    enu = geodesy.ecef_to_enu(east, xyz)
    assert enu[0] > 90 and abs(enu[1]) < 5 and abs(enu[2]) < 5


def test_ypr_roundtrip():
    ypr = np.array([30.0, -10.0, 5.0])
    R = geodesy.ypr2R(ypr)
    np.testing.assert_allclose(geodesy.R2ypr(R), ypr, atol=1e-9)


def test_dynamic_mask_cc():
    pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    pred = gt.copy()
    pred[20:40, 20:40] += 0.5      # a moving object = big coherent error
    dm = DynamicModel(load_config())
    mask = dm.get_dynamic_mask(gt, pred)
    assert mask[25:35, 25:35].mean() > 0.5
    assert mask[:10, :10].mean() < 0.2


def test_metric_depth_npz(tmp_path):
    from vings_mono_tpu.models.metric_depth import MetricDepth
    d = np.full((48, 64), 5.0, np.float32)
    np.save(tmp_path / "000000.npy", d)
    cfg = load_config(overrides={"metric": {"backend": "npz",
                                            "root": str(tmp_path)}})
    md = MetricDepth(cfg)
    out = md.predict(np.zeros((48, 64, 3), np.float32), None)
    np.testing.assert_allclose(out, 5.0)


def test_threaded_pipeline(tmp_path):
    import os
    from vings_mono_tpu.runners.run_multiprocess import run
    cfg = load_config(overrides={
        "mode": "vo",
        "dataset": {"module": "synthetic", "n_frames": 12},
        "frontend": {
            "image_size": [48, 64], "buffer": 24, "warm_up": 8,
            "filter_thresh": -1.0, "keyframe_thresh": 0.0,
            "frontend_thresh": 1e9, "frontend_window": 8,
            "frontend_radius": 2, "frontend_nms": 1, "max_factors": 16,
            "edge_capacity": 24, "inactive_capacity": 32, "ba_window": 10,
            "iters1": 1, "iters2": 1, "active_window": 8, "max_age": 6,
            "rollup_at": 100, "rollup_n": 4, "save_buffer": 64,
        },
        "training_args": {"iters": 4, "num_keyframe": 3},
        "mapper": {"capacity": 4096, "pair_capacity": 4096, "chunk": 64,
                   "kf_capacity": 4, "points_per_frame": 256,
                   "points_first_frame": 512, "impl": "naive"},
        "middleware": {"max_depth": 1000.0, "cov_times": 1e9},
        "output": {"save_dir": str(tmp_path)},
    })
    save_dir = str(tmp_path / "mp")
    os.makedirs(os.path.join(save_dir, "ply"), exist_ok=True)
    tracker, mapper = run(cfg, save_dir)
    assert mapper.initialized and mapper.n_alive > 100
    assert os.path.exists(os.path.join(save_dir, "ply", "final_2dgs.ply"))


def test_onnx_initializer_reader(tmp_path):
    """Hand-encode a minimal ONNX protobuf and read its weights back."""
    import struct
    from vings_mono_tpu.utils.onnx_weights import load_onnx_initializers

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def field(num, wt, payload):
        key = varint((num << 3) | wt)
        if wt == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    tensor = (field(1, 0, varint(2)) + field(1, 0, varint(3))
              + field(2, 0, varint(1))            # float32
              + field(8, 2, b"convPa.weight")
              + field(9, 2, w.tobytes()))
    graph = field(5, 2, tensor)
    model = field(7, 2, graph)
    p = tmp_path / "tiny.onnx"
    p.write_bytes(model)
    weights = load_onnx_initializers(str(p))
    assert "convPa.weight" in weights
    np.testing.assert_array_equal(weights["convPa.weight"], w)


def test_frontend_monitor(tmp_path):
    """Monitor collects per-keyframe state and renders the 1x3 panel."""
    from vings_mono_tpu.utils.monitor import FrontendMonitor

    class _Video:
        counter = 3
        tstamps_host = [0.0, 0.1, 0.2]

        def c2w_matrices(self):
            return np.tile(np.eye(4)[None], (3, 1, 1))

    class _Frontend:
        video = _Video()
        t1 = 3
        inertial = None

    png = tmp_path / "mon.png"
    mon = FrontendMonitor({}, save_path=str(png), live=False)
    mon.record(_Frontend())
    mon.render()
    assert png.exists() and png.stat().st_size > 0
