"""Full flagship pipeline smoke test on CPU: dataset -> tracker ->
middleware -> mapper -> trajectory + ply outputs (reference run.py flow)."""

import os

import numpy as np
import pytest

from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.runners.run import run as run_pipeline


def make_cfg(tmp):
    return load_config(overrides={
        "mode": "vo",
        "dataset": {"module": "synthetic", "n_frames": 14},
        "frontend": {
            "image_size": [48, 64],
            "buffer": 24, "warm_up": 8, "filter_thresh": -1.0,
            "keyframe_thresh": 0.0, "frontend_thresh": 1e9,
            "frontend_window": 8, "frontend_radius": 2, "frontend_nms": 1,
            "max_factors": 16, "edge_capacity": 24, "inactive_capacity": 32,
            "ba_window": 10, "iters1": 1, "iters2": 1,
            "active_window": 8, "max_age": 6,
            "rollup_at": 100, "rollup_n": 4, "save_buffer": 64,
        },
        "training_args": {"iters": 6, "num_keyframe": 3},
        "mapper": {"capacity": 4096, "pair_capacity": 4096, "chunk": 64,
                   "kf_capacity": 4, "points_per_frame": 256,
                   "points_first_frame": 512, "impl": "naive"},
        "middleware": {"max_depth": 1000.0, "cov_times": 1e9},
        "output": {"save_dir": str(tmp)},
    })


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    cfg = make_cfg(tmp_path)
    save_dir = str(tmp_path / "run")
    os.makedirs(os.path.join(save_dir, "ply"), exist_ok=True)
    tracker, mapper, timer = run_pipeline(cfg, save_dir)

    # trajectory written
    pose_files = os.listdir(os.path.join(save_dir, "droid_c2w"))
    assert len(pose_files) >= 8
    m = np.loadtxt(os.path.join(save_dir, "droid_c2w", pose_files[0]))
    assert m.shape == (4, 4) and np.all(np.isfinite(m))

    # mapper produced a map
    assert mapper.initialized
    assert mapper.n_alive > 100
    assert os.path.exists(os.path.join(save_dir, "ply", "final_2dgs.ply"))
    assert os.path.exists(os.path.join(save_dir, "keyframelist.txt"))


@pytest.mark.slow
def test_tracking_then_mapping_replay(tmp_path):
    """run_tracking debug dumps -> run_mapping replay (the reference's own
    integration harness, SURVEY §3.5)."""
    from vings_mono_tpu.runners.run_tracking import run as run_tracking
    from vings_mono_tpu.runners.run_mapping import run as run_mapping

    cfg = make_cfg(tmp_path)
    cfg["debug_mode"] = True
    tdir = str(tmp_path / "trackrun")
    os.makedirs(tdir, exist_ok=True)
    run_tracking(cfg, tdir)
    dumps = os.listdir(os.path.join(tdir, "vizout_dict"))
    assert len(dumps) >= 2

    cfg2 = make_cfg(tmp_path)
    cfg2["dataset"] = {"module": "replay",
                       "root": os.path.join(tdir, "vizout_dict")}
    mdir = str(tmp_path / "maprun")
    os.makedirs(os.path.join(mdir, "ply"), exist_ok=True)
    mapper = run_mapping(cfg2, mdir)
    assert mapper.n_alive > 50


@pytest.mark.slow
def test_pipeline_with_vis_and_storage(tmp_path):
    cfg = make_cfg(tmp_path)
    cfg["use_vis"] = True
    cfg["vis"] = {"map_size": (48, 64), "bev_size": (48, 48)}
    cfg["use_storage_manager"] = True
    cfg["storage_manager"] = {"distance_threshold": 60.0, "every": 5}
    save_dir = str(tmp_path / "visrun")
    os.makedirs(os.path.join(save_dir, "ply"), exist_ok=True)
    tracker, mapper, timer = run_pipeline(cfg, save_dir)
    panels = os.listdir(os.path.join(save_dir, "rgbdnua"))
    assert len(panels) >= 2
    assert os.path.exists(os.path.join(save_dir, "map"))
    maps = os.listdir(os.path.join(save_dir, "map"))
    assert len(maps) >= 1


@pytest.mark.slow
def test_session_checkpoint_resume(tmp_path):
    """Mid-run save_session/load_session: the restored session continues
    tracking and produces identical keyframe counts and finite state."""
    import numpy as np
    import jax.numpy as jnp
    from vings_mono_tpu.datasets.base import get_dataset
    from vings_mono_tpu.tracker.tracker import Tracker
    from vings_mono_tpu.mapper.mapper import GaussianMapper
    from vings_mono_tpu.middleware import judge_and_package
    from vings_mono_tpu.utils.checkpoint import save_session, load_session

    cfg = make_cfg(tmp_path)
    dataset = get_dataset(cfg)
    H, W = 48, 64

    def drive(tracker, mapper, lo, hi):
        for i in range(lo, hi):
            tracker.track(dataset[i])
            viz = judge_and_package(tracker, cfg)
            if viz is not None:
                mapper.run(viz)

    t1 = Tracker(cfg, H, W)
    m1 = GaussianMapper(cfg)
    drive(t1, m1, 0, 11)
    ck = str(tmp_path / "session")
    save_session(ck, t1, m1)
    drive(t1, m1, 11, 14)

    t2 = Tracker(cfg, H, W)
    m2 = GaussianMapper(cfg)
    load_session(ck, t2, m2)
    assert t2.video.counter == 11 or t2.video.counter == t1.video.counter \
        or t2.video.counter > 0
    drive(t2, m2, 11, 14)
    assert t2.video.counter == t1.video.counter
    assert len(t2.video.tstamps_host) == len(t1.video.tstamps_host)
    assert np.all(np.isfinite(np.asarray(
        t2.video.bufs.poses[:t2.video.counter])))
    assert m2.n_alive > 100


@pytest.mark.slow
def test_vo_nerfslam_e2e(tmp_path):
    """vo_nerfslam mode end-to-end (VERDICT r4 ask #7): the NeRF-SLAM-style
    dirty-BA-window packaging (middleware.judge_and_package_nerfslam, ref
    visual_frontend.py:1544-1616) must drive the mapper to a usable map —
    finite poses, a trained map, and a sane render PSNR, not just shapes."""
    from vings_mono_tpu.runners.evaluate import eval_psnr

    cfg = make_cfg(tmp_path)
    cfg["mode"] = "vo_nerfslam"
    # textured stream so PSNR is meaningful (the flat 'synthetic' module's
    # sinusoids converge trivially)
    cfg["dataset"] = {"module": "synthetic3d", "n_frames": 16}
    save_dir = str(tmp_path / "run_nerfslam")
    os.makedirs(os.path.join(save_dir, "ply"), exist_ok=True)
    tracker, mapper, _ = run_pipeline(cfg, save_dir)

    poses = np.asarray(tracker.video.bufs.poses[:tracker.video.counter])
    assert np.all(np.isfinite(poses))
    assert mapper.initialized and mapper.n_alive > 100
    # depths_cov must flow through the nerfslam packaging (its signature
    # feature: per-pixel depth covariance weighting)
    psnr = eval_psnr(mapper, tracker, n_eval=4)
    assert psnr is not None and np.isfinite(psnr)
    assert psnr > 11.0, f"vo_nerfslam map PSNR {psnr}"
