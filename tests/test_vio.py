"""VIO machinery test: synthetic IMU stream drives preintegration, VI
initialization (gyro bias + gravity/scale alignment) and the multi-sensor
DBA path (TPU vision Hessian -> host factor graph -> depth retraction)."""

import numpy as np
import pytest

from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.tracker.vio import InertialFusion
from vings_mono_tpu.tracker.imu import so3_exp
from vings_mono_tpu.utils.config import load_config

H, W = 64, 96
FPS = 10.0
IMU_HZ = 100.0


def make_cfg():
    return load_config(overrides={
        "mode": "vio",
        "frontend": {
            "buffer": 24, "warm_up": 8, "filter_thresh": -1.0,
            "keyframe_thresh": 0.0, "frontend_thresh": 1e9,
            "frontend_window": 10, "frontend_radius": 2, "frontend_nms": 1,
            "max_factors": 24, "edge_capacity": 36, "inactive_capacity": 48,
            "ba_window": 12, "iters1": 1, "iters2": 1,
            "active_window": 10, "max_age": 8,
            "rollup_at": 100, "rollup_n": 4, "save_buffer": 64,
            "vi_warmup": 10,
        },
    })


def synth_imu(n_seconds=4.0):
    """Wiggly trajectory with strong excitation; IMU rows
    [t, gyro_deg/s x3, acc x3] like the reference's loaders."""
    g = np.array([0.0, 0.0, -9.81])
    dt = 1.0 / IMU_HZ
    n = int(n_seconds * IMU_HZ)
    R = np.eye(3)
    rows = []
    for k in range(n):
        t = k * dt
        w = np.array([0.2 * np.sin(0.8 * t), 0.15, -0.1 * np.cos(0.5 * t)])
        a_world = np.array([1.5 * np.sin(2.0 * t), 1.0 * np.cos(2.0 * t),
                            0.3 * np.sin(1.0 * t)])
        a_body = R.T @ (a_world - g)
        rows.append(np.concatenate([[t], np.rad2deg(w), a_body]))
        R = R @ so3_exp(w * dt)
    return np.asarray(rows)


def frames(n):
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for k in range(n):
        img = 0.5 + 0.5 * np.sin(0.11 * (xs + 3.5 * k)) * \
            np.cos(0.07 * (ys + 1.5 * k))
        rgb = np.stack([img, img * 0.8, img * 0.6], -1).astype(np.float32)
        yield {"timestamp": k / FPS, "rgb": rgb,
               "intrinsic": np.asarray([80.0, 80.0, W / 2, H / 2],
                                       np.float32)}


def test_vio_initializes_and_fuses():
    cfg = make_cfg()
    tr = Tracker(cfg, H, W)
    imu = synth_imu()
    inertial = InertialFusion(tr.video, cfg, imu, np.eye(4))
    tr.frontend.attach_inertial(inertial)
    for pkt in frames(18):
        tr.track(pkt)
    assert tr.frontend.is_initialized
    # VI init must have fired (synthetic IMU has strong excitation)
    assert inertial.vi_init_t1 >= 0, "VI initialization did not trigger"
    assert inertial.imu_enabled and tr.video.imu_enabled
    # states stay finite through the fused multi-sensor BA
    poses = np.asarray(tr.video.bufs.poses[:tr.video.counter])
    assert np.all(np.isfinite(poses))
    disps = np.asarray(tr.video.bufs.disps[:tr.video.counter])
    assert np.all(np.isfinite(disps)) and np.all(disps >= 0)
    for s in inertial.states[:tr.video.counter]:
        assert np.all(np.isfinite(s.p)) and np.all(np.isfinite(s.v))
        assert np.all(np.isfinite(s.b))
    # marginal prior machinery engaged once the window advanced
    assert inertial.last_t1 > 0


def test_vio_gyro_bias_recovery():
    """visual_imu_alignment recovers a synthetic gyro bias when the video
    poses equal ground truth."""
    cfg = make_cfg()
    tr = Tracker(cfg, H, W)
    bg_true = np.array([0.02, -0.01, 0.015])
    imu = synth_imu()
    imu[:, 1:4] += np.rad2deg(bg_true)
    inertial = InertialFusion(tr.video, cfg, imu, np.eye(4))

    # build ground-truth camera poses from the same IMU (bias-free part)
    from vings_mono_tpu.tracker.imu import Preintegration, ImuParams
    import jax.numpy as jnp
    from vings_mono_tpu.ops import lie
    n_kf = 10
    ts = [k / FPS for k in range(n_kf)]
    R = np.eye(3)
    p = np.zeros(3)
    v = np.zeros(3)
    g = np.array([0, 0, -9.81])
    w2cs = []
    kf_i = 0
    state_hist = []
    dt = 1.0 / IMU_HZ
    for row in imu:
        if kf_i < n_kf and row[0] >= ts[kf_i] - 1e-9:
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = p
            w2cs.append(np.linalg.inv(T))
            kf_i += 1
        a_body = row[4:7]
        w = np.deg2rad(row[1:4]) - bg_true
        p = p + v * dt + 0.5 * (R @ a_body + g) * dt**2
        v = v + (R @ a_body + g) * dt
        R = R @ so3_exp(w * dt)
    tq = lie.se3_from_matrix(jnp.asarray(np.asarray(w2cs), jnp.float32))
    tr.video.bufs = tr.video.bufs.replace(
        poses=tr.video.bufs.poses.at[:n_kf].set(tq))
    tr.video.counter = n_kf
    tr.video.tstamps_host = list(ts)
    inertial.init_states()
    ok = inertial.visual_imu_alignment(0, n_kf, ignore_lever=True,
                                       disable_scale=True)
    bg_est = inertial.states[0].b[:3]
    np.testing.assert_allclose(bg_est, bg_true, atol=5e-3)


def _fake_video(t1, disp0=1.0):
    """Minimal stand-in exposing .bufs poses/disps with .replace."""
    import jax.numpy as jnp

    class _Bufs:
        def __init__(self, poses, disps):
            self.poses = poses
            self.disps = disps

        def replace(self, **kw):
            return _Bufs(kw.get("poses", self.poses),
                         kw.get("disps", self.disps))

    class _Video:
        pass

    v = _Video()
    ident = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                     (t1, 1))
    v.bufs = _Bufs(ident, jnp.full((t1, 4, 6), disp0, jnp.float32))
    v.tstamps_host = [float(i) for i in range(t1)]
    return v


def test_gnss_alignment_and_factors():
    """maybe_init_gnss recovers heading + metric scale: body states land on
    the ENU fixes, disparities rescale, and GpsFactors enter the graph."""
    from vings_mono_tpu.tracker import factor_graph as fg
    from vings_mono_tpu.utils import geodesy

    cfg = make_cfg()
    t1 = 10
    video = _fake_video(t1)
    inertial = InertialFusion(video, cfg, synth_imu(1.0), np.eye(4),
                              all_gnss=np.zeros((1, 4)))
    inertial.imu_enabled = True

    # unscaled VIO trajectory along a line
    p_w = np.stack([[i, 0.2 * i, 0.0] for i in range(t1)])
    inertial.states = [fg.FrameState(np.eye(3), p_w[i],
                                     (p_w[1] - p_w[0]) * FPS)
                       for i in range(t1)]
    inertial.preints = [None] * t1
    inertial.odo_meas = [None] * t1

    # GNSS truth: similarity transform of the trajectory (scale 3, yaw 0.7)
    s_true, th = 3.0, 0.7
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    enu = (Rz @ (s_true * (p_w - p_w[0])).T).T
    ten0 = geodesy.geod2cart(np.deg2rad(30.0), np.deg2rad(114.0), 40.0)
    Cen = geodesy.Cen(ten0)
    ecef = ten0[None] + (Cen.T @ enu.T).T
    inertial.gnss_meas = [ecef[i] if i % 2 == 0 else None
                          for i in range(t1)]

    assert inertial.maybe_init_gnss(t1)
    assert inertial.gnss_init_t1 == t1
    for i in range(0, t1, 2):
        assert np.linalg.norm(inertial.states[i].p - enu[i]) < 1e-3, i
    # disparity rescale: world grew by s_true -> disp shrinks by s_true
    d = np.asarray(video.bufs.disps)
    assert np.allclose(d, 1.0 / s_true, atol=1e-4)
    # GNSS position factors now linearize into the window graph
    fs = inertial._aux_factors(0, t1)
    gps = [f for f in fs if isinstance(f, fg.GpsFactor)]
    assert len(gps) == 5
    r, J, Lam = gps[0].linearize({0: inertial.states[0]})
    assert np.linalg.norm(r) < 1e-3


def test_zupt_gate():
    """A >3 s stationary interval with tiny velocity pins the new frame
    with a zero body-velocity measurement."""
    from vings_mono_tpu.tracker import factor_graph as fg
    from vings_mono_tpu.tracker.imu import ImuParams, Preintegration

    cfg = make_cfg()
    cfg["frontend"]["zupt"] = True
    video = _fake_video(4)
    inertial = InertialFusion(video, cfg, np.zeros((0, 7)), np.eye(4))
    inertial.states = [fg.FrameState(np.eye(3), np.zeros(3),
                                     np.full(3, 0.01)) for _ in range(3)]
    inertial.preints = [Preintegration(inertial.params) for _ in range(3)]
    inertial.gnss_meas = [None] * 3
    inertial.odo_meas = [None] * 3
    inertial.preints[1].dt = 4.0      # long stationary interval
    inertial.on_new_frame(4)
    assert inertial.odo_meas[3] is not None
    assert np.allclose(inertial.odo_meas[3], 0.0)


def test_imu_gap_gets_loose_params():
    """A >25 ms gap in the IMU stream inflates the preintegration noise
    (the reference's 'loose' parameter switch)."""
    cfg = make_cfg()
    imu = synth_imu(1.0)
    gappy = np.concatenate([imu[:20], imu[28:]])  # 80 ms hole
    video = _fake_video(4)
    inertial = InertialFusion(video, cfg, gappy, np.eye(4))
    pre_gap = inertial._integrate_interval(0.15, 0.35)
    pre_ok = inertial._integrate_interval(0.5, 0.7)
    # 'loose' scales sigma x10 => covariance x100, matching the reference's
    # covMatrix * 100 (multi_sensor.py:63-65; ADVICE r1 item 2)
    assert pre_gap.params.acc_n == pytest.approx(pre_ok.params.acc_n * 10)
    assert pre_ok.params.acc_n == inertial.params.acc_n
