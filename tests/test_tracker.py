"""Tracker machinery test: frames stream in, the frontend initializes,
edges are proposed/aged, GRU+BA updates run, rollup and keyframe-removal
paths execute — all with random DroidNet weights (no pretrained checkpoint
ships in this environment), so this validates the plumbing, shapes and
numerical sanity rather than trajectory accuracy (ops-level accuracy is
covered by test_ba.py / test_frontend_nets.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vings_mono_tpu.tracker.tracker import Tracker
from vings_mono_tpu.utils.config import load_config

H, W = 64, 96


def make_cfg():
    return load_config(overrides={
        "mode": "vo",
        "frontend": {
            "buffer": 24, "warm_up": 8, "filter_thresh": -1.0,  # always KF
            "keyframe_thresh": 0.0,   # never remove (random weights)
            "frontend_thresh": 1e9,   # accept all proximity edges
            "frontend_window": 10, "frontend_radius": 2, "frontend_nms": 1,
            "max_factors": 24, "edge_capacity": 36, "inactive_capacity": 48,
            "ba_window": 12, "iters1": 1, "iters2": 1,
            "active_window": 10, "max_age": 8,
            "rollup_at": 14, "rollup_n": 4, "save_buffer": 64,
        },
    })


def frames(n, rng):
    """Shifting smooth pattern so features aren't constant."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for k in range(n):
        img = 0.5 + 0.5 * np.sin(0.11 * (xs + 3.5 * k)) * \
            np.cos(0.07 * (ys + 1.5 * k))
        rgb = np.stack([img, img * 0.8, img * 0.6], -1).astype(np.float32)
        yield {"timestamp": float(k), "rgb": rgb,
               "intrinsic": np.asarray([80.0, 80.0, W / 2, H / 2],
                                       np.float32)}


@pytest.fixture(scope="module")
def tracked():
    tr = Tracker(make_cfg(), H, W)
    for pkt in frames(16, np.random.default_rng(0)):
        tr.track(pkt)
    return tr


def test_frontend_initializes_and_tracks(tracked):
    tr = tracked
    assert tr.frontend.is_initialized
    assert tr.video.counter >= 9
    assert len(tr.graph.ii) > 0
    poses = np.asarray(tr.video.bufs.poses[:tr.video.counter])
    assert np.all(np.isfinite(poses))
    disps = np.asarray(tr.video.bufs.disps[:tr.video.counter])
    assert np.all(np.isfinite(disps)) and np.all(disps >= 0)


def test_rollup_spilled_to_save_buffers(tracked):
    tr = tracked
    assert tr.video.count_save > 0          # rollup_at=14 must have fired
    assert np.all(np.isfinite(tr.video.poses_save[:tr.video.count_save]))
    assert len(tr.video.tstamps_host) == tr.video.counter


def test_edge_lists_consistent(tracked):
    g = tracked.graph
    assert len(g.ii) == len(g.jj) == len(g.age) == len(g.slot)
    assert len(set(g.slot.tolist())) == len(g.slot)   # unique slots
    assert np.all(g.ii < tracked.video.counter)
    assert np.all(g.jj < tracked.video.counter)
    assert np.all(g.ii >= 0) and np.all(g.jj >= 0)


def test_keyframe_removal_path():
    cfg = make_cfg()
    cfg["frontend"]["keyframe_thresh"] = 1e9   # always remove
    tr = Tracker(cfg, H, W)
    for pkt in frames(12, np.random.default_rng(1)):
        tr.track(pkt)
    # every post-warmup frame got culled -> counter pinned near warmup
    assert tr.video.counter <= 10
    assert np.all(np.isfinite(np.asarray(
        tr.video.bufs.poses[:tr.video.counter])))


def test_prefetched_proximity_matches_sync():
    """The end-of-frame proximity-distance prefetch must propose exactly
    the edges the blocking query would: run the same frame stream with the
    prefetch force-disabled and compare the edge lists per frame."""
    from vings_mono_tpu.tracker.frontend import Frontend

    tr_pre = Tracker(make_cfg(), H, W)
    tr_syn = Tracker(make_cfg(), H, W)
    tr_syn.frontend._prefetch_proximity = lambda: None   # force sync path

    for pkt in frames(16, np.random.default_rng(0)):
        tr_pre.track(pkt)
        tr_syn.track(dict(pkt))
        np.testing.assert_array_equal(tr_pre.graph.ii, tr_syn.graph.ii)
        np.testing.assert_array_equal(tr_pre.graph.jj, tr_syn.graph.jj)
        np.testing.assert_array_equal(tr_pre.graph.ii_inac,
                                      tr_syn.graph.ii_inac)
    # the prefetch actually fired in steady state (consumed, not just built)
    assert getattr(tr_pre.graph, "_prox_hits", 0) > 4
    assert getattr(tr_syn.graph, "_prox_hits", 0) == 0


def test_keyframe_distance_prefetch_consumed():
    """The end-of-frame keyframe-distance prefetch (the gated lane's
    per-frame ~30-40 ms tunnel sync, VERDICT r3 perf lever a) must
    actually be consumed in steady state, and the gated pipeline must
    stay finite."""
    cfg = make_cfg()
    cfg["frontend"]["keyframe_thresh"] = 0.1   # keep most, but decide
    tr = Tracker(cfg, H, W)
    for pkt in frames(14, np.random.default_rng(2)):
        tr.track(pkt)
    assert getattr(tr.frontend, "_kf_dist_hits", 0) >= 3
    assert np.all(np.isfinite(np.asarray(
        tr.video.bufs.poses[:tr.video.counter])))


def test_cv_seed_kernel_constant_velocity():
    """Constant-velocity seeding (r5): with two poses one twist apart,
    the seeded slot must continue the motion; alpha=0 falls back to the
    identity-motion seed (the reference's VO behavior)."""
    from vings_mono_tpu.tracker.video import empty_buffers
    from vings_mono_tpu.tracker.frontend import _seed_next_kernel
    from vings_mono_tpu.ops import lie

    def mk():
        bufs = empty_buffers(16, 48, 64)
        p0 = lie.se3_identity()
        xi = jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.2, 0.0])
        p1 = lie.se3_mul(lie.se3_exp(xi), p0)
        return (bufs.replace(poses=bufs.poses.at[0].set(p0)
                             .at[1].set(p1)), p1, xi)

    bufs, p1, xi = mk()
    out = _seed_next_kernel(bufs, jnp.asarray([2, 0], np.int32), 1.0)
    expect = lie.se3_mul(lie.se3_exp(xi), p1)
    assert np.allclose(out.poses[2], expect, atol=1e-5)

    bufs2, p1b, _ = mk()
    out0 = _seed_next_kernel(bufs2, jnp.asarray([2, 0], np.int32), 0.0)
    assert np.allclose(out0.poses[2], p1b, atol=1e-7)

    # init flag keeps the identity seed even with alpha on
    bufs3, p1c, _ = mk()
    outi = _seed_next_kernel(bufs3, jnp.asarray([2, 1], np.int32), 1.0)
    assert np.allclose(outi.poses[2], p1c, atol=1e-7)
