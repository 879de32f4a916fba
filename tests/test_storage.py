"""Storage manager: distance-based eviction to host and page-in back to the
device map (mirrors the reference's FakeTracker debug harness,
run_multiprocess_novis.py:27-40)."""

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.state import empty_state, adam_init
from vings_mono_tpu.storage.manager import StorageManager
from vings_mono_tpu.utils.config import load_config


class FakeMapper:
    def __init__(self, cap=512):
        self.state = empty_state(cap)
        self.opt = adam_init(self.state)
        self.initialized = True
        self._binned = object()  # sentinel: page-in must clear it
        self._binned_c = object()

    def invalidate_binning(self):
        self._binned = None
        self._binned_c = None


class FakeVideo:
    def __init__(self, poses_save, count_save):
        self.poses_save = poses_save
        self.count_save = count_save

    def c2w_matrices(self):
        return np.tile(np.eye(4), (0, 1, 1))


class FakeTracker:
    def __init__(self, poses_save, count_save):
        self.video = FakeVideo(poses_save, count_save)


def make_viz(cur_c2w, last_gid):
    return {"poses": np.stack([cur_c2w]),
            "global_kf_id": np.asarray([last_gid])}


def test_storage_roundtrip():
    cfg = load_config(overrides={
        "storage_manager": {"distance_threshold": 10.0}})
    mgr = StorageManager(cfg)
    mapper = FakeMapper()

    # 200 gaussians: kf 0 at origin, kf 1 at x=50
    n = 200
    xyz = np.zeros((n, 3), np.float32)
    xyz[100:, 0] = 50.0
    gid = np.zeros(n, np.int32)
    gid[100:] = 1
    s = mapper.state
    mapper.state = s.replace(
        xyz=s.xyz.at[:n].set(jnp.asarray(xyz)),
        alive=s.alive.at[:n].set(True),
        globalkf_id=s.globalkf_id.at[:n].set(jnp.asarray(gid)),
        stable=s.stable.at[:50].set(True))

    # keyframe w2c poses: kf0 at origin, kf1 at x=50 (tq format, w2c)
    poses_save = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32),
                         (3, 1))
    poses_save[1, 0] = -50.0    # w2c translation for c2w at x=50
    tracker = FakeTracker(poses_save, count_save=2)

    # camera at origin: kf1 (50m away) evicts
    cur = np.eye(4)
    mgr.run(tracker, mapper, make_viz(cur, last_gid=2))
    assert mgr.n_host == 100
    assert int(mapper.state.n_alive()) == 100
    assert mgr.place[1] == 0 and mgr.place[0] == 1

    # camera moves to x=50: kf1 pages back in, kf0 evicts
    cur2 = np.eye(4)
    cur2[0, 3] = 50.0
    mgr.run(tracker, mapper, make_viz(cur2, last_gid=2))
    assert int(mapper.state.n_alive()) == 100
    assert mgr.place[1] == 1 and mgr.place[0] == 0
    # paged-in gaussians carry their attribution and stability
    st = mapper.state
    alive = np.asarray(st.alive)
    assert np.all(np.asarray(st.globalkf_id)[alive] == 1)
    # page-in revives rows no cached binning contains — the cache must go
    assert mapper._binned is None
    assert mgr.n_host == 100
    assert np.asarray(mgr.host["stable"]).sum() == 50


import pytest


@pytest.mark.slow
def test_storage_paging_stress():
    """Long-trajectory paging stress (reference design point: 60-70 m
    radius over km-scale scenes, storage_manage.py:94-107): 500 keyframes
    x 500 Gaussians = 250k rows, camera sweeps the 500 m trajectory out
    and back 3 times, forcing >=3 evict/page-in cycles per keyframe.
    Asserts conservation (alive + host == total) at every step, exact
    field restoration after round trips (which implies unchanged renders,
    given the binning-cache invalidation also asserted here), and that
    every page-in invalidated the binning cache."""
    n_kf, per_kf = 500, 500
    total = n_kf * per_kf
    cfg = load_config(overrides={
        "storage_manager": {"distance_threshold": 60.0}})
    mgr = StorageManager(cfg)
    mapper = FakeMapper(cap=1 << 18)

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(total, 3)).astype(np.float32)
    xyz[:, 0] += np.repeat(np.arange(n_kf, dtype=np.float32), per_kf)
    rgb = rng.uniform(size=(total, 3)).astype(np.float32)
    quat = rng.normal(size=(total, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    gid = np.repeat(np.arange(n_kf, dtype=np.int32), per_kf)
    stable = rng.uniform(size=total) < 0.5
    gms = rng.uniform(size=total).astype(np.float32)
    s = mapper.state
    mapper.state = s.replace(
        xyz=s.xyz.at[:total].set(jnp.asarray(xyz)),
        rgb=s.rgb.at[:total].set(jnp.asarray(rgb)),
        quat=s.quat.at[:total].set(jnp.asarray(quat)),
        alive=s.alive.at[:total].set(True),
        globalkf_id=s.globalkf_id.at[:total].set(jnp.asarray(gid)),
        stable=s.stable.at[:total].set(jnp.asarray(stable)),
        globalkf_max_scores=s.globalkf_max_scores.at[:total].set(
            jnp.asarray(gms)))

    # original per-gid row sets, keyed for order-independent comparison
    orig0 = np.lexsort(xyz[gid == 0].T)

    # keyframe k sits at x = k  ->  w2c translation = -k
    poses_save = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32),
                         (n_kf, 1))
    poses_save[:, 0] = -np.arange(n_kf, dtype=np.float32)
    tracker = FakeTracker(poses_save, count_save=n_kf)

    path = []
    for _ in range(3):
        path += list(range(0, n_kf, 25)) + list(range(n_kf - 25, -1, -25))
    cycles0 = 0          # device->host->device round trips of keyframe 0
    prev_place0 = 1.0
    for x in path:
        cur = np.eye(4)
        cur[0, 3] = float(x)
        mapper._binned = object()    # fresh sentinel per step
        mgr.run(tracker, mapper, make_viz(cur, last_gid=n_kf))
        assert int(mapper.state.n_alive()) + mgr.n_host == total
        p0 = mgr.place[0]
        if prev_place0 == 0 and p0 == 1:
            cycles0 += 1
            assert mapper._binned is None   # page-in must drop the cache
        prev_place0 = p0
    assert cycles0 >= 3, cycles0

    # camera ends at x=0: keyframe 0 is resident — its rows must be
    # bit-identical to the originals after 3 round trips
    st = jax.device_get(mapper.state)
    alive = np.asarray(st.alive)
    g = np.asarray(st.globalkf_id)
    m0 = alive & (g == 0)
    assert m0.sum() == per_kf
    got_xyz = np.asarray(st.xyz)[m0]
    order = np.lexsort(got_xyz.T)
    ox = xyz[gid == 0]
    np.testing.assert_allclose(got_xyz[order], ox[orig0], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st.rgb)[m0][order],
                               rgb[gid == 0][orig0], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st.quat)[m0][order],
                               quat[gid == 0][orig0], rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(st.stable)[m0][order],
                                  stable[gid == 0][orig0])
    np.testing.assert_allclose(
        np.asarray(st.globalkf_max_scores)[m0][order],
        gms[gid == 0][orig0], rtol=0, atol=0)
    # far keyframes are on host, near ones on device
    assert np.all(mgr.place[:40] == 1)
    assert np.all(mgr.place[100:] == 0)
