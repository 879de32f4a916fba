"""Storage manager: distance-based eviction to host and page-in back to the
device map (mirrors the reference's FakeTracker debug harness,
run_multiprocess_novis.py:27-40)."""

import numpy as np
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
