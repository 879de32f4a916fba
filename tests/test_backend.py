"""Global BA terminate pass (tracker/backend.py): with oracle flow
targets, the full-trajectory solve must pull drifted poses back to the
ground truth (reference visual_frontend.py:1460-1542 backend/terminate)."""

import jax
import jax.numpy as jnp
import numpy as np

from vings_mono_tpu.ops import lie, projective as pops
from vings_mono_tpu.tracker.backend import GlobalBA
from vings_mono_tpu.tracker.video import DepthVideo
from vings_mono_tpu.utils.config import load_config

H, W = 64, 96
h, w = H // 8, W // 8
F = 40.0


class _OracleFnet:
    def __call__(self, params, img):
        B = img.shape[0]
        return jnp.zeros((B, img.shape[1] // 8, img.shape[2] // 8, 128))


class _OracleCnet:
    def __call__(self, params, img):
        B = img.shape[0]
        z = jnp.zeros((B, img.shape[1] // 8, img.shape[2] // 8, 128))
        return z, z


class _OracleUpdate:
    """delta = (seeded GT target) - coords1, recovered from the motion
    features: motn = [coords1-coords0, tgt_old-coords1]."""

    def __call__(self, params, net, inp, corr, motn, ii, num_frames,
                 upsample):
        delta = motn[..., 2:4]
        weight = jnp.ones_like(delta)
        eta = jnp.full((num_frames,) + net.shape[1:3], 1e-2, jnp.float32)
        upmask = jnp.zeros((num_frames,) + net.shape[1:3] + (576,),
                           jnp.float32)
        return net, delta, weight, eta, upmask


class _FakeTracker:
    pass


def _ate(poses_tq, gt_tq):
    t = np.asarray(lie.se3_matrix(lie.se3_inv(jnp.asarray(
        poses_tq))))[:, :3, 3]
    g = np.asarray(lie.se3_matrix(lie.se3_inv(jnp.asarray(
        gt_tq))))[:, :3, 3]
    return float(np.sqrt(((t - g) ** 2).sum(-1).mean()))


def _scalar_build_edges(gba, T, poses, disps, intr8):
    """The pre-vectorization dense O(T^2) edge proposal, kept verbatim as
    the behavioral spec for `_build_edges` (VERDICT r2 next-step 6)."""
    from vings_mono_tpu.tracker.backend import _distance_chunk
    dev_poses = jnp.asarray(poses, jnp.float32)
    dev_disps = jnp.asarray(disps, jnp.float32)
    dev_intr = jnp.tile(jnp.asarray(intr8)[None], (T, 1))
    pairs = [(i, j) for i in range(T) for j in range(T)
             if i != j and abs(i - j) <= 64]
    pair_cap = 1 << max(6, (len(pairs) - 1).bit_length())
    pi = np.zeros(pair_cap, np.int32)
    pj = np.zeros(pair_cap, np.int32)
    pi[:len(pairs)] = [p[0] for p in pairs]
    pj[:len(pairs)] = [p[1] for p in pairs]
    d = np.asarray(jax.device_get(_distance_chunk(
        dev_poses, dev_disps, dev_intr, jnp.asarray(pi), jnp.asarray(pj),
        pair_cap=pair_cap)))
    dmat = np.full((T, T), np.inf, np.float32)
    for k, (i, j) in enumerate(pairs):
        dmat[i, j] = d[k]
    deg = np.zeros(T, np.int64)
    sel = set()

    def try_add(i, j):
        if (i, j) in sel or deg[i] >= gba.d_cap or deg[j] >= gba.d_cap:
            return
        sel.add((i, j))
        sel.add((j, i))
        deg[i] += 1
        deg[j] += 1

    for i in range(T - 1):
        try_add(i, i + 1)
    cand = []
    for i in range(T):
        for j in range(i + gba.radius, T):
            dd = 0.5 * (dmat[i, j] + dmat[j, i])
            if np.isfinite(dd) and dd < gba.thresh:
                cand.append((dd, i, j))
    cand.sort()
    suppressed = np.zeros((T, T), bool)
    for dd, i, j in cand:
        if suppressed[i, j]:
            continue
        before = len(sel)
        try_add(i, j)
        if len(sel) > before:
            suppressed[max(0, i - gba.nms):min(T, i + gba.nms + 1),
                       max(0, j - gba.nms):min(T, j + gba.nms + 1)] = True
    ii = np.asarray([e[0] for e in sorted(sel)], np.int32)
    jj = np.asarray([e[1] for e in sorted(sel)], np.int32)
    return ii, jj


def _loopy_trajectory(rng, T, hh=6, ww=8, f=8.0):
    """Circle-ish trajectory so some far-in-index pairs are close in flow."""
    xi = np.zeros((T, 6), np.float32)
    for k in range(T):
        ang = 2 * np.pi * k / max(T - 1, 1)
        xi[k, 0] = 2.0 * np.sin(ang)
        xi[k, 1] = 2.0 * (1 - np.cos(ang))
        xi[k, 5] = 0.2 * np.sin(2 * ang)
    xi += rng.normal(size=xi.shape).astype(np.float32) * 0.01
    poses = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    disps = rng.uniform(0.25, 0.5, size=(T, hh, ww)).astype(np.float32)
    intr8 = np.asarray([f, f, ww / 2, hh / 2], np.float32)
    return poses, disps, intr8


def test_build_edges_matches_scalar_reference():
    rng = np.random.default_rng(3)
    cfg = load_config(overrides={
        "backend": {"thresh": 6.0, "nms": 2, "radius": 2, "degree_cap": 6}})
    tracker = _FakeTracker()
    tracker.cfg = cfg
    gba = GlobalBA(tracker, cfg)
    for T in (8, 30, 70):     # 70 exercises pairs beyond the 64 band too
        poses, disps, intr8 = _loopy_trajectory(rng, T)
        ii_v, jj_v = gba._build_edges(T, poses, disps, intr8, T)
        ii_s, jj_s = _scalar_build_edges(gba, T, poses, disps, intr8)
        assert set(zip(ii_v.tolist(), jj_v.tolist())) == \
            set(zip(ii_s.tolist(), jj_s.tolist())), T
        np.testing.assert_array_equal(ii_v, ii_s)
        np.testing.assert_array_equal(jj_v, jj_s)


def test_build_edges_scales_to_long_trajectories():
    """T=2000 edge proposal in seconds with O(T*band) memory — the
    reference's design point is 8000-slot save buffers (VERDICT r2 weak
    #5)."""
    import time
    rng = np.random.default_rng(4)
    cfg = load_config(overrides={
        "backend": {"thresh": 3.0, "nms": 2, "radius": 2, "degree_cap": 8}})
    tracker = _FakeTracker()
    tracker.cfg = cfg
    gba = GlobalBA(tracker, cfg)
    T = 2000
    poses, disps, intr8 = _loopy_trajectory(rng, T)
    t0 = time.time()
    ii, jj = gba._build_edges(T, poses, disps, intr8, T)
    wall = time.time() - t0
    assert len(ii) >= 2 * (T - 1)          # consecutive edges always in
    deg = np.bincount(ii, minlength=T)
    assert deg.max() <= gba.d_cap
    assert wall < 120.0, wall              # 1-CPU host headroom; ~seconds


def _banded_problem(rng, T, hh=6, ww=8, f=8.0, edge_band=2, d_cap=8):
    """Synthetic global-BA problem: drifted poses, GT-reprojection targets,
    banded edge set, capped adjacency grouping (mirrors GlobalBA.run).
    Drift is BOUNDED i.i.d. per-frame noise: at T=8000 a random walk
    grows past the tiny test image's field of view (valid-masks zero out
    and no solver can recover anything), while a smooth low-frequency
    perturbation is weakly observable through band-2 neighbor edges (the
    measured reduction after 6 GN iters was only ~16%). High-frequency
    bounded noise is both in-view and fully observable."""
    xi = np.zeros((T, 6), np.float32)
    for k in range(1, T):
        xi[k, :3] = xi[k - 1, :3] + rng.normal(size=3) * 0.05
        xi[k, 3:] = xi[k - 1, 3:] + rng.normal(size=3) * 0.01
    gt_poses = lie.se3_exp(jnp.asarray(xi))
    disps = jnp.asarray(rng.uniform(0.25, 0.5, size=(T, hh, ww)),
                        jnp.float32)
    intr = jnp.tile(jnp.asarray([f, f, ww / 2, hh / 2], jnp.float32)[None],
                    (T, 1))

    amp = np.asarray([0.03, 0.03, 0.03, 0.008, 0.008, 0.008])
    pert = (amp * rng.normal(size=(T, 6))).astype(np.float32)
    pert[0] = 0.0
    drift = lie.se3_retr(gt_poses, jnp.asarray(pert))

    edges = [(i, j) for i in range(T) for j in range(T)
             if i != j and abs(i - j) <= edge_band]
    ii = jnp.asarray([e[0] for e in edges], jnp.int32)
    jj = jnp.asarray([e[1] for e in edges], jnp.int32)
    E = len(edges)
    gi = np.zeros((T, d_cap), np.int32)
    gv = np.zeros((T, d_cap), bool)
    fill = np.zeros(T, np.int64)
    for e in range(E):
        m = edges[e][0]
        gi[m, fill[m]] = e
        gv[m, fill[m]] = True
        fill[m] += 1

    coords, _ = pops.projective_transform(gt_poses, disps, intr, ii, jj)
    target = jnp.moveaxis(coords, -1, 1)
    weight = jnp.ones((E, 2, hh, ww), jnp.float32)
    eta = jnp.full((T, hh, ww), 1e-4, jnp.float32)
    valid = jnp.ones(E, bool)
    free = jnp.arange(T) >= 1
    return (gt_poses, drift, disps, intr, target, weight, eta, ii, jj,
            valid, jnp.asarray(gi), jnp.asarray(gv), free)


def test_ba_global_banded_matches_dense():
    """Banded-storage PCG pose solve == dense Cholesky solve when the band
    covers the whole system (VERDICT r3 #6 'deltas match the dense path')."""
    from vings_mono_tpu.ops import ba as ba_ops
    rng = np.random.default_rng(7)
    T = 12
    (gt, drift, disps, intr, target, weight, eta, ii, jj, valid, gi, gv,
     free) = _banded_problem(rng, T)

    pd, dd = ba_ops.ba_global(target, weight, eta, drift, disps, intr,
                              ii, jj, valid, gi, gv, free, iters=6)
    pb, db = ba_ops.ba_global_banded(target, weight, eta, drift, disps,
                                     intr, ii, jj, valid, gi, gv, free,
                                     iters=6, band=T - 1, cg_iters=400)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pd), atol=5e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dd), atol=5e-3)
    # and both must actually reduce the drift
    e0 = _ate(np.asarray(drift), np.asarray(gt))
    e1 = _ate(np.asarray(pb), np.asarray(gt))
    assert e1 < 0.6 * e0, (e0, e1)


def test_ba_global_banded_long_trajectory():
    """T=8000 (the kitti360 save_buffer scale) through the banded solver —
    the dense path's (T,T,6,6) Hessian would be 9.2 GB; banded storage is
    O(T * band). Must run and reduce drift on a 1-CPU host."""
    from vings_mono_tpu.ops import ba as ba_ops
    rng = np.random.default_rng(8)
    T = 8000
    (gt, drift, disps, intr, target, weight, eta, ii, jj, valid, gi, gv,
     free) = _banded_problem(rng, T)
    pb, _ = ba_ops.ba_global_banded(target, weight, eta, drift, disps,
                                    intr, ii, jj, valid, gi, gv, free,
                                    iters=4, band=4, cg_iters=100)
    e0 = _ate(np.asarray(drift), np.asarray(gt))
    e1 = _ate(np.asarray(pb), np.asarray(gt))
    assert np.isfinite(e1)
    assert e1 < 0.7 * e0, (e0, e1)


def test_global_ba_recovers_drifted_trajectory():
    # local seeded rng: the session-scoped fixture's state depends on which
    # tests ran before, and this problem's conditioning is seed-sensitive
    rng = np.random.default_rng(12)
    T = 6
    xi = np.zeros((T, 6), np.float32)
    for k in range(1, T):
        xi[k, :3] = xi[k - 1, :3] + rng.normal(size=3) * 0.06
        xi[k, 3:] = xi[k - 1, 3:] + rng.normal(size=3) * 0.015
    gt_poses = lie.se3_exp(jnp.asarray(xi))                     # (T, 7) w2c
    gt_disps = jnp.asarray(rng.uniform(0.25, 0.5, size=(T, h, w)),
                           jnp.float32)
    intr8 = np.asarray([F / 8, F / 8, w / 2, h / 2], np.float32)

    # drifted online estimate: growing noise on later frames
    pert = np.zeros((T, 6), np.float32)
    for k in range(1, T):
        pert[k] = pert[k - 1] + rng.normal(size=6) * np.asarray(
            [0.02, 0.02, 0.02, 0.004, 0.004, 0.004])
    drift = lie.se3_retr(gt_poses, jnp.asarray(pert))

    cfg = load_config(overrides={
        "frontend": {"buffer": 8, "save_buffer": 16, "filter_thresh": 0.0,
                     "keyframe_thresh": 0.0},
        "backend": {"steps": 4, "iters": 4, "thresh": 1e9, "chunk": 8,
                    "degree_cap": 6, "encode_batch": 4},
    })
    video = DepthVideo(cfg, H, W)
    ns = 4                                  # 4 saved + 2 live keyframes
    video.count_save = ns
    video.poses_save[:ns] = np.asarray(drift[:ns])
    video.disps_save[:ns] = np.asarray(gt_disps[:ns])
    video.images_save[:ns] = rng.uniform(
        0, 1, size=(ns, H, W, 3)).astype(np.float32)
    nl = T - ns
    video.counter = nl
    video.bufs = video.bufs.replace(
        poses=video.bufs.poses.at[:nl].set(drift[ns:]),
        disps=video.bufs.disps.at[:nl].set(gt_disps[ns:]),
        images=video.bufs.images.at[:nl].set(jnp.asarray(rng.uniform(
            0, 1, size=(nl, H, W, 3)), jnp.float32)),
        intrinsics=video.bufs.intrinsics.at[:].set(jnp.asarray(intr8)))

    tracker = _FakeTracker()
    tracker.video = video
    tracker.cfg = cfg
    tracker.params = {}
    tracker.fnet_apply = _OracleFnet()
    tracker.cnet_apply = _OracleCnet()
    tracker.update_apply = _OracleUpdate()

    gba = GlobalBA(tracker, cfg)

    def gt_targets(ii_p, jj_p):
        coords, _ = pops.projective_transform(
            gt_poses, gt_disps, jnp.tile(jnp.asarray(intr8)[None], (T, 1)),
            jnp.asarray(np.clip(ii_p, 0, T - 1), jnp.int32),
            jnp.asarray(np.clip(jj_p, 0, T - 1), jnp.int32))
        return jnp.moveaxis(coords, -1, 1)

    gba.target_fn = gt_targets

    err0 = _ate(np.concatenate([video.poses_save[:ns],
                                np.asarray(video.bufs.poses[:nl])]),
                np.asarray(gt_poses))
    stats = gba.run()
    assert not stats["skipped"]
    assert stats["edges"] >= T - 1
    after = np.concatenate([video.poses_save[:ns],
                            np.asarray(video.bufs.poses[:nl])])
    err1 = _ate(after, np.asarray(gt_poses))
    assert err1 < 0.55 * err0, (err0, err1)


def test_build_edges_injects_loop_pairs():
    """Accepted online loop closures must enter the terminate-pass edge
    set even when they lie far outside the banded proposal (r5: the
    banded solver widens to the longest edge, so the revisit anchors
    survive into the global solve)."""
    rng = np.random.default_rng(11)
    cfg = load_config(overrides={
        "backend": {"thresh": 3.0, "nms": 2, "radius": 2, "degree_cap": 6,
                    "band": 8}})
    tracker = _FakeTracker()
    tracker.cfg = cfg
    T = 80
    poses, disps, intr8 = _loopy_trajectory(rng, T)
    gba = GlobalBA(tracker, cfg, extra_edges=[(5, 70), (12, 60)])
    ii, jj = gba._build_edges(T, poses, disps, intr8, T)
    got = set(zip(ii.tolist(), jj.tolist()))
    # both directions of both loop pairs, despite |i-j| >> band
    for a, b in [(5, 70), (12, 60)]:
        assert (a, b) in got and (b, a) in got
    # out-of-range pairs are ignored, not fatal
    gba2 = GlobalBA(tracker, cfg, extra_edges=[(-1, 5), (3, 400), (7, 7)])
    ii2, jj2 = gba2._build_edges(T, poses, disps, intr8, T)
    assert len(ii2) > 0
