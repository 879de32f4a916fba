"""End-to-end mapper test on a synthetic scene (the run_mapping.py-style
record/replay harness the reference uses for QA, SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.mapper.losses import psnr
from vings_mono_tpu.utils.config import load_config

from synthetic import make_viz_out, camera_at


def small_cfg():
    return load_config(overrides={
        "mapper": {"capacity": 4096, "pair_capacity": 4096, "chunk": 64,
                   "side": 5, "kf_capacity": 4, "points_per_frame": 512,
                   "points_first_frame": 512, "impl": "naive"},
        "training_args": {"iters": 30, "num_keyframe": 2},
    })


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(3)
    viz_out, gt_params = make_viz_out(rng, n_kf=3)
    mapper = GaussianMapper(small_cfg())
    mapper.run(viz_out)               # init on all 3 kfs + first train
    # stream one more keyframe (same window, new timestamp)
    viz2 = dict(viz_out)
    viz2["viz_out_idx_to_f_idx"] = np.arange(1, 4, dtype=np.float64)
    mapper.run(viz2)
    return mapper, viz_out


def test_mapper_initializes_and_trains(trained):
    mapper, viz_out = trained
    assert mapper.initialized
    assert mapper.n_alive > 200
    assert np.isfinite(mapper.last_metrics["total"])


def test_mapper_psnr_reasonable(trained):
    mapper, viz_out = trained
    w2c = np.linalg.inv(viz_out["poses"][0])
    rets = mapper.render_at(w2c, viz_out["intrinsic"])
    gt = jnp.moveaxis(jnp.asarray(viz_out["images"][0]), -1, 0)
    mask = jnp.asarray(viz_out["depths"][0][..., 0] > 0)
    val = float(psnr(rets["rgb"], gt, mask))
    assert val > 14.0, f"PSNR too low: {val}"


def test_mapper_ply_roundtrip(tmp_path, trained):
    mapper, _ = trained
    from vings_mono_tpu.utils.ply import load_ply
    p = tmp_path / "map.ply"
    mapper.save_ply(str(p))
    d = load_ply(str(p))
    assert d["xyz"].shape[0] == mapper.n_alive
    assert np.all(np.isfinite(d["xyz"]))


def test_mapper_ckpt_roundtrip(tmp_path, trained):
    mapper, viz_out = trained
    p = tmp_path / "ckpt.npz"
    mapper.save_ckpt(str(p))
    m2 = GaussianMapper(small_cfg())
    m2.load_ckpt(str(p))
    assert m2.n_alive == mapper.n_alive
    assert m2.time_idx == mapper.time_idx


@pytest.mark.slow
def test_mapper_with_sky():
    """use_sky path: separate sky sphere trains jointly and composites
    behind the map (sky_utils.py semantics)."""
    rng = np.random.default_rng(5)
    viz_out, _ = make_viz_out(rng, n_kf=3)
    # black out a corner to create "sky" pixels
    viz_out["images"][:, :8, :8, :] = 0.0
    viz_out["depths"][:, :8, :8, :] = 0.0
    cfg = small_cfg()
    cfg["use_sky"] = True
    cfg["mapper"]["sky_capacity"] = 1024
    mapper = GaussianMapper(cfg)
    mapper.run(viz_out)
    assert mapper.sky is not None
    assert int(mapper.sky.state.n_alive()) > 0
    assert np.isfinite(mapper.last_metrics["total"])


@pytest.mark.slow
def test_pose_refinement_recovers_perturbation():
    """refine_poses pulls a perturbed keyframe pose back toward the pose
    that explains the (frozen) map (train_once_pose semantics)."""
    import jax.numpy as jnp
    from vings_mono_tpu.mapper.refine import refine_poses
    from vings_mono_tpu.mapper.train import bin_stack
    from vings_mono_tpu.ops import lie

    rng = np.random.default_rng(7)
    viz_out, _ = make_viz_out(rng, n_kf=3)
    mapper = GaussianMapper(small_cfg())
    mapper.run(viz_out)

    batch = mapper._pack_batch(viz_out)
    intr4 = jnp.asarray([30.0, 30.0, 16.0, 16.0])
    # perturb keyframe 0's pose
    xi = jnp.zeros((batch.w2cs.shape[0], 6)).at[0, 0].set(0.3)
    c2ws = jnp.linalg.inv(batch.w2cs)
    c2ws_pert = jnp.einsum("kij,kjl->kil", c2ws,
                           lie.se3_matrix(lie.se3_exp(xi)))
    batch_pert = batch._replace(w2cs=jnp.linalg.inv(c2ws_pert))
    binned = bin_stack(mapper.state, batch_pert, intr4, 32, 32,
                       **mapper.bin_kwargs)
    new_c2ws, _ = refine_poses(mapper.state, batch_pert, binned, intr4,
                               iters=60, lr=5e-3, height=32, width=32,
                               render_kwargs=mapper.render_kwargs)
    err_before = float(jnp.linalg.norm(c2ws_pert[0, :3, 3]
                                       - c2ws[0, :3, 3]))
    err_after = float(jnp.linalg.norm(new_c2ws[0, :3, 3] - c2ws[0, :3, 3]))
    assert err_after < err_before, (err_before, err_after)


def test_pair_capacity_bucket_hysteresis():
    """Host-side pair-capacity tuning: grow immediately on overflow,
    shrink only after 3 consecutive votes, clamp to [min, max], and
    invalidate the binning cache on any switch."""
    import types
    import jax.numpy as jnp
    from vings_mono_tpu.mapper.mapper import GaussianMapper

    cfg = load_config(overrides={
        "mapper": {"capacity": 4096, "pair_capacity": 1 << 16, "chunk": 64,
                   "side": 3, "kf_capacity": 4, "points_per_frame": 256,
                   "points_first_frame": 256}})
    m = GaussianMapper(cfg)
    assert m.bin_kwargs["p_cap"] == 1 << 16
    assert m._p_cap_min == 1 << 14

    def binned(n, ovf=False):
        # the tuner sizes on the padded slot demand (== n here)
        return types.SimpleNamespace(
            n_pairs=jnp.asarray([n], jnp.int32),
            n_padded=jnp.asarray([n], jnp.int32),
            overflow=jnp.asarray([ovf]))

    # small counts: needs 3 consecutive votes to shrink
    m._binned = "cache"
    m._tune_pair_capacity(binned(1000))
    m._tune_pair_capacity(binned(1000))
    assert m.bin_kwargs["p_cap"] == 1 << 16 and m._binned == "cache"
    m._tune_pair_capacity(binned(1000))
    assert m.bin_kwargs["p_cap"] == 1 << 14      # floor bucket
    assert m._binned is None                      # cache invalidated

    # overflow grows immediately to max
    m._binned = "cache"
    m._tune_pair_capacity(binned(1 << 14, ovf=True))
    assert m.bin_kwargs["p_cap"] == 1 << 16
    assert m._binned is None

    # a mid-size count settles on the covering ladder bucket (15% headroom;
    # the ladder has 1.5x intermediate steps: 16384, 24576, 32768, ...)
    for _ in range(3):
        m._tune_pair_capacity(binned(20000))
    assert m.bin_kwargs["p_cap"] == 24576, m.bin_kwargs["p_cap"]

    # no flip-flop when n hovers just under a bucket boundary: growing is
    # demand-driven (within 2% of cap), not projection-driven
    for _ in range(6):
        m._tune_pair_capacity(binned(23000))
    assert m.bin_kwargs["p_cap"] == 24576, m.bin_kwargs["p_cap"]
    # ... and crossing the 98% line grows one step
    m._tune_pair_capacity(binned(24200))
    assert m.bin_kwargs["p_cap"] == 32768, m.bin_kwargs["p_cap"]


def test_mapper_coarse_to_fine():
    """coarse_frac > 0 runs the first half of the budget at half res on its
    own binning cache/bucket; quality at full res must hold (the fine phase
    sees full-res pixels) and both caches drop on invalidate_binning()."""
    rng = np.random.default_rng(5)
    viz_out, _ = make_viz_out(rng, n_kf=3)
    cfg = small_cfg()
    cfg["training_args"]["coarse_frac"] = 0.5
    mapper = GaussianMapper(cfg)
    mapper.run(viz_out)
    viz2 = dict(viz_out)
    viz2["viz_out_idx_to_f_idx"] = np.arange(1, 4, dtype=np.float64)
    mapper.run(viz2)
    assert mapper._binned_c is not None
    w2c = np.linalg.inv(viz_out["poses"][0])
    rets = mapper.render_at(w2c, viz_out["intrinsic"])
    gt = jnp.moveaxis(jnp.asarray(viz_out["images"][0]), -1, 0)
    mask = jnp.asarray(viz_out["depths"][0][..., 0] > 0)
    val = float(psnr(rets["rgb"], gt, mask))
    assert val > 14.0, f"PSNR too low with coarse-to-fine: {val}"
    mapper.invalidate_binning()
    assert mapper._binned is None and mapper._binned_c is None


def test_half_batch_and_intr():
    """2x2 pooling halves H/W; the pooled intrinsics re-project pooled
    pixel centers onto the same rays (u_half = (u_full - 0.5) / 2)."""
    from vings_mono_tpu.mapper.train import (KeyframeBatch, half_batch,
                                             half_intr4)
    H, W = 8, 12
    imgs = jnp.arange(2 * 3 * H * W, dtype=jnp.float32).reshape(2, 3, H, W)
    b = KeyframeBatch(images=imgs, depths=imgs[:, :1] + 1.0,
                      depths_cov=jnp.ones((2, 1, H, W)),
                      w2cs=jnp.eye(4)[None].repeat(2, 0),
                      global_kf_id=jnp.arange(2), n_valid=jnp.asarray(2),
                      pixel_mask=jnp.ones((2, H, W), bool))
    hb = half_batch(b)
    assert hb.images.shape == (2, 3, H // 2, W // 2)
    assert np.allclose(hb.images[0, 0, 0, 0],
                       np.mean(np.asarray(imgs[0, 0, :2, :2])))
    intr4 = jnp.asarray([30.0, 30.0, W / 2, H / 2], jnp.float32)
    i2 = half_intr4(intr4)
    # the renderer puts pixel centers at INTEGER coords (naive.py:74,
    # ray = (u-cx)/fx); pooled pixel 0 averages full-res pixels {0,1}
    # whose center-of-mass sits at full-res coord 0.5 -> same ray
    ray_full = (0.5 - float(intr4[2])) / float(intr4[0])
    ray_half = (0.0 - float(i2[2])) / float(i2[0])
    assert abs(ray_full - ray_half) < 1e-6


def test_knn_matches_numpy():
    import numpy as np
    import jax.numpy as jnp
    from vings_mono_tpu.ops.knn import knn_mean_sq_dist

    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32) + \
        np.asarray([10.0, -20.0, 35.0], np.float32)   # off-center cloud
    valid = np.ones(300, bool)
    valid[250:] = False
    out = np.asarray(knn_mean_sq_dist(jnp.asarray(pts),
                                      jnp.asarray(valid), chunk=128))
    d = ((pts[:250, None, :] - pts[None, :250, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    ref = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out[:250], ref, rtol=1e-3, atol=1e-5)
    assert np.all(out[250:] == 0.0)


def test_vsearch_left_matches_numpy():
    import numpy as np
    import jax.numpy as jnp
    from vings_mono_tpu.ops.rasterizer.binning import _vsearch_left

    rng = np.random.default_rng(0)
    for n, m, hi in [(1, 5, 3), (7, 16, 4), (1000, 64, 50), (4096, 100, 10)]:
        a = np.sort(rng.integers(0, hi, n)).astype(np.int32)
        v = rng.integers(-1, hi + 2, m).astype(np.int32)
        got = np.asarray(_vsearch_left(jnp.asarray(a), jnp.asarray(v)))
        np.testing.assert_array_equal(got, np.searchsorted(a, v, "left"))
