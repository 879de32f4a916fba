"""Multi-device sharding: the dp/sp mapper train step must compile and run
on the 8-virtual-CPU mesh (mirrors the driver's dryrun)."""

import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip(cpu_devices):
    # no monkeypatching: dryrun_multichip itself must fall back to the cpu
    # backend's virtual devices (exactly what the driver environment needs)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def _tile_step_inputs(cpu_devices, n_dev):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vings_mono_tpu.mapper.state import empty_state, adam_init
    from vings_mono_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh(devices=cpu_devices[:n_dev], dp=n_dev)
    H = W = 32
    K = 8
    rng = np.random.default_rng(3)
    state = empty_state(512)
    n = 200
    z = rng.uniform(2.0, 6.0, size=n).astype(np.float32)
    xyz = np.stack([(rng.uniform(0, 1, n) - 0.5) * z,
                    (rng.uniform(0, 1, n) - 0.5) * z, z], -1)
    state = state.replace(
        xyz=state.xyz.at[:n].set(jnp.asarray(xyz)),
        rgb=state.rgb.at[:n].set(
            jnp.asarray(rng.uniform(0, 1, (n, 3)), np.float32)),
        log_scale=state.log_scale.at[:n].set(-1.5),
        logit_opacity=state.logit_opacity.at[:n].set(1.0),
        alive=state.alive.at[:n].set(True))
    opt = adam_init(state)
    images = jnp.asarray(rng.uniform(0, 1, (K, 3, H, W)), jnp.float32)
    depths = jnp.asarray(rng.uniform(2, 6, (K, 1, H, W)), jnp.float32)
    covs = jnp.full((K, 1, H, W), 0.01, jnp.float32)
    w2cs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1))
    intr4 = jnp.asarray([30.0, 30.0, W / 2, H / 2], jnp.float32)
    with mesh:
        state, opt = replicate(mesh, (state, opt))
        sh = NamedSharding(mesh, P("dp"))
        batch = [jax.device_put(x, sh) for x in
                 (images, depths, covs, w2cs)]
    return mesh, state, opt, batch, intr4, H, W


@pytest.mark.slow
def test_sharded_tile_step_matches_single_device(cpu_devices):
    """The dp-sharded Pallas-tile mapper step must be numerically identical
    to the same step on a 1-device mesh (VERDICT r1 item 3)."""
    import jax
    from vings_mono_tpu.parallel.mesh import (sharded_tile_grads,
                                              sharded_tile_train_step)

    outs = []
    for n_dev in (1, 8):
        mesh, state, opt, batch, intr4, H, W = _tile_step_inputs(
            cpu_devices, n_dev)
        with mesh:
            grads, vis, loss = sharded_tile_grads(
                state, opt, *batch, intr4, mesh=mesh, height=H, width=W,
                interpret=True)
            s2, o2, loss2 = sharded_tile_train_step(
                state, opt, *batch, intr4, mesh=mesh, height=H, width=W,
                interpret=True)
        assert np.isfinite(float(loss2))
        outs.append((jax.device_get(grads), np.asarray(vis), float(loss)))
    g1, v1, l1 = outs[0]
    g8, v8, l8 = outs[1]
    assert abs(l1 - l8) < 1e-5 * max(1.0, abs(l1))
    np.testing.assert_array_equal(v1, v8)
    for k in g1:
        np.testing.assert_allclose(g1[k], g8[k], rtol=2e-4, atol=1e-6)


def test_mesh_dp_psum_fast(cpu_devices):
    """Fast-lane parallel coverage: make_mesh + replicate + a dp-sharded
    shard_map psum must run on the 8-virtual-CPU mesh (the cheap core of
    what the slow equality test exercises end-to-end)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from vings_mono_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh(devices=cpu_devices, dp=8)
    x = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
    w = jnp.ones((4,), jnp.float32) * 2.0
    with mesh:
        (w_rep,) = replicate(mesh, (w,))
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

        def step(xs, w):
            local = jnp.sum(xs * w[None, :])
            return jax.lax.psum(local, "dp")

        out = shard_map(step, mesh=mesh, in_specs=(P("dp"), P()),
                        out_specs=P())(xs, w_rep)
    np.testing.assert_allclose(float(out), float(jnp.sum(x) * 2.0),
                               rtol=1e-6)


def test_entry_compiles_cpu(cpu_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    import jax
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))


@pytest.mark.slow
def test_mapper_dp_product_path(cpu_devices, tmp_path):
    """PRODUCT multi-device path (VERDICT r3 #3): GaussianMapper built with
    config `parallel: {dp: 2}` routes binning + the train loop through the
    dp mesh (dp_bin_stack / dp_train_loop) and produces a finite,
    replicated map on a real viz_out window."""
    import jax
    import jax.numpy as jnp
    from vings_mono_tpu.mapper.mapper import GaussianMapper
    from vings_mono_tpu.utils.config import load_config

    H, W = 32, 48
    cfg = load_config(overrides={
        "training_args": {"iters": 4, "num_keyframe": 3},
        "mapper": {"capacity": 2048, "pair_capacity": 2048, "chunk": 64,
                   "kf_capacity": 4, "points_per_frame": 128,
                   "points_first_frame": 256, "impl": "tile",
                   "interpret": True, "visible_capacity": 512},
        "parallel": {"dp": 2, "platform": "cpu"},
    })
    mapper = GaussianMapper(cfg)
    assert mapper.mesh is not None and mapper.mesh.shape["dp"] == 2

    rng = np.random.default_rng(7)
    K = 3
    depths = rng.uniform(2.0, 5.0, (K, H, W, 1)).astype(np.float32)
    viz_out = {
        "images": rng.uniform(0, 1, (K, H, W, 3)).astype(np.float32),
        "depths": depths,
        "depths_cov": np.full((K, H, W, 1), 0.01, np.float32),
        "poses": np.tile(np.eye(4, dtype=np.float32)[None], (K, 1, 1)),
        "viz_out_idx_to_f_idx": np.arange(K, dtype=np.float64),
        "global_kf_id": np.arange(K, dtype=np.int64),
        "intrinsic": {"fu": 40.0, "fv": 40.0, "cu": H / 2, "cv": W / 2,
                      "H": H, "W": W},
    }
    mapper.run(viz_out)
    assert mapper.initialized and mapper.n_alive > 50
    m = mapper.last_metrics
    assert np.isfinite(m["total"]) and np.isfinite(m["psnr"])
    # state must be mesh-replicated and finite
    assert len(mapper.state.xyz.sharding.device_set) == 2
    assert bool(jnp.all(jnp.isfinite(mapper.state.xyz)))
