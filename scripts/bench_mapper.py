"""Fine-grained mapper stage timings at bench scale on the real chip."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.mapper.train import (KeyframeBatch, bin_stack,
                                         train_loop, storage_control)
from vings_mono_tpu.mapper.densify import add_frame
from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

H, W = 240, 432
cfg = load_config(overrides={
    "training_args": {"iters": 50, "num_keyframe": 5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 128, "side": 3, "visible_capacity": 1 << 16,
               "kf_capacity": 8,
               "points_per_frame": 20000, "points_first_frame": 30000},
})
mapper = GaussianMapper(cfg)
rng = np.random.default_rng(0)
K = 8


def mkbatch():
    imgs = jnp.asarray(rng.uniform(0, 1, (K, 3, H, W)), jnp.float32)
    depths = jnp.asarray(rng.uniform(2, 20, (K, 1, H, W)), jnp.float32)
    covs = jnp.full((K, 1, H, W), 0.01, jnp.float32)
    w2cs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1))
    w2cs = w2cs.at[:, 0, 3].set(jnp.arange(K) * 0.1)
    return KeyframeBatch(images=imgs, depths=depths, depths_cov=covs,
                         w2cs=w2cs, global_kf_id=jnp.arange(K,
                                                            dtype=jnp.int32),
                         n_valid=jnp.asarray(K, jnp.int32))


batch = mkbatch()
intr4 = jnp.asarray([220.0, 220.0, W / 2, H / 2], jnp.float32)
key = jax.random.PRNGKey(0)

# populate the map
for i in range(2):
    mapper.state, mapper.opt, n, _ = add_frame(
        mapper.state, mapper.opt, batch.w2cs[i], intr4, batch.images[i],
        batch.depths[i], jax.random.fold_in(key, i),
        batch.global_kf_id[i], height=H, width=W, n_points=30000,
        first=True, render_kwargs=mapper.render_kwargs)
jax.block_until_ready(mapper.state.xyz)
print("alive", int(mapper.state.n_alive()), flush=True)


def timeit(name, f, n=3):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms",
          flush=True)
    return out


binned = timeit("bin_stack(8 kf)", lambda: bin_stack(
    mapper.state, batch, intr4, H, W, **mapper.bin_kwargs))

timeit("add_frame", lambda: add_frame(
    jax.tree.map(jnp.array, mapper.state),       # add_frame donates (0, 1)
    jax.tree.map(jnp.array, mapper.opt),
    batch.w2cs[2], intr4, batch.images[2],
    batch.depths[2], key, batch.global_kf_id[2], height=H, width=W,
    n_points=20000, first=False, render_kwargs=mapper.render_kwargs), n=2)

import copy
for iters in [1, 10, 50]:
    def run_train(it=iters):
        # train_loop donates state/opt; time on fresh copies
        st = jax.tree.map(jnp.array, mapper.state)
        op = jax.tree.map(jnp.array, mapper.opt)
        return train_loop(st, op, batch, binned, intr4, key, iters=it,
                          height=H, width=W,
                          render_kwargs=mapper.render_kwargs)
    timeit(f"train_loop iters={iters}", run_train, n=2)

timeit("storage_control", lambda: storage_control(
    jax.tree.map(jnp.array, mapper.state),       # donates (0,)
    batch, binned, intr4, height=H, width=W,
    render_kwargs=mapper.render_kwargs), n=2)
