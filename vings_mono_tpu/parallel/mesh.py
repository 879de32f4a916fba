"""Device-mesh sharding for the mapper's training loop.

The reference's entire "distributed backend" is 2 host processes + an
mp.Queue (SURVEY §2.10); the TPU-native scale-out story is different:
  * dp — keyframes of the training window are sharded across devices; each
    device renders and differentiates its own keyframes and gradients are
    combined by XLA collectives over ICI (psum from the mean-loss),
  * sp — image rows are sharded within a keyframe so one render spreads
    across the `sp` axis (the naive/XLA render path partitions cleanly;
    the Pallas tile kernel runs per-device under dp),
  * Gaussian parameters are replicated (they are the "model"); their
    gradient reduction is the psum XLA inserts.

`make_mesh(n)` builds a (dp, sp) mesh; `sharded_train_step` is one jitted
training step over a keyframe batch with those shardings — this is what the
driver's dryrun_multichip compiles on N virtual devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapper.cameras import make_camera
from ..mapper.losses import mapper_loss
from ..mapper.state import GaussianState, SparseAdamState, sparse_adam_step
from ..ops.rasterizer import render


def make_mesh(n_devices=None, devices=None, dp=None):
    if devices is None:
        devices = jax.devices()[:n_devices]
    n = len(devices)
    if dp is None:
        dp = n if n <= 4 else n // 2
    sp = n // dp
    dev = np.asarray(devices).reshape(dp, sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def shard_batch(mesh: Mesh, batch_tree):
    """Keyframe-leading arrays -> sharded over dp, rows over sp."""
    def put(x):
        if x.ndim >= 3:   # (K, ..., H, W) images: shard K over dp, H over sp
            spec = P("dp", *([None] * (x.ndim - 3)), "sp", None)
        elif x.ndim >= 1:
            spec = P("dp") if x.shape[0] % mesh.shape["dp"] == 0 else P()
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch_tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


@functools.partial(jax.jit, static_argnames=("height", "width", "impl"))
def sharded_train_step(state: GaussianState, opt: SparseAdamState,
                       images, depths, covs, w2cs, intr4, *,
                       height: int, width: int, impl: str = "naive"):
    """One dp-parallel mapper step: every keyframe in the (sharded) batch is
    rendered and differentiated on its own device slice; the mean loss makes
    XLA psum the parameter gradients across the mesh."""
    def loss_fn(params):
        def per_kf(img, dep, cov, w2c):
            cam = make_camera(w2c, intr4, height, width)
            rets = render(params["xyz"], params["log_scale"],
                          params["quat"], params["logit_opacity"],
                          params["rgb"], cam, alive=state.alive, impl=impl,
                          p_cap=4096, chunk=64)
            total, _ = mapper_loss(rets, img, dep, cov, cam)
            return total, rets["visible"]

        totals, vis = jax.vmap(per_kf)(images, depths, covs, w2cs)
        return jnp.mean(totals), jnp.any(vis, axis=0)

    (loss, visible), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params())
    step_mask = visible & state.alive & (~state.stable)
    state, opt = sparse_adam_step(state, grads, opt, step_mask)
    return state, opt, loss


@functools.lru_cache(maxsize=8)
def _build_tile_step(mesh: Mesh, height: int, width: int, interpret: bool,
                     p_cap: int, chunk: int):
    from jax import shard_map

    def per_shard(params, alive, stable, opt, images, depths, covs, w2cs,
                  intr4):
        def loss_fn(p):
            def per_kf(img, dep, cov, w2c):
                cam = make_camera(w2c, intr4, height, width)
                rets = render(p["xyz"], p["log_scale"], p["quat"],
                              p["logit_opacity"], p["rgb"], cam,
                              alive=alive, impl="tile", p_cap=p_cap,
                              chunk=chunk, interpret=interpret)
                total, _ = mapper_loss(rets, img, dep, cov, cam)
                return total, rets["visible"]

            totals, vis = jax.vmap(per_kf)(images, depths, covs, w2cs)
            return jnp.mean(totals), jnp.any(vis, axis=0)

        # local grads of the LOCAL mean, then explicit pmean over dp: the
        # transpose of pmean(loss) alone would leave each device holding
        # only its 1/dp share of the gradient
        (loss, vis), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        grads = jax.lax.pmean(grads, axis_name="dp")
        loss = jax.lax.pmean(loss, axis_name="dp")
        vis = jax.lax.psum(vis.astype(jnp.int32), axis_name="dp") > 0
        return grads, vis, loss

    specs_rep = P()
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(specs_rep, specs_rep, specs_rep, specs_rep,
                  P("dp"), P("dp"), P("dp"), P("dp"), specs_rep),
        out_specs=(specs_rep, specs_rep, specs_rep),
        check_vma=False)

    def step(state, opt, images, depths, covs, w2cs, intr4):
        grads, visible, loss = fn(state.params(), state.alive, state.stable,
                                  opt, images, depths, covs, w2cs, intr4)
        step_mask = visible & state.alive & (~state.stable)
        state, opt = sparse_adam_step(state, grads, opt, step_mask)
        return state, opt, loss

    return jax.jit(step), jax.jit(
        lambda state, opt, *b: fn(state.params(), state.alive, state.stable,
                                  opt, *b))


def sharded_tile_train_step(state: GaussianState, opt: SparseAdamState,
                            images, depths, covs, w2cs, intr4, *,
                            mesh: Mesh, height: int, width: int,
                            interpret: bool = False, p_cap: int = 4096,
                            chunk: int = 128):
    """One dp-parallel mapper step through the FLAGSHIP Pallas tile
    rasterizer: keyframes are sharded over the dp axis via shard_map (each
    device bins + rasterizes its own slice), Gaussian parameters stay
    replicated, and their gradients are psum'd over ICI by the pmean'd
    loss. This is the real multi-chip mapper path (the naive-impl
    `sharded_train_step` remains for the sp row-sharded variant)."""
    step, _ = _build_tile_step(mesh, height, width, interpret, p_cap, chunk)
    return step(state, opt, images, depths, covs, w2cs, intr4)


def sharded_tile_grads(state, opt, images, depths, covs, w2cs, intr4, *,
                       mesh: Mesh, height: int, width: int,
                       interpret: bool = False, p_cap: int = 4096,
                       chunk: int = 128):
    """Gradients/visibility/loss of the dp-sharded tile step (test hook:
    grads are order-of-summation stable to tolerance; post-Adam params are
    not, since Adam's first step is lr*sign(g) at roundoff-level grads)."""
    _, grads_fn = _build_tile_step(mesh, height, width, interpret, p_cap,
                                   chunk)
    return grads_fn(state, opt, images, depths, covs, w2cs, intr4)
