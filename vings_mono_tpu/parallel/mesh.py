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


def make_dp_mesh(dp, platform=None, devices=None):
    """Flat dp-only mesh for the PRODUCT mapper path (config block
    `parallel: {dp: N}`): keyframes shard over dp, Gaussian parameters are
    replicated. Falls back to the cpu backend when the default backend has
    fewer than dp devices (the container exposes ONE real TPU; virtual
    host devices live on cpu — same rule as __graft_entry__)."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
        if len(devices) < dp:
            devices = jax.devices("cpu")
    assert len(devices) >= dp, \
        f"parallel.dp={dp} but only {len(devices)} devices"
    return Mesh(np.asarray(devices[:dp]), axis_names=("dp",))


def _rep(mesh):
    return NamedSharding(mesh, P())


def _dp(mesh):
    return NamedSharding(mesh, P("dp"))


def put_replicated(mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, _rep(mesh)), tree)


def put_dp(mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, _dp(mesh)), tree)


@functools.lru_cache(maxsize=16)
def _dp_bin_fn(mesh, height, width, bin_kwargs):
    """dp-sharded full-window binning: each device bins its own K/dp
    cameras against the replicated Gaussian state. Replaces the
    round-robin binning cache when dp>1 — binning K/dp cameras in
    parallel costs less than the cache's 3-stalest-rows re-bin, with no
    staleness at all."""
    from jax import shard_map
    from ..mapper.cameras import make_camera
    from ..ops.rasterizer import bin_for_camera
    kw = dict(bin_kwargs)

    def impl(xyz, log_scale, quat, logit_opacity, rgb, alive, w2cs, intr4):
        def one(w2c):
            cam = make_camera(w2c, intr4, height, width)
            return bin_for_camera(xyz, log_scale, quat, logit_opacity, rgb,
                                  cam, alive=alive, **kw)
        return jax.lax.map(one, w2cs)

    fn = shard_map(impl, mesh=mesh,
                   in_specs=(P(),) * 6 + (P("dp"), P()),
                   out_specs=P("dp"), check_vma=False)
    return jax.jit(fn)


def dp_bin_stack(mesh, state, batch, intr4, height, width, **bin_kwargs):
    fn = _dp_bin_fn(mesh, height, width,
                    tuple(sorted(bin_kwargs.items())))
    rep = _rep(mesh)
    args = [jax.device_put(x, rep) for x in
            (state.xyz, state.log_scale, state.quat, state.logit_opacity,
             state.rgb, state.alive)]
    w2cs = jax.device_put(batch.w2cs, _dp(mesh))
    return fn(*args, w2cs, jax.device_put(intr4, rep))


@functools.lru_cache(maxsize=16)
def _dp_train_fn(mesh, iters, height, width, render_kwargs, use_sky,
                 has_pm, has_sky_img, has_sky_binned, wkey, lkey):
    from jax import shard_map
    from ..mapper.train import _train_loop_impl, KeyframeBatch
    weights = None if wkey is None else dict(wkey)
    lrs = None if lkey is None else dict(lkey)

    def impl(state, opt, batch, binned, intr4, key, sky_state, sky_opt,
             sky_images, sky_binned):
        return _train_loop_impl(
            state, opt, batch, binned, intr4, key, iters=iters,
            height=height, width=width, weights=weights, lrs=lrs,
            render_kwargs=render_kwargs, use_sky=use_sky,
            sky_state=sky_state, sky_opt=sky_opt, sky_images=sky_images,
            sky_binned=sky_binned, axis_name="dp")

    bspec = KeyframeBatch(
        images=P("dp"), depths=P("dp"), depths_cov=P("dp"), w2cs=P("dp"),
        global_kf_id=P("dp"), n_valid=P(),
        pixel_mask=P("dp") if has_pm else None)
    in_specs = (P(), P(), bspec, P("dp"), P(), P(), P(), P(),
                P("dp") if has_sky_img else None,
                P("dp") if has_sky_binned else None)
    fn = shard_map(impl, mesh=mesh, in_specs=in_specs,
                   out_specs=(P(), P(), P(), P(), P()), check_vma=False)
    return jax.jit(fn, donate_argnums=(0, 1))


def dp_train_loop(mesh, state, opt, batch, binned_stack, intr4, key, *,
                  iters, height, width, weights=None, lrs=None,
                  render_kwargs=(), use_sky=False, sky_state=None,
                  sky_opt=None, sky_images=None, sky_binned=None):
    """PRODUCT multi-device mapper train loop (VERDICT r3 #3): same
    signature as mapper.train.train_loop plus the mesh. Every operand is
    moved onto the mesh first (inputs may arrive committed to the
    tracker's single device), the window + its binning shard over dp, the
    Gaussian/sky state replicates, and the shard_mapped loop body psums
    gradients/scores so all devices hold identical state afterwards."""
    wkey = None if weights is None else tuple(sorted(weights.items()))
    lkey = None if lrs is None else tuple(sorted(lrs.items()))
    fn = _dp_train_fn(mesh, int(iters), int(height), int(width),
                      tuple(render_kwargs), bool(use_sky),
                      batch.pixel_mask is not None,
                      sky_images is not None, sky_binned is not None,
                      wkey, lkey)
    state = put_replicated(mesh, state)
    opt = put_replicated(mesh, opt)
    kc = batch.images.shape[0]
    assert kc % mesh.shape["dp"] == 0, \
        f"kf_capacity {kc} must divide by parallel.dp {mesh.shape['dp']}"
    dps, rep = _dp(mesh), _rep(mesh)
    batch = batch._replace(
        images=jax.device_put(batch.images, dps),
        depths=jax.device_put(batch.depths, dps),
        depths_cov=jax.device_put(batch.depths_cov, dps),
        w2cs=jax.device_put(batch.w2cs, dps),
        global_kf_id=jax.device_put(batch.global_kf_id, dps),
        n_valid=jax.device_put(batch.n_valid, rep),
        pixel_mask=None if batch.pixel_mask is None
        else jax.device_put(batch.pixel_mask, dps))
    binned_stack = put_dp(mesh, binned_stack)
    intr4 = jax.device_put(intr4, _rep(mesh))
    key = jax.device_put(key, _rep(mesh))
    if use_sky:
        sky_state = put_replicated(mesh, sky_state)
        sky_opt = put_replicated(mesh, sky_opt)
        if sky_images is not None:
            sky_images = jax.device_put(sky_images, _dp(mesh))
        if sky_binned is not None:
            sky_binned = put_dp(mesh, sky_binned)
    return fn(state, opt, batch, binned_stack, intr4, key, sky_state,
              sky_opt, sky_images, sky_binned)


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
