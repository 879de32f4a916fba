"""Jitted mapper training loops.

Rebuild of train_once_gaussian (/root/reference/scripts/gaussian/
gaussian_base.py:343-434) as ONE compiled function running all 50-100
iterations on-device with lax.fori_loop — no host round trips per iteration
(the reference pays a python->CUDA dispatch per iter; on TPU the whole
keyframe optimization is a single XLA program).

Each iteration: pick a random keyframe from the window, render it through a
*cached binning* (see ops/rasterizer/binning.py), compute the mapper loss,
pull per-Gaussian (importance, error) scores out of the score-carrier
gradient, apply the anti-forgetting gradient weighting
(gaussian_utils.py:56-62), and take a masked sparse-Adam step on Gaussians
that are visible, alive and not stable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rasterizer import Camera, render, bin_for_camera
from .losses import mapper_loss, psnr
from .state import (GaussianState, SparseAdamState, sparse_adam_step,
                    kill_rows)


class KeyframeBatch(NamedTuple):
    """Fixed-capacity stack of the tracker's viz_out window (K_CAP slots)."""
    images: jnp.ndarray      # (K, 3, H, W) float32 [0,1]
    depths: jnp.ndarray      # (K, 1, H, W)
    depths_cov: jnp.ndarray  # (K, 1, H, W)
    w2cs: jnp.ndarray        # (K, 4, 4)
    global_kf_id: jnp.ndarray  # (K,) int32
    n_valid: jnp.ndarray     # () int32 — real keyframes in the stack
    pixel_mask: jnp.ndarray = None  # (K, H, W) bool — False at dynamic px


from .cameras import make_camera


def _select_kf(tree, kf):
    return jax.tree.map(lambda x: x[kf], tree)


@functools.partial(jax.jit, static_argnames=("height", "width", "p_cap",
                                             "chunk", "side", "v_cap",
                                             "tile_cap"))
def bin_stack(state: GaussianState, batch: KeyframeBatch, intr4, height,
              width, p_cap=1 << 21, chunk=128, side=5, v_cap=0, tile_cap=0):
    """Bin every keyframe camera in the window. Jitted: an un-jitted
    lax.map re-traces AND re-compiles its body every call (~30 s/window)."""
    def one(w2c):
        cam = make_camera(w2c, intr4, height, width)
        return bin_for_camera(state.xyz, state.log_scale, state.quat,
                              state.logit_opacity, state.rgb, cam,
                              alive=state.alive, p_cap=p_cap, chunk=chunk,
                              side=side, v_cap=v_cap, tile_cap=tile_cap)
    return jax.lax.map(one, batch.w2cs)


@functools.partial(jax.jit, static_argnames=("height", "width", "p_cap",
                                             "chunk", "side", "v_cap",
                                             "tile_cap"))
def bin_rows(state: GaussianState, w2cs_rows, intr4, height, width,
             p_cap=1 << 21, chunk=128, side=5, v_cap=0, tile_cap=0):
    """Bin a (small, static) subset of window cameras — the incremental
    half of the round-robin binning cache (full re-bin of all K cameras
    every keyframe was the single largest mapper cost on-chip)."""
    def one(w2c):
        cam = make_camera(w2c, intr4, height, width)
        return bin_for_camera(state.xyz, state.log_scale, state.quat,
                              state.logit_opacity, state.rgb, cam,
                              alive=state.alive, p_cap=p_cap, chunk=chunk,
                              side=side, v_cap=v_cap, tile_cap=tile_cap)
    return jax.lax.map(one, w2cs_rows)


@jax.jit
def pool2x2(x):
    """2x2 average pool over the trailing two axes."""
    return 0.25 * (x[..., 0::2, 0::2] + x[..., 1::2, 0::2] +
                   x[..., 0::2, 1::2] + x[..., 1::2, 1::2])


@jax.jit
def half_batch(batch: KeyframeBatch) -> KeyframeBatch:
    """2x2 average-pooled copy of the window for the coarse phase of the
    coarse-to-fine schedule (train cost is ~linear in tiles+pairs, both
    ~1/3-1/4 at half resolution). Poses/ids unchanged; the caller halves
    the intrinsics with the 0.5-pixel-center shift."""
    pool = pool2x2
    pm = batch.pixel_mask
    if pm is not None:
        pm = (pm[..., 0::2, 0::2] & pm[..., 1::2, 0::2] &
              pm[..., 0::2, 1::2] & pm[..., 1::2, 1::2])
    return batch._replace(images=pool(batch.images),
                          depths=pool(batch.depths),
                          depths_cov=pool(batch.depths_cov),
                          pixel_mask=pm)


def half_intr4(intr4):
    """[fx,fy,cx,cy] for the 2x2-pooled image: pooled pixel centers sit at
    full-res coords 2u+0.5, so u_half = (u_full - 0.5) / 2."""
    import jax.numpy as jnp
    f = intr4 * 0.5
    return f.at[2:].add(-0.25)


@functools.partial(jax.jit, donate_argnums=(0,))
def permute_scatter_binned(full, perm, part, rows):
    """Shift cached binning rows to their new window positions (window
    slides), then scatter freshly-binned rows in."""
    moved = jax.tree.map(lambda x: x[perm], full)
    return jax.tree.map(lambda f, p: f.at[rows].set(p), moved, part)


def _train_loop_impl(state: GaussianState, opt: SparseAdamState,
                     batch: KeyframeBatch, binned_stack, intr4, key, *,
                     iters: int, height: int, width: int, weights=None,
                     lrs=None, render_kwargs=(), use_sky: bool = False,
                     sky_state=None, sky_opt=None, sky_images=None,
                     sky_binned=None, axis_name=None):
    """Loop body shared by the single-device `train_loop` and the
    dp-sharded `parallel.mesh.dp_train_loop`. With `axis_name` set the
    function runs INSIDE a shard_map: batch/binned carry only this
    device's keyframe slice, every device renders its own random local
    keyframe per iteration, and gradients/scores are combined with psum
    so the replicated Gaussian state stays bit-identical across devices
    (the TPU-native scale-out of the mapper, SURVEY §2.10)."""
    rkw = dict(render_kwargs)

    def loss_fn(params, sky_params, carrier, camera, kf):
        rets = render(params["xyz"], params["log_scale"], params["quat"],
                      params["logit_opacity"], params["rgb"], camera,
                      alive=state.alive, score_carrier=carrier,
                      binned=_select_kf(binned_stack, kf), **rkw)
        sky_rgb_gt = None
        sky_visible = None
        if use_sky:
            from .sky import SPHERE_RADIUS
            # smooth normalization: linalg.norm has NaN grads at the
            # all-zero rows of dead slots
            nrm = jnp.sqrt(jnp.sum(sky_params["xyz"] ** 2, axis=-1,
                                   keepdims=True) + 1e-12)
            sxyz = sky_params["xyz"] / nrm * SPHERE_RADIUS
            # sky binning is cached per keyframe like the main binning —
            # re-binning the sphere inside every iteration was a large
            # per-iter cost for sky-enabled configs
            srets = render(sxyz,
                           sky_params["log_scale"] + jnp.log(SPHERE_RADIUS),
                           sky_params["quat"],
                           sky_params["logit_opacity"], sky_params["rgb"],
                           camera, alive=sky_state.alive,
                           binned=None if sky_binned is None else
                           _select_kf(sky_binned, kf), **rkw)
            rets = dict(rets)
            rets["rgb"] = rets["rgb"] + (1.0 - rets["accum"]) * srets["rgb"]
            sky_rgb_gt = sky_images[kf]
            sky_visible = srets["visible"]
        pm = None if batch.pixel_mask is None else batch.pixel_mask[kf]
        total, metrics = mapper_loss(rets, batch.images[kf],
                                     batch.depths[kf], batch.depths_cov[kf],
                                     camera, weights, sky_rgb=sky_rgb_gt,
                                     pixel_mask=pm)
        metrics["psnr"] = psnr(rets["rgb"], batch.images[kf],
                               batch.depths[kf][0] > 0)
        return total, (metrics, rets["visible"], sky_visible)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    def body(it, carry):
        st, op, sst, sop, k, _ = carry
        k, k1 = jax.random.split(k)
        if axis_name is not None:
            # per-device keyframe sampling from the LOCAL window slice;
            # devices whose slice is entirely padding contribute weight 0
            idx = jax.lax.axis_index(axis_name)
            k1 = jax.random.fold_in(k1, idx)
            k_local = batch.images.shape[0]
            nv_local = jnp.clip(batch.n_valid - idx * k_local, 0, k_local)
            dev_valid = nv_local > 0
            kf = jax.random.randint(k1, (), 0, jnp.maximum(nv_local, 1))
        else:
            kf = jax.random.randint(k1, (), 0,
                                    jnp.maximum(batch.n_valid, 1))
        camera = make_camera(batch.w2cs[kf], intr4, height, width)
        carrier = jnp.zeros((st.capacity, 2), jnp.float32)
        sky_params = sst.params() if use_sky else {
            k2: jnp.zeros((1,) + v.shape[1:]) for k2, v in
            st.params().items()}
        (_, (metrics, visible, sky_vis)), (gp, gs, cur) = grad_fn(
            st.params(), sky_params, carrier, camera, kf)
        gid_kf = batch.global_kf_id[kf]
        if axis_name is not None:
            # combine the dp devices' per-keyframe results so every device
            # applies the SAME update: weighted pmean of grads/metrics,
            # psum of the additive score accumulators, union of
            # visibility, and per-Gaussian arg-max over devices for the
            # keyframe attribution (gaussian_base.py:387-392 semantics)
            w = dev_valid.astype(jnp.float32)
            denom = jax.lax.psum(w, axis_name)
            mean = lambda t: jax.tree.map(
                lambda g: jax.lax.psum(g * w, axis_name) / denom, t)
            gp = mean(gp)
            metrics = mean(metrics)
            cur0_dev = cur[:, 0] * w
            # normalize the ADDITIVE score accumulation by the number of
            # contributing devices: per-iteration score growth (and so the
            # pruning/stable-mask thresholds tuned at dp=1, e.g.
            # rectify_gaussians score_prune) must not scale with dp; the
            # max-combined column keeps its max semantics via pmax
            cur0 = jax.lax.psum(cur0_dev, axis_name) / denom
            cur1 = jax.lax.pmax(cur[:, 1] * w, axis_name)
            # attribution uses the per-device max + its keyframe id
            # (arg-max over devices)
            best0 = jax.lax.pmax(cur0_dev, axis_name)
            gid_kf = jax.lax.pmax(
                jnp.where((cur0_dev >= best0) & dev_valid, gid_kf,
                          jnp.int32(-(1 << 30))), axis_name)
            visible = jax.lax.psum(
                (visible & dev_valid).astype(jnp.int32), axis_name) > 0
            if use_sky:
                gs = mean(gs)
                sky_vis = jax.lax.psum(
                    (sky_vis & dev_valid).astype(jnp.int32), axis_name) > 0
        else:
            cur0, cur1 = cur[:, 0], cur[:, 1]
            best0 = cur0

        # score bookkeeping (add_records, gaussian_model.py:163-169 +
        # globalkf attribution, gaussian_base.py:387-392)
        # whole-array construction instead of per-column .at updates: a
        # column dynamic-update-slice on the (N, 2) tiled layout lowers to a
        # serialized read-modify-write (~0.6 ms each at 262k rows); the
        # stacked form is one fused elementwise pass
        local = jnp.stack([st.local_scores[:, 0] + cur0,
                           jnp.maximum(st.local_scores[:, 1], cur1)],
                          axis=-1)
        glob = jnp.clip(jnp.stack([st.global_scores[:, 0] + cur0,
                                   st.global_scores[:, 1]], axis=-1),
                        0.0, 1e4)
        replace = st.globalkf_max_scores < best0
        gmax = jnp.where(replace, best0, st.globalkf_max_scores)
        gid = jnp.where(replace, gid_kf, st.globalkf_id)

        # anti-forgetting gradient weighting (gaussian_utils.py:56-62);
        # falls back to 1 when no scores flow (naive render path)
        wgt = jnp.where(cur0 + glob[:, 0] > 0.0,
                        cur0 / (glob[:, 0] + 1e-6 + cur0), 1.0)[:, None]
        gp = {k2: g * wgt for k2, g in gp.items()}

        step_mask = visible & st.alive & (~st.stable)
        st = st.replace(local_scores=local, global_scores=glob,
                        globalkf_max_scores=gmax, globalkf_id=gid)
        st, op = sparse_adam_step(st, gp, op, step_mask, lrs)
        if use_sky:
            sky_mask = sky_vis & sst.alive
            sst, sop = sparse_adam_step(sst, gs, sop, sky_mask, lrs)
        return st, op, sst, sop, k, metrics

    zero_metrics = {k: jnp.zeros(()) for k in
                    ["rgb", "l1", "ssim", "normal", "alpha", "depth",
                     "dist", "total", "psnr"]}
    if sky_state is None:
        from .state import empty_state, adam_init
        sky_state = empty_state(8)
        sky_opt = adam_init(sky_state)
    state, opt, sky_state, sky_opt, _, metrics = jax.lax.fori_loop(
        0, iters, body, (state, opt, sky_state, sky_opt, key,
                         zero_metrics))
    return state, opt, sky_state, sky_opt, metrics


train_loop = functools.partial(
    jax.jit, static_argnames=("iters", "height", "width", "render_kwargs",
                              "use_sky", "axis_name"),
    donate_argnums=(0, 1))(_train_loop_impl)


@functools.partial(jax.jit, donate_argnums=(0,))
def stablemask_control(state: GaussianState):
    """Unstable->stable when untouched this round; stable->unstable when the
    error score spikes; reset local scores (gaussian_model.py:187-200)."""
    to_stable = (~state.stable) & (state.local_scores[:, 0] < 1e-4) \
        & state.alive
    to_unstable = state.stable & (state.local_scores[:, 1] > 0.3) & \
        (state.local_scores[:, 0] > 0.05)
    stable = jnp.where(to_stable, True, state.stable)
    stable = jnp.where(to_unstable, False, stable)
    return state.replace(stable=stable,
                         local_scores=jnp.zeros_like(state.local_scores))


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "render_kwargs"),
                   donate_argnums=(0,))
def storage_control(state: GaussianState, batch: KeyframeBatch, binned_stack,
                    intr4, *, height: int, width: int, render_kwargs=()):
    """Every few keyframes: re-render the window, accumulate plain-L1
    importance scores, prune mid-importance unstable Gaussians
    (gaussian_model.py:228-251)."""
    rkw = dict(render_kwargs)

    def one_kf(kf, acc):
        camera = make_camera(batch.w2cs[kf], intr4, height, width)

        def loss_fn(carrier):
            rets = render(state.xyz, state.log_scale, state.quat,
                          state.logit_opacity, state.rgb, camera,
                          alive=state.alive, score_carrier=carrier,
                          binned=_select_kf(binned_stack, kf), **rkw)
            gt = batch.images[kf]
            m = (jnp.sum(gt, axis=0) > 0).astype(jnp.float32)
            return jnp.sum(jnp.abs(rets["rgb"] - gt) * m[None]) / jnp.clip(
                jnp.sum(m) * 3.0, 1.0)

        carrier = jnp.zeros((state.capacity, 2), jnp.float32)
        scores = jax.grad(loss_fn)(carrier)
        valid = kf < batch.n_valid
        return acc + jnp.where(valid, scores[:, 0], 0.0)

    K = batch.w2cs.shape[0]
    imp = jax.lax.fori_loop(
        0, K, lambda i, a: one_kf(i, a),
        jnp.zeros((state.capacity,), jnp.float32))
    prune = (imp > 0.05) & (imp < 0.8) & (~state.stable) & state.alive
    return kill_rows(state, prune), jnp.sum(prune.astype(jnp.int32))
