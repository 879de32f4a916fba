"""NVS pose refinement — rebuild of train_once_pose_{v1,v2}
(/root/reference/scripts/gaussian/gaussian_model.py:434-765): optimize a
small SE3 correction per keyframe by photometric loss against the frozen
map, return the refined c2w poses, and rigidly move each keyframe's
attributed Gaussians by its correction (vings_utils/refineposes_utils.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.rasterizer import render
from .cameras import make_camera
from .losses import masked_l1
from .state import GaussianState
from .train import KeyframeBatch, _select_kf


@functools.partial(jax.jit, static_argnames=("iters", "height", "width",
                                             "render_kwargs"))
def refine_poses(state: GaussianState, batch: KeyframeBatch, binned_stack,
                 intr4, *, iters: int = 20, lr: float = 1e-3,
                 height: int, width: int, render_kwargs=()):
    """Returns refined c2w poses (K, 4, 4): c2w' = c2w @ exp(xi_k) with
    xi optimized by Adam on masked photometric L1."""
    rkw = dict(render_kwargs)
    K = batch.w2cs.shape[0]
    c2ws = jnp.linalg.inv(batch.w2cs)

    def loss_fn(xi, kf):
        c2w = c2ws[kf] @ lie.se3_matrix(lie.se3_exp(xi[kf]))
        w2c = jnp.linalg.inv(c2w)
        camera = make_camera(w2c, intr4, height, width)
        rets = render(state.xyz, state.log_scale, state.quat,
                      state.logit_opacity, state.rgb, camera,
                      alive=state.alive,
                      binned=_select_kf(binned_stack, kf), **rkw)
        gt = batch.images[kf]
        valid = (jnp.sum(gt, axis=0) > 0) & (batch.depths[kf][0] > 0)
        return masked_l1(rets["rgb"], gt, valid)

    grad_fn = jax.grad(loss_fn)

    def body(it, carry):
        xi, m, v = carry
        kf = it % jnp.maximum(batch.n_valid, 1)
        g = grad_fn(xi, kf)
        # zero non-finite grads (reference GradientClip semantics) — a
        # single NaN here would poison the pose, then every Gaussian
        # attributed to it via apply_pose_bias_to_gaussians
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        # adam on the xi table (only row kf has nonzero grad)
        t = (it + 1).astype(jnp.float32)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        upd = (m / (1 - 0.9 ** t)) / (jnp.sqrt(v / (1 - 0.999 ** t)) + 1e-8)
        return xi - lr * upd, m, v

    xi0 = jnp.zeros((K, 6), jnp.float32)
    xi, _, _ = jax.lax.fori_loop(0, iters, body,
                                 (xi0, jnp.zeros_like(xi0),
                                  jnp.zeros_like(xi0)))
    # NOTE: stale binning tolerates the small pose deltas (same margin
    # argument as the training loop's cached binning)
    new_c2ws = jnp.einsum("kij,kjl->kil", c2ws,
                          lie.se3_matrix(lie.se3_exp(xi)))
    return new_c2ws, xi


@jax.jit
def apply_pose_bias_to_gaussians(state: GaussianState, global_kf_id_window,
                                 old_c2ws, new_c2ws):
    """Move each Gaussian attributed to a refined keyframe by that
    keyframe's correction (get_xyz_bias_multi,
    vings_utils/refineposes_utils.py:4-18). Gaussians attributed to frames
    outside the window are untouched."""
    from ..ops import quat_wxyz
    T = new_c2ws @ jnp.linalg.inv(old_c2ws)      # (K, 4, 4)
    K = T.shape[0]
    # map globalkf_id -> window slot (or K = identity)
    eye = jnp.eye(4, dtype=T.dtype)[None]
    T_ext = jnp.concatenate([T, eye], axis=0)
    slot = jnp.full((state.capacity,), K, jnp.int32)
    for k in range(K):
        slot = jnp.where(state.globalkf_id == global_kf_id_window[k], k,
                         slot)
    Tg = T_ext[slot]
    xyz = jnp.einsum("nij,nj->ni", Tg[:, :3, :3], state.xyz) + Tg[:, :3, 3]
    q_rot = quat_wxyz.from_xyzw(lie.matrix_to_quat(Tg[:, :3, :3]))
    quat = quat_wxyz.mul(q_rot, quat_wxyz.normalize(state.quat))
    return state.replace(xyz=xyz, quat=quat)
