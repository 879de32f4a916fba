"""Piece-wise timings of the tracker's fused update at bench scale."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.ops import ba as ba_ops
from vings_mono_tpu.ops import corr as corr_ops
from vings_mono_tpu.ops import lie, projective as pops
from vings_mono_tpu.models.droid_net import DroidNet

H, W = 240, 432
h, w = H // 8, W // 8
E = 64
I = 128
W_BA = 16
rng = np.random.default_rng(0)


def timeit(name, f, *a, n=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms",
          flush=True)


model = DroidNet()
img = jnp.zeros((1, H, W, 3))
p0 = model.init(jax.random.PRNGKey(0), img,
                method=DroidNet.extract_features)
pu = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 128)),
                jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 196)),
                None, jnp.zeros((1,), jnp.int32), 2, True,
                method=DroidNet.run_update)
params = {"params": {**p0["params"], **pu["params"]}}

fmaps = jnp.asarray(rng.normal(size=(E, h, w, 128)) * 0.1, jnp.float32)
pyr = corr_ops.build_pyramid(fmaps, fmaps)
coords = jnp.asarray(
    rng.uniform(3, 20, size=(E, h, w, 2)), jnp.float32)

timeit("corr build (64 edges)", jax.jit(
    lambda a, b: corr_ops.build_pyramid(a, b).levels[0]), fmaps, fmaps)
timeit("corr lookup", jax.jit(lambda p, c: corr_ops.lookup(
    corr_ops.CorrPyramid(levels=list(p)), c)), tuple(pyr.levels), coords)

net = jnp.asarray(rng.normal(size=(E, h, w, 128)) * 0.1, jnp.float32)
inp = jnp.asarray(rng.normal(size=(E, h, w, 128)) * 0.1, jnp.float32)
corr = jnp.asarray(rng.normal(size=(E, h, w, 196)) * 0.1, jnp.float32)
motn = jnp.zeros((E, h, w, 4), jnp.float32)
ii = jnp.asarray(rng.integers(0, W_BA, size=E), jnp.int32)


def gru(params, net, inp, corr, motn, ii):
    return model.apply(params, net, inp, corr, motn, ii, W_BA + 1, True,
                       method=DroidNet.run_update)[1]


timeit("GRU update (64 edges)", jax.jit(gru), params, net, inp, corr,
       motn, ii)

# window BA
N_all = E + I
poses = jnp.tile(lie.se3_identity()[None], (W_BA, 1))
poses = poses.at[:, 0].set(jnp.arange(W_BA) * 0.05)
disps = jnp.asarray(rng.uniform(0.05, 0.3, size=(W_BA, h, w)), jnp.float32)
intr = jnp.tile(jnp.asarray([27.5, 27.5, w / 2, h / 2])[None], (W_BA, 1))
aii = jnp.asarray(rng.integers(0, W_BA - 1, size=N_all), jnp.int32)
ajj = jnp.asarray(rng.integers(0, W_BA - 1, size=N_all), jnp.int32)
tgt = jnp.asarray(rng.uniform(0, w, size=(N_all, 2, h, w)), jnp.float32)
wgt = jnp.asarray(rng.uniform(0, 1, size=(N_all, 2, h, w)), jnp.float32)
eta = jnp.full((W_BA, h, w), 1e-2, jnp.float32)
ev = jnp.ones((N_all,), bool)

timeit("ba_window iters=2", lambda: ba_ops.ba_window(
    tgt, wgt, eta, poses, disps, intr, aii, ajj, ev,
    jnp.asarray(1, jnp.int32), iters=2), n=3)

timeit("reproject (64 edges)", jax.jit(
    lambda p, d, i: pops.projective_transform(p, d, intr, aii[:E],
                                              ajj[:E])[0]),
    poses, disps, intr)

# covariance
H_, v_, E_, C_, w_ = ba_ops.build_system(tgt, wgt, eta, poses, disps,
                                         intr, aii, ajj, ev, fixedp=0)
S_, v2_, Q_ = ba_ops.schur_reduce(H_, v_, E_, C_, w_)
timeit("depth_covariance", jax.jit(ba_ops.depth_covariance),
       S_, E_, Q_, disps, n=3)
