"""TPU micro-bench for the tile rasterizer: binning / forward / backward."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vings_mono_tpu.ops.rasterizer import Camera, render, bin_for_camera

N = 1 << 18           # 262k gaussians
H, W = 352, 640
P_CAP = 1 << 21       # 2M pairs
CHUNK = 128

rng = np.random.default_rng(0)
z = rng.uniform(2.0, 30.0, size=N).astype(np.float32)
x = (rng.uniform(0, 1, size=N) - 0.5) * z * W / 300.0
y = (rng.uniform(0, 1, size=N) - 0.5) * z * H / 300.0
params = (
    jnp.asarray(np.stack([x, y, z], -1), jnp.float32),
    jnp.asarray(np.log(rng.uniform(0.02, 0.3, size=(N, 2))), jnp.float32),
    jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
    jnp.asarray(rng.normal(size=(N, 1)) * 0.5, jnp.float32),
    jnp.asarray(rng.uniform(0, 1, size=(N, 3)), jnp.float32),
)
cam = Camera(w2c=jnp.eye(4, dtype=jnp.float32), fx=jnp.float32(300.0),
             fy=jnp.float32(300.0), cx=jnp.float32(W / 2),
             cy=jnp.float32(H / 2), height=H, width=W)

bin_fn = jax.jit(lambda p: bin_for_camera(*p, cam, p_cap=P_CAP, chunk=CHUNK))


def fwd(p, binned):
    r = render(*p, cam, binned=binned, p_cap=P_CAP, chunk=CHUNK)
    return r["rgb"].sum() + r["depth"].sum()


fwd_fn = jax.jit(fwd)
grad_fn = jax.jit(jax.grad(lambda p, binned: fwd(p, binned)))


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


for chunk, side in [(128, 5), (256, 5), (512, 5), (256, 4)]:
    CHUNK = chunk
    bin_fn = jax.jit(lambda p: bin_for_camera(*p, cam, p_cap=P_CAP,
                                              chunk=chunk, side=side))

    def fwd(p, binned, _c=chunk):
        r = render(*p, cam, binned=binned, p_cap=P_CAP, chunk=_c)
        return r["rgb"].sum() + r["depth"].sum()

    fwd_fn = jax.jit(fwd)
    grad_fn = jax.jit(jax.grad(fwd))
    binned = bin_fn(params)
    jax.block_until_ready(binned)
    t_bin = timeit(bin_fn, params, n=5)
    t_fwd = timeit(fwd_fn, params, binned)
    t_bwd = timeit(grad_fn, params, binned)
    print(f"chunk={chunk} side={side}: pairs={int(binned.n_pairs)} "
          f"bin={t_bin*1e3:.1f}ms fwd={t_fwd*1e3:.1f}ms "
          f"fwd+bwd={t_bwd*1e3:.1f}ms overflow={bool(binned.overflow)}")
