"""On-chip tuning: pair counts + bin/fwd/bwd times vs (v_cap, p_cap, chunk)
at bench scale (60k alive Gaussians, 240x432)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vings_mono_tpu.ops.rasterizer import Camera, render, bin_for_camera

H, W = 240, 432
N_CAP = 1 << 18
N_ALIVE = 60000
F = 220.0

rng = np.random.default_rng(0)
z = rng.uniform(2.0, 30.0, size=N_ALIVE).astype(np.float32)
x = (rng.uniform(0, 1, size=N_ALIVE) - 0.5) * z * W / F
y = (rng.uniform(0, 1, size=N_ALIVE) - 0.5) * z * H / F


def full(a, fill=0.0):
    out = np.full((N_CAP,) + a.shape[1:], fill, np.float32)
    out[:N_ALIVE] = a
    return jnp.asarray(out)


params = (
    full(np.stack([x, y, z], -1)),
    full(np.log(rng.uniform(0.05, 0.4, size=(N_ALIVE, 2)))),
    full(rng.normal(size=(N_ALIVE, 4))),
    full(rng.normal(size=(N_ALIVE, 1)) * 0.5 + 1.0),
    full(rng.uniform(0, 1, size=(N_ALIVE, 3))),
)
alive = jnp.asarray(np.arange(N_CAP) < N_ALIVE)
cam = Camera(w2c=jnp.eye(4, dtype=jnp.float32), fx=jnp.float32(F),
             fy=jnp.float32(F), cx=jnp.float32(W / 2),
             cy=jnp.float32(H / 2), height=H, width=W)


def timeit(f, *args, n=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


for v_cap, p_cap, chunk, side in [
        (1 << 16, 1 << 18, 128, 3),
        (1 << 16, 1 << 18, 256, 3),
        (1 << 16, 1 << 17, 128, 3),
        (1 << 16, 1 << 17, 256, 3),
]:
    kw = dict(p_cap=p_cap, chunk=chunk, side=side, v_cap=v_cap)
    bin_t, binned = timeit(
        jax.jit(lambda p: bin_for_camera(*p, cam, alive=alive, **kw)),
        params)
    npairs = int(binned.n_pairs)
    nchunks = int(binned.n_chunks)
    ovf = bool(binned.overflow)

    def fwd(p, b):
        r = render(*p, cam, alive=alive, binned=b, **kw)
        return r["rgb"].sum() + r["depth"].sum() + r["dist"].sum()

    fwd_t, _ = timeit(jax.jit(fwd), params, binned)
    bwd_t, _ = timeit(jax.jit(jax.grad(fwd)), params, binned)
    print(f"v{v_cap:>6} p{p_cap:>8} c{chunk:>3} side{side}: "
          f"pairs {npairs:>7} ({'OVF' if ovf else 'ok '}) "
          f"chunks {nchunks:>5}/{p_cap // chunk:>5} | "
          f"bin {bin_t:6.1f} fwd {fwd_t:6.1f} bwd {bwd_t:6.1f} ms",
          flush=True)
