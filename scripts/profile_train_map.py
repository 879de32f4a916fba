"""Map fusion names from the train_loop trace to source ops via compiled HLO
metadata. Prints the op_name/source lines of the named fusions."""

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.mapper.train import KeyframeBatch, bin_stack, train_loop
from vings_mono_tpu.mapper.densify import add_frame
from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

H, W = 240, 432
ITERS = 50
cfg = load_config(overrides={
    "training_args": {"iters": ITERS, "num_keyframe": 5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": 1 << 18,
               "chunk": 128, "side": 3, "visible_capacity": 1 << 16,
               "kf_capacity": 8,
               "points_per_frame": 20000, "points_first_frame": 30000},
})
mapper = GaussianMapper(cfg)
rng = np.random.default_rng(0)
K = 8
imgs = jnp.asarray(rng.uniform(0, 1, (K, 3, H, W)), jnp.float32)
depths = jnp.asarray(rng.uniform(2, 20, (K, 1, H, W)), jnp.float32)
covs = jnp.full((K, 1, H, W), 0.01, jnp.float32)
w2cs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (K, 1, 1))
w2cs = w2cs.at[:, 0, 3].set(jnp.arange(K) * 0.1)
batch = KeyframeBatch(images=imgs, depths=depths, depths_cov=covs,
                      w2cs=w2cs,
                      global_kf_id=jnp.arange(K, dtype=jnp.int32),
                      n_valid=jnp.asarray(K, jnp.int32))
intr4 = jnp.asarray([220.0, 220.0, W / 2, H / 2], jnp.float32)
key = jax.random.PRNGKey(0)
for i in range(2):
    mapper.state, mapper.opt, n, _ = add_frame(
        mapper.state, mapper.opt, batch.w2cs[i], intr4, batch.images[i],
        batch.depths[i], jax.random.fold_in(key, i), batch.global_kf_id[i],
        height=H, width=W, n_points=30000, first=True,
        render_kwargs=mapper.render_kwargs)
binned = bin_stack(mapper.state, batch, intr4, H, W, **mapper.bin_kwargs)

lowered = train_loop.lower(
    mapper.state, mapper.opt, batch, binned, intr4, key, iters=ITERS,
    height=H, width=W, render_kwargs=mapper.render_kwargs)
txt = lowered.compile().as_text()

targets = sys.argv[1:] or ["fusion.441", "fusion.424", "fusion.438",
                           "fusion.439", "transpose_jvp", "jvp__",
                           "pad.923", "copy.66", "copy.80", "copy.76"]
for t in targets:
    pat = re.compile(r"^\s*(%?\S*" + re.escape(t) + r"\S*)\s*=\s*(.*)$",
                     re.M)
    hits = pat.findall(txt)
    print(f"==== {t}: {len(hits)} hits")
    for name, rest in hits[:3]:
        m = re.search(r'op_name="([^"]+)"', rest)
        src = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', rest)
        shape = rest.split(" ", 1)[0]
        print(f"  {name} :: {shape}")
        if m:
            print(f"    op_name: {m.group(1)[:200]}")
        if src:
            print(f"    src: {src.group(1)}:{src.group(2)}")
