"""Profile ONE train_loop program at bench scale and print the device-time
breakdown by fusion/op (sums trace events on the TPU device track).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.mapper.mapper import GaussianMapper
from vings_mono_tpu.mapper.train import KeyframeBatch, bin_stack, train_loop
from vings_mono_tpu.mapper.densify import add_frame
from vings_mono_tpu.utils.config import load_config
from vings_mono_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50

H = int(os.environ.get("PT_H", 240)); W = int(os.environ.get("PT_W", 432))
cfg = load_config(overrides={
    "training_args": {"iters": ITERS, "num_keyframe": 5},
    "mapper": {"capacity": 1 << 18, "pair_capacity": int(os.environ.get("PT_PCAP", 1 << 18)),
               "chunk": int(os.environ.get("PT_CHUNK", 128)), "side": 3, "visible_capacity": 1 << 16,
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

NPTS = min(30000, (H * W) - 100)
for i in range(2):
    mapper.state, mapper.opt, n, _ = add_frame(
        mapper.state, mapper.opt, batch.w2cs[i], intr4, batch.images[i],
        batch.depths[i], jax.random.fold_in(key, i), batch.global_kf_id[i],
        height=H, width=W, n_points=NPTS, first=True,
        render_kwargs=mapper.render_kwargs)
jax.block_until_ready(mapper.state.xyz)
print("alive", int(mapper.state.n_alive()), flush=True)

binned = bin_stack(mapper.state, batch, intr4, H, W, **mapper.bin_kwargs)
jax.block_until_ready(binned.pair_idx)


def run():
    st = jax.tree.map(jnp.array, mapper.state)
    op = jax.tree.map(jnp.array, mapper.opt)
    out = train_loop(st, op, batch, binned, intr4, key, iters=ITERS,
                     height=H, width=W, render_kwargs=mapper.render_kwargs)
    jax.block_until_ready(out[0].xyz)
    return out


run()  # compile
t0 = time.perf_counter()
run()
wall = (time.perf_counter() - t0) * 1e3
print(f"train_loop iters={ITERS}: {wall:.1f} ms wall "
      f"({wall / ITERS:.2f} ms/iter)", flush=True)

trace_dir = "/tmp/train_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    run()

# ---- parse: sum durations on the device track --------------------------
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
assert files, "no trace produced"
with gzip.open(files[0], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]

# find device pids (TPU core tracks)
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"
             and "args" in e}
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
agg = {}
total = 0.0
for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    agg[name] = agg.get(name, 0.0) + dur
    total += dur

print(f"\ndevice total: {total:.1f} ms  ({total / ITERS:.3f} ms/iter)")
print(f"{'ms':>9} {'ms/iter':>8}  name")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:9.2f} {ms / ITERS:8.3f}  {name[:110]}")
