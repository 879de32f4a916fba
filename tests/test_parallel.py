"""Multi-device sharding: the dp/sp mapper train step must compile and run
on the 8-virtual-CPU mesh (mirrors the driver's dryrun)."""

import sys

import numpy as np


def test_dryrun_multichip(cpu_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    import jax
    orig = jax.devices
    try:
        jax.devices = lambda *a: (list(cpu_devices) if not a else orig(*a))
        g.dryrun_multichip(8)
    finally:
        jax.devices = orig


def test_entry_compiles_cpu(cpu_devices):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    import jax
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert np.all(np.isfinite(np.asarray(o)))
