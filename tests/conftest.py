"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and registers the TPU (axon)
plugin regardless of JAX_PLATFORMS, so we cannot force CPU via env alone.
Instead: inject the host-platform device-count flag before the (lazily
created) CPU client exists, and pin the default device to CPU. Sharding
tests grab the 8 virtual CPU devices explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

_CPU = jax.devices("cpu")
jax.config.update("jax_default_device", _CPU[0])
# persistent compilation cache: the suite is compile-dominated on CPU
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# also steer any platform-keyed logic in the library
os.environ["VINGS_FORCE_CPU"] = "1"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    assert len(_CPU) >= 8, "expected 8 virtual CPU devices"
    return _CPU
