"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests exercise the
same `jax.sharding.Mesh` code paths on 8 virtual CPU devices (XLA host
platform).  Set PVT_TEST_TPU=1 to run the suite on whatever real accelerator
is attached instead.
"""

import os

if not os.environ.get("PVT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU); the env
    # var is clobbered at interpreter startup so use the config API instead
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("PVT_TEST_TPU"):
    # axon remote compiles take minutes per program; persist them so TPU
    # suite runs (and re-runs) amortize compiles with bench/northstar
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_cache", "xla_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
