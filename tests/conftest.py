"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (the JAX-native fake-mesh recipe), and keeps numerics
deterministic/float32 for parity tests against the torch-CPU oracle.

Must run before the first ``import jax`` in any test module — pytest imports
conftest first, which is what makes this reliable.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache — first full run is slow on this 1-core host,
# subsequent runs reuse compiled executables.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin's sitecustomize forcibly sets jax_platforms="axon,cpu"
# at interpreter start (overriding JAX_PLATFORMS) — pin the config back to
# CPU with 8 virtual devices before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
