"""Persistent XLA compilation cache setup.

The grid/bench hosts can have as little as ONE CPU core, and XLA:TPU
compilation of the variant train steps + 1000-step sampler scans is
host-CPU-bound — cold compiles are minutes each. TPU cache entries are
keyed by platform+HLO (no cross-host machine-feature trap like XLA:CPU
AOT, tests/conftest.py), so a warm cache makes repeated shapes start in
seconds.

The axon sitecustomize pre-imports jax at interpreter start, which latches
env-var config defaults before user code runs — so the settings must go
through ``jax.config`` to actually take (measured: with env vars alone the
cache dir is never created).
"""

from __future__ import annotations

import os


def setup_persistent_cache(path: str | None = None) -> None:
    """Enable the persistent compilation cache through jax.config.

    Honors ``JAX_COMPILATION_CACHE_DIR`` (default ``/tmp/jax_bench_cache``).
    Safe to call repeatedly; failures are swallowed (the cache is an
    optimization only).
    """
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/tmp/jax_bench_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
