"""The persistent compilation cache must actually be ENABLED under pytest.

Regression test for a round-3 finding: the axon sitecustomize pre-imports
jax at interpreter start, which latches JAX_* env-var config defaults before
``tests/conftest.py`` runs — so the env-var-only cache setup silently did
nothing (``jax.config.jax_compilation_cache_dir`` stayed None) and every
suite run recompiled cold (~40 min on the 1-core host). conftest now applies
the setting through ``jax.config.update``; this test pins that it took.
"""

import os

import jax


def test_compilation_cache_dir_is_live():
    configured = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    assert configured, "conftest must export JAX_COMPILATION_CACHE_DIR"
    assert jax.config.jax_compilation_cache_dir == configured, (
        "jax.config.update('jax_compilation_cache_dir', ...) in conftest "
        "did not take — env vars alone are latched before conftest runs "
        "when sitecustomize pre-imports jax"
    )


def test_cache_writes_an_entry():
    # A fresh compile must land on disk. Drop the min-compile-time threshold
    # to zero for the duration so the probe doesn't depend on host speed.
    import jax.numpy as jnp
    import numpy as np

    import uuid

    cache_dir = jax.config.jax_compilation_cache_dir
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                        jnp.float32)
        # A per-run-unique constant gives a fresh cache key every time —
        # otherwise a second suite run finds the entry already on disk
        # (a HIT writes nothing) and the assertion below is vacuous-false.
        salt = (uuid.uuid4().int % 1000) / 1000.0 + 0.5

        @jax.jit
        def f(a):
            return jnp.tanh(a @ a + a) * salt

        f(x).block_until_ready()
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    after = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    assert after - before, (
        f"no new cache entry appeared in {cache_dir} — persistent "
        "compilation cache is not writing"
    )
