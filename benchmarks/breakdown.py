"""Where does the train-step time go? Ablation + module-level timing.

Runs on the real chip (one TPU process at a time — see PROGRESS.md round-1
note 4). Times, at the bench config (batch 256, 32x32x3, bf16):

* full train step for variants 0-3;
* variant 3 with all SelfAttention blocks replaced by identity;
* variant 3 with filtered GELUs replaced by plain GELU (= per-block ablation
  of the up-gelu-down sandwich while keeping alias-free resampling = a
  "variant 1 + maxpool-ablation" proxy — variants already cover this);
* isolated fwd+bwd of each SelfAttention shape and each filtered DoubleConv
  shape that appears in the v3 graph.

Usage: python benchmarks/breakdown.py [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def _timeit(fn, *args, iters=30, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def step_time_ms(variant: int, *, no_attn: bool = False, batch: int = 256) -> float:
    import jax
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_train_step,
    )

    config = TrainConfig(
        run_name="breakdown",
        epochs=1,
        batch_size=batch,
        image_size=32,
        image_channels=3,
        dataset="synthetic",
        dataset_path=None,
        lr=3e-4,
        noise_steps=1000,
        variant=variant,
        filters=FilterSettings() if variant else None,
        compute_dtype="bfloat16",
    )

    saved = None
    if no_attn:
        import aliasfree_diffusion_models_pytorch_tpu.models.blocks as blocks_mod

        saved = blocks_mod.SelfAttention.__call__

        def identity_call(self, x):
            return x

        blocks_mod.SelfAttention.__call__ = identity_call

    try:
        model, state = create_train_state(config, random.key(0))
        diffusion = Diffusion(noise_steps=1000, img_size=32)
        step = make_train_step(model, config, diffusion, mesh=None)
        rng = np.random.default_rng(0)
        images = jax.numpy.asarray(
            rng.standard_normal((batch, 32, 32, 3)).astype(np.float32)
        )

        # state is donated by the jitted step — thread it through the
        # timing loop instead of reusing the original (donated) buffers.
        for _ in range(3):
            state, loss = step(state, images, random.key(7))
        jax.block_until_ready(loss)
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, images, random.key(7))
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / iters * 1000.0
    finally:
        if saved is not None:
            import aliasfree_diffusion_models_pytorch_tpu.models.blocks as blocks_mod

            blocks_mod.SelfAttention.__call__ = saved


def module_times(batch: int = 256):
    """fwd+bwd ms for each SelfAttention / filtered-GELU shape in the v3 graph."""
    import jax
    import jax.numpy as jnp
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
    from aliasfree_diffusion_models_pytorch_tpu.models.blocks import SelfAttention
    from aliasfree_diffusion_models_pytorch_tpu.ops import filters as flt
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import filtered_gelu

    rows = []

    # v3 @32: sa1 64ch@16, sa2 128@8, sa3 128@4, sa4 64@8, sa5 32@16, sa6 32@32
    for name, ch, size in [
        ("sa1", 64, 16),
        ("sa2", 128, 8),
        ("sa3", 128, 4),
        ("sa4", 64, 8),
        ("sa5", 32, 16),
        ("sa6", 32, 32),
    ]:
        mod = SelfAttention(channels=ch, dtype=jnp.bfloat16, precision=None)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, size, size, ch)),
            jnp.bfloat16,
        )
        params = mod.init(random.key(0), x)

        @jax.jit
        def fwdbwd(p, x, mod=mod):
            def loss(p, x):
                return jnp.mean(mod.apply(p, x) ** 2)

            l, g = jax.value_and_grad(loss)(p, x)
            return l, jax.tree.map(jnp.sum, g)

        ms = _timeit(fwdbwd, params, x)
        rows.append((f"attn {name} c={ch} s={size}", ms))

    fs = FilterSettings()
    up = flt.circular_lowpass_kernel(fs.omega_c_up, fs.kernel_size, fs.kaiser_beta)
    dn = flt.circular_lowpass_kernel(fs.omega_c_down, fs.kernel_size, fs.kaiser_beta)
    # filtered GELU shapes in v3 (each DoubleConv has 2 GELUs in filtered mode;
    # residual blocks add one more after the add):
    for name, ch, size in [
        ("fg 32@32", 32, 32),
        ("fg 64@16", 64, 16),
        ("fg 128@8", 128, 8),
        ("fg 256@4", 256, 4),
    ]:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, size, size, ch)),
            jnp.bfloat16,
        )

        @jax.jit
        def fg_fwdbwd(x):
            def loss(x):
                return jnp.mean(
                    filtered_gelu(x, up, dn, precision=None) ** 2
                )

            l, g = jax.value_and_grad(loss)(x)
            return l, jnp.sum(g)

        ms = _timeit(fg_fwdbwd, x)
        rows.append((f"filtered_gelu {name}", ms))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="capture a profiler trace of the v3 step")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")

    for v in (0, 1, 2, 3):
        ms = step_time_ms(v, batch=args.batch)
        print(f"variant {v}: {ms:7.2f} ms/step  ({args.batch / ms * 1000:7.0f} imgs/s)")
    ms = step_time_ms(3, no_attn=True, batch=args.batch)
    print(f"variant 3 (no attention): {ms:7.2f} ms/step")
    ms = step_time_ms(0, no_attn=True, batch=args.batch)
    print(f"variant 0 (no attention): {ms:7.2f} ms/step")

    print("\nper-module fwd+bwd (batch %d):" % args.batch)
    for name, ms in module_times(args.batch):
        print(f"  {name:28s} {ms:7.3f} ms")

    if args.trace:
        from jax import random

        from aliasfree_diffusion_models_pytorch_tpu.config import (
            FilterSettings,
            TrainConfig,
        )
        from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
        from aliasfree_diffusion_models_pytorch_tpu.train import (
            create_train_state,
            make_train_step,
        )

        config = TrainConfig(
            run_name="breakdown", epochs=1, batch_size=args.batch, image_size=32,
            image_channels=3, dataset="synthetic", dataset_path=None, lr=3e-4,
            noise_steps=1000, variant=3, filters=FilterSettings(),
            compute_dtype="bfloat16",
        )
        model, state = create_train_state(config, random.key(0))
        diffusion = Diffusion(noise_steps=1000, img_size=32)
        step = make_train_step(model, config, diffusion, mesh=None)
        images = jax.numpy.asarray(
            np.random.default_rng(0).standard_normal((args.batch, 32, 32, 3)),
            jax.numpy.float32,
        )
        for i in range(3):
            state, loss = step(state, images, random.key(i))
        jax.block_until_ready(loss)
        jax.profiler.start_trace(args.trace)
        for i in range(10):
            state, loss = step(state, images, random.key(100 + i))
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
