"""Benchmark: training throughput (imgs/sec/chip) on the flagship config.

Measures the jitted train step for UNet variant 3 (Config D — the headline
architecture of the paper) on CIFAR-10-shaped data (32x32x3), the
BASELINE.json primary metric. Runs on whatever accelerator JAX finds (the
driver provides one real TPU chip); bfloat16 compute on TPU, float32 on CPU.

The reference publishes no throughput numbers and its GPU is unstated
(SURVEY.md §6). ``vs_baseline`` is therefore measured against a documented
ESTIMATE of the reference PyTorch stack on one A100: this 1.5M-param UNet
with 6 attention blocks at 32x32, torch eager, batch 16 — ~1000 imgs/sec
(small-batch eager training of this model is Python-dispatch-bound, not
FLOP-bound). The north-star target is ≥5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

A100_TORCH_IMGS_PER_SEC_EST = 1000.0  # documented estimate, see module docstring


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        build_model,
        create_train_state,
        make_train_step,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    batch = 256 if on_tpu else 16
    config = TrainConfig(
        run_name="bench",
        epochs=1,
        batch_size=batch,
        image_size=32,
        image_channels=3,
        dataset="CIFAR10",
        dataset_path=None,
        lr=3e-4,
        noise_steps=1000,
        variant=3,
        filters=FilterSettings(),
        compute_dtype="bfloat16" if on_tpu else "float32",
    )

    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=1000, img_size=32)
    step = make_train_step(model, config, diffusion, mesh=None)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))

    # Warmup/compile.
    for i in range(3):
        state, loss = step(state, images, random.key(i))
    jax.block_until_ready(loss)

    n_steps = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, images, random.key(100 + i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_steps / dt

    # Secondary metric: 1000-step ancestral sampling wall-clock (the whole
    # chain is one compiled lax.scan; rotated Config-E costs the same).
    sample_wall = None
    if on_tpu:
        from jax import random as jrandom

        diffusion_s = Diffusion(noise_steps=1000, img_size=32)
        model = build_model(config)
        sparams = model.init_params(jrandom.key(0), batch=1)
        final, _ = diffusion_s.sample(
            model.apply, n=16, image_channels=3, key=jrandom.key(0), params=sparams
        )
        jax.block_until_ready(final)  # compile
        t0 = time.perf_counter()
        final, _ = diffusion_s.sample(
            model.apply, n=16, image_channels=3, key=jrandom.key(1), params=sparams
        )
        jax.block_until_ready(final)
        sample_wall = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "train_imgs_per_sec_chip",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec/chip (CIFAR-10 32x32, UNet variant 3 / Config D)",
                "vs_baseline": round(imgs_per_sec / A100_TORCH_IMGS_PER_SEC_EST, 3),
                "batch_size": batch,
                "backend": jax.default_backend(),
                "compute_dtype": config.compute_dtype,
                "step_ms": round(1000 * dt / n_steps, 2),
                "final_loss": float(loss),
                "sample_1000step_n16_wall_s": sample_wall,
            }
        )
    )


if __name__ == "__main__":
    main()
