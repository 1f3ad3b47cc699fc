"""Round-3 perf experiments on the real chip (run ALONE — idle host only).

Measures the v3 (Config D) train step under candidate optimizations:
  1. baseline (round-2 defaults)
  2. flash-attention min_seq sweep (1024 / 256 / 64)
  3. gradient rematerialization of the model forward (jax.checkpoint):
     HBM-residual traffic traded for a recomputed forward — at ~9% MFU the
     FLOPs are nearly free if the step is bandwidth-bound.
  4. remat + flash sweep combined (remat changes the backward's working
     set, so the attention threshold can shift).

All timings fetch-forced per RESULTS.md measurement discipline (scalar
fetch inside the timed region; fresh PRNG key per step).

Usage: python benchmarks/r3_experiments.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(*, min_seq: int | None = None, remat: str = "none",
              batch: int = 256, iters: int = 30) -> float:
    import jax
    import jax.numpy as jnp
    import optax
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_optimizer,
        TrainState,
    )

    if min_seq is not None:
        os.environ["AFDM_FLASH_MIN_SEQ"] = str(min_seq)
    else:
        os.environ.pop("AFDM_FLASH_MIN_SEQ", None)

    config = TrainConfig(
        run_name="r3exp", epochs=1, batch_size=batch, image_size=32,
        image_channels=3, dataset="CIFAR10", dataset_path=None, lr=3e-4,
        noise_steps=1000, variant=3, filters=FilterSettings(),
        compute_dtype="bfloat16",
    )
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=1000, img_size=32)
    tx = make_optimizer(config.lr)

    apply_fn = model.apply
    if remat == "full":
        apply_fn = jax.checkpoint(model.apply)
    elif remat == "dots":
        apply_fn = jax.checkpoint(
            model.apply,
            policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        )

    def loss_fn(params, batch_x, key):
        tkey, nkey = random.split(key, 2)
        t = diffusion.sample_timesteps(tkey, batch_x.shape[0])
        x_t, noise = diffusion.noise_images(batch_x, t, nkey)
        pred = apply_fn(params, x_t, t)
        return jnp.mean((noise - pred.astype(jnp.float32)) ** 2)

    @jax.jit
    def step(state, batch_x, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch_x, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.ema_params, state.step + 1), loss

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))
    for i in range(3):
        state, loss = step(state, images, random.key(i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, images, random.key(100 + i))
    float(loss)  # forced fetch inside the timed region
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--experiments", default="baseline,minseq,remat")
    args = ap.parse_args()
    todo = set(args.experiments.split(","))
    out = {}

    if "baseline" in todo:
        out["baseline_ms"] = round(time_step(iters=args.iters), 2)
        print(json.dumps({"exp": "baseline", "ms": out["baseline_ms"]}), flush=True)
    if "minseq" in todo:
        for ms in (256, 64):
            key = f"minseq_{ms}_ms"
            out[key] = round(time_step(min_seq=ms, iters=args.iters), 2)
            print(json.dumps({"exp": key, "ms": out[key]}), flush=True)
    if "remat" in todo:
        for pol in ("full", "dots"):
            key = f"remat_{pol}_ms"
            out[key] = round(time_step(remat=pol, iters=args.iters), 2)
            print(json.dumps({"exp": key, "ms": out[key]}), flush=True)
    if "remat_minseq" in todo:
        for pol in ("full", "dots"):
            for ms in (1024, 256, 64):
                key = f"remat_{pol}_minseq_{ms}_ms"
                out[key] = round(
                    time_step(remat=pol, min_seq=ms, iters=args.iters), 2)
                print(json.dumps({"exp": key, "ms": out[key]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
