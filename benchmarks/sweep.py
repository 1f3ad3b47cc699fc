"""Performance sweep on the current backend: precision x fg-impl x variant.

Times the full train step under several implementation choices so defaults
are chosen from measurements, not guesses. Run on TPU:

    python benchmarks/sweep.py [--batch 256] [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def time_config(label, *, variant, compute_dtype, precision,
                batch, steps, resample_impl="conv", fg_impl=None):
    os.environ["AFDM_RESAMPLE_IMPL"] = resample_impl
    if fg_impl is not None:
        os.environ["AFDM_FG_IMPL"] = fg_impl
    else:
        os.environ.pop("AFDM_FG_IMPL", None)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax, random

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    config = TrainConfig(
        run_name="sweep", epochs=1, batch_size=batch, image_size=32,
        image_channels=3, dataset="CIFAR10", dataset_path=None, lr=3e-4,
        noise_steps=1000, variant=variant,
        filters=None if variant == 0 else FilterSettings(),
        compute_dtype=compute_dtype,
    )
    prec = {"highest": lax.Precision.HIGHEST, "default": None}[precision]
    model = UNet(
        c_in=3, c_out=3, image_size=32,
        filters=config.filters, variant=variant,
        dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else None,
        precision=prec,
    )
    params = model.init_params(random.key(0), batch=1)
    tx = make_optimizer(config.lr)
    state = TrainState(params, tx.init(params), jax.tree.map(jnp.copy, params),
                       jnp.zeros((), jnp.int32))
    diffusion = Diffusion(noise_steps=1000, img_size=32)

    # Inline step build (make_train_step builds its own model; reuse ours).
    def loss_fn(p, b, key):
        tkey, nkey = random.split(key)
        t = diffusion.sample_timesteps(tkey, b.shape[0])
        x_t, noise = diffusion.noise_images(b, t, nkey)
        pred = model.apply(p, x_t, t)
        return jnp.mean((noise - pred.astype(jnp.float32)) ** 2)

    import optax

    def step_fn(st, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(st.params, b, key)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        p = optax.apply_updates(st.params, updates)
        return TrainState(p, opt_state, st.ema_params, st.step + 1), loss

    step = jax.jit(step_fn, donate_argnums=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))
    t0 = time.perf_counter()
    for i in range(2):
        state, loss = step(state, images, random.key(i))
    float(loss)  # fetch-forced sync (RESULTS.md measurement discipline)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step(state, images, random.key(100 + i))
    float(loss)  # fetch-forced sync
    dt = time.perf_counter() - t0
    result = {
        "label": label, "imgs_per_sec": round(batch * steps / dt, 1),
        "step_ms": round(1000 * dt / steps, 2), "compile_s": round(compile_s, 1),
        "variant": variant, "dtype": compute_dtype, "fg_impl": fg_impl or "auto",
        "precision": precision,
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    grid = [
        ("v3 bf16 fg-phases", dict(variant=3, compute_dtype="bfloat16",
                                   precision="default", fg_impl="phases",
                                   resample_impl="shifts")),
        ("v3 bf16 fg-conv", dict(variant=3, compute_dtype="bfloat16",
                                 precision="default", fg_impl="conv",
                                 resample_impl="shifts")),
        ("v3 bf16 conv-resample", dict(variant=3, compute_dtype="bfloat16",
                                       precision="default")),
        ("v0 bf16 shifts", dict(variant=0, compute_dtype="bfloat16",
                                precision="default",
                                resample_impl="shifts")),
    ]
    if args.quick:
        grid = grid[:3]
    for label, kw in grid:
        try:
            time_config(label, batch=args.batch, steps=args.steps, **kw)
        except Exception as e:
            print(json.dumps({"label": label, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
