"""1000-step ancestral sampling wall-clock (the BASELINE.json secondary metric).

The reference's sampling loop is 999 sequential Python-dispatched model calls
(plus, for Config E, a CPU scipy round-trip per step). Here the whole chain is
one compiled lax.scan, with rotation as an in-scan MXU matmul. Reports plain
and rotated (Config-E) sampling for the flagship variant-3 model.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--channels", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet

    on_tpu = jax.default_backend() not in ("cpu",)
    model = UNet(
        c_in=args.channels, c_out=args.channels, image_size=32, variant=3,
        filters=FilterSettings(),
        dtype=jnp.bfloat16 if on_tpu else None,
        precision=None if on_tpu else jax.lax.Precision.HIGHEST,
    )
    params = model.init_params(random.key(0), batch=1)
    d = Diffusion(noise_steps=args.steps, img_size=32)

    # DDIM fast path first (50 steps), then the full DDPM chains.
    t0 = time.perf_counter()
    out = d.sample_ddim(model.apply, n=args.n, image_channels=args.channels,
                        key=random.key(0), steps=50, params=params)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = d.sample_ddim(model.apply, n=args.n, image_channels=args.channels,
                        key=random.key(1), steps=50, params=params)
    jax.block_until_ready(out)
    print(json.dumps({"metric": "sample_ddim50", "wall_s": round(time.perf_counter()-t0, 3),
                      "imgs_per_sec": round(args.n / (time.perf_counter()-t0), 2),
                      "first_call_s": round(first, 1), "n": args.n,
                      "backend": jax.default_backend()}), flush=True)

    for theta, label in [(None, "sample_1000step"), (45.0, "sample_1000step_rotated")]:
        t0 = time.perf_counter()
        final, _ = d.sample(model.apply, n=args.n, image_channels=args.channels,
                            key=random.key(0), theta=theta, params=params)
        jax.block_until_ready(final)
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        final, _ = d.sample(model.apply, n=args.n, image_channels=args.channels,
                            key=random.key(1), theta=theta, params=params)
        jax.block_until_ready(final)
        steady = time.perf_counter() - t0
        print(json.dumps({
            "metric": label,
            "wall_s": round(steady, 3),
            "imgs_per_sec": round(args.n / steady, 2),
            "first_call_s": round(compile_and_run, 1),
            "n": args.n,
            "noise_steps": args.steps,
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
