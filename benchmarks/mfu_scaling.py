"""Is the step's ~10% MFU the framework or the model? Scale the model and see.

The reference architecture (modules/ddpm_models.py:41-251) ties its base
channel width to image_size, so the published 32x32 configs run 32-wide:
4-head attention with head_dim 8-16 (6-12% of the MXU's 128 contraction
lanes), a C_in=3 stem, and FLOP-light filtered GELUs. Those are model
properties, not framework properties. This benchmark holds the training
pipeline fixed (same jitted train step, same Config-D topology, bf16) and
widens the UNet via the `base_width` knob, reporting XLA-cost-analysis
FLOPs/step and MFU at each width. If MFU climbs toward the measured conv
roofline (41-69%, benchmarks/conv_micro.py) as dimensions reach MXU size,
the 10% at width 32 is the reference model's structure — the framework's
mapping to the hardware is not the ceiling.

Measurement discipline (RESULTS.md): timed loops are chained jit steps with
varying PRNG keys and end with a forced device->host scalar fetch.

Usage: python benchmarks/mfu_scaling.py [--widths 32,64,128,256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _compiled_flops, _peak_flops_per_sec  # noqa: E402


def measure(width: int | None, batch: int, iters: int = 20):
    import jax
    import numpy as np
    from jax import random
    import jax.numpy as jnp

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_train_step,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    config = TrainConfig(
        run_name="mfu_scaling",
        epochs=1,
        batch_size=batch,
        image_size=32,
        base_width=width,
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
    flops = _compiled_flops(step, state, images, random.key(0))

    for i in range(3):
        state, loss = step(state, images, random.key(i))
    float(loss)  # drain the dispatch queue (axon tunnel discipline)

    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, images, random.key(100 + i))
    float(loss)  # forced fetch inside the timed region
    step_s = (time.perf_counter() - t0) / iters

    peak = _peak_flops_per_sec(jax.devices()[0].device_kind) if on_tpu else None
    mfu = flops / step_s / peak if (flops and peak) else None
    return {
        "base_width": width or 32,
        "batch": batch,
        "step_ms": round(step_s * 1000, 2),
        "imgs_per_sec": round(batch / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 1) if flops else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }


def main() -> None:
    from bench import setup_persistent_cache

    setup_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="32,64,128,256")
    ap.add_argument("--batch-budget", type=int, default=256 * 32,
                    help="batch*width held ~constant to bound HBM")
    args = ap.parse_args()

    rows = []
    for w in [int(x) for x in args.widths.split(",")]:
        batch = max(16, args.batch_budget // w)
        r = measure(None if w == 32 else w, batch)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print(f"\n{'width':>6} {'batch':>6} {'step ms':>8} {'imgs/s':>9} "
          f"{'GFLOP':>8} {'MFU':>7}")
    for r in rows:
        mfu_str = f"{100 * r['mfu']:.1f}%" if r["mfu"] is not None else "-"
        print(f"{r['base_width']:>6} {r['batch']:>6} {r['step_ms']:>8} "
              f"{r['imgs_per_sec']:>9} {r['gflops_per_step'] or '-':>8} "
              f"{mfu_str:>7}")


if __name__ == "__main__":
    main()
