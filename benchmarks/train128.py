"""128x128 training capability probe: S=16384 flash attention in a real step.

The round-5 handoff measurement (`sample_results/attn_handoff.json`) moved
the flash-attention gate cap from S<=4096 to S<=16384 — but S=16384 had only
ever run as an isolated kernel benchmark. This probe runs it inside a full
jitted train step at image_size=128, the next resolution doubling above the
reference's own CelebA-64 family (`Train.ipynb` cell 4), in two regimes:

- reference quirk: base width == image size (128 -> 8.9M-param-per-stage
  scale; `modules/ddpm_models.py:41-251` ties width to image_size), batch 4;
- capacity-fixed: ``base_width=32`` (the published 32x32 model's widths at
  128px resolution), batch 8 — isolates the pure resolution-scaling cost.

Each regime reports step wall-clock, XLA cost-analysis FLOPs, and MFU vs the
chip's bf16 peak. Writes sample_results/train128.json.

Usage:  python benchmarks/train128.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from bench import _compiled_flops, _note, _peak_flops_per_sec, setup_persistent_cache


def run_regime(name: str, *, base_width, batch: int) -> dict:
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
        create_train_state,
        make_train_step,
    )

    config = TrainConfig(
        run_name=f"bench128-{name}",
        epochs=1,
        batch_size=batch,
        image_size=128,
        image_channels=3,
        dataset="CIFAR10",
        dataset_path=None,
        lr=3e-4,
        noise_steps=1000,
        variant=3,
        base_width=base_width,
        filters=FilterSettings(),
        compute_dtype="bfloat16",
    )
    model, state = create_train_state(config, random.key(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    diffusion = Diffusion(noise_steps=1000, img_size=128)
    step = make_train_step(model, config, diffusion, mesh=None)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 128, 128, 3)).astype(np.float32))

    flops = _compiled_flops(step, state, images, random.key(0))
    _note(f"[{name}] params={n_params:,} flops/step={flops}")
    for i in range(3):
        state, loss = step(state, images, random.key(i))
    float(loss)  # forced fetch — axon-tunnel timing discipline (bench.py)
    _note(f"[{name}] compiled + warm")

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, images, random.key(100 + i))
    final_loss = float(loss)
    step_s = (time.perf_counter() - t0) / n_steps

    peak = _peak_flops_per_sec(jax.devices()[0].device_kind)
    return {
        "regime": name,
        "base_width": base_width,
        "batch": batch,
        "params": n_params,
        "step_ms": round(1000 * step_s, 2),
        "imgs_per_sec": round(batch / step_s, 1),
        "flops_per_step": flops,
        "mfu": round(flops / step_s / peak, 4) if (flops and peak) else None,
        "final_loss": round(final_loss, 4),
    }


def main() -> None:
    setup_persistent_cache()
    import jax

    _note(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    if jax.default_backend() == "cpu":
        _note("no accelerator; this probe is TPU-only")
        return

    rows = [
        run_regime("reference-quirk-w128", base_width=None, batch=4),
        run_regime("capacity-fixed-w32", base_width=32, batch=8),
    ]
    out = {"probe": "train128", "device": jax.devices()[0].device_kind,
           "compute_dtype": "bfloat16", "rows": rows}
    with open("sample_results/train128.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
