"""Measure the ACTUAL reference PyTorch stack (VERDICT round-1 item 4).

Round 1's ``vs_baseline`` divided by an invented A100 estimate. This script
puts the denominator on defensible footing with two measurements of the real
reference code (imported read-only from ``/root/reference``; no GPU exists in
this environment):

1. **Measured CPU throughput** of the reference train step (UNet variant 3,
   32x32x3, AdamW, MSE — exactly ``modules/ddpm_utils.py:483-519``'s inner
   loop) at the reference's batch 16 and at the bench batch 256.
2. **A dispatch-bound A100 estimate**: eager small-model torch training on a
   fast GPU is bounded by kernel-launch + Python dispatch, not FLOPs. We
   count the ops actually dispatched per training step with
   ``torch.profiler`` and convert with the standard 5-10 µs/launch eager
   overhead window, reporting the optimistic end (more favorable to the
   baseline → conservative for our speedup claim).

Writes the JSON block consumed by BASELINE.md / bench.py documentation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn

from tests._reference_oracle import load_reference_modules, reference_available

LAUNCH_OVERHEAD_US = (5.0, 10.0)  # per-op eager dispatch+launch window on GPU


def train_steps_per_sec(model, diffusion, batch: int, n_steps: int) -> float:
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    mse = nn.MSELoss()
    images = torch.randn(batch, 3, 32, 32)
    # warmup
    for _ in range(2):
        t = diffusion.sample_timesteps(batch).to("cpu")
        x_t, noise = diffusion.noise_images(images, t)
        loss = mse(noise, model(x_t, t))
        opt.zero_grad()
        loss.backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        t = diffusion.sample_timesteps(batch).to("cpu")
        x_t, noise = diffusion.noise_images(images, t)
        loss = mse(noise, model(x_t, t))
        opt.zero_grad()
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return batch * n_steps / dt


def ops_per_step(model, diffusion, batch: int) -> int:
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    mse = nn.MSELoss()
    images = torch.randn(batch, 3, 32, 32)
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU]) as prof:
        t = diffusion.sample_timesteps(batch).to("cpu")
        x_t, noise = diffusion.noise_images(images, t)
        loss = mse(noise, model(x_t, t))
        opt.zero_grad()
        loss.backward()
        opt.step()
    events = [e for e in prof.events() if e.name.startswith("aten::")]
    return len(events)


def main() -> None:
    assert reference_available(), "reference checkout not found"
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    ref_models = load_reference_modules()
    f_settings = {
        "kernel_size": 3,
        "kaiser_beta": 2.0,
        "omega_c_down": np.pi / 2,
        "omega_c_up": np.pi / 2,
    }
    model = ref_models.UNet(
        c_in=3, c_out=3, image_size=32, device="cpu", f_settings=f_settings,
        variant=3,
    )
    diffusion = ref_models.Diffusion(
        noise_steps=1000, img_size=32, device="cpu"
    )

    cpu16 = train_steps_per_sec(model, diffusion, batch=16, n_steps=4)
    cpu64 = train_steps_per_sec(model, diffusion, batch=64, n_steps=2)
    n_ops = ops_per_step(model, diffusion, batch=16)

    # Dispatch-bound A100 window: step time >= n_ops * overhead; eager
    # compute at batch 16 on an A100 is negligible next to dispatch for a
    # 1.5M-param model. Optimistic end = fastest plausible baseline.
    est_lo = 16 / (n_ops * LAUNCH_OVERHEAD_US[1] * 1e-6)
    est_hi = 16 / (n_ops * LAUNCH_OVERHEAD_US[0] * 1e-6)

    print(json.dumps({
        "torch_cpu_imgs_per_sec_batch16": round(cpu16, 1),
        "torch_cpu_imgs_per_sec_batch64": round(cpu64, 1),
        "aten_ops_per_step_batch16": n_ops,
        "a100_dispatch_bound_estimate_imgs_per_sec": [
            round(est_lo, 0), round(est_hi, 0)
        ],
        "threads": torch.get_num_threads(),
        "note": (
            "reference torch stack measured on this host CPU; A100 window "
            "from per-step op count x 5-10us eager dispatch overhead"
        ),
    }))


if __name__ == "__main__":
    main()
