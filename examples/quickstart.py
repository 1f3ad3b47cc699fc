"""Quickstart: train Config D, sample (DDPM + DDIM + rotated), evaluate.

Runs on CPU or TPU; synthetic data is used when no dataset path is given.
Mirrors the reference's Train.ipynb -> Results.ipynb -> Perf_evaluation.ipynb
flow as ~40 lines of library calls.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax import random

from aliasfree_diffusion_models_pytorch_tpu import Diffusion, FilterSettings, TrainConfig
from aliasfree_diffusion_models_pytorch_tpu.data import get_data
from aliasfree_diffusion_models_pytorch_tpu.eval import RandomFeatures, calculate_metrics
from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params
from aliasfree_diffusion_models_pytorch_tpu.train import train
from aliasfree_diffusion_models_pytorch_tpu.utils.io import save_image_grid

config = TrainConfig(
    run_name="DDPM_Uncondtional_quickstart_3",
    epochs=5, batch_size=64, image_size=32, image_channels=1,
    dataset="quickstart", dataset_path=None,  # synthetic fallback
    lr=3e-4, noise_steps=1000, variant=3, filters=FilterSettings(),
    seed=42, gen_total=0, compute_dtype="float32",
)

dataloader, dataset = get_data(
    config.dataset, config.dataset_path, config.image_size, config.batch_size,
    image_channels=config.image_channels, seed=config.seed, synthetic_fallback=True,
)
losses = train(config, dataloader, sample_each_epoch=False)
print(f"losses: {[round(l, 3) for l in losses]}")

model, params = _load_model_params(config, ".")
d = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
key = random.key(config.seed)

final, trajectory = d.sample(model.apply, n=8, image_channels=1, key=key, params=params)
save_image_grid(np.asarray(final), "quickstart_samples.png")

fast = d.sample_ddim(model.apply, n=8, image_channels=1, key=key, steps=50, params=params)
rotated, _ = d.sample(model.apply, n=4, image_channels=1, key=key, theta=45.0, params=params)

m = calculate_metrics(
    np.asarray(final),
    np.clip((dataset.images[:256] + 1) / 2 * 255, 0, 255).astype(np.uint8),
    RandomFeatures(),
)
print({k: round(v, 3) if isinstance(v, float) else v for k, v in m.items()})
