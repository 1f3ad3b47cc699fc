"""Class-conditional training + classifier-free guidance in ~30 lines.

The reference defines a conditional UNet but never trains or samples it
(``modules/ddpm_models.py:253-258``); this framework makes it a first-class
path. Train with ``num_classes`` + ``label_dropout``, then sample any class
— optionally guided. Runs on CPU or TPU; the synthetic dataset's classes
are frequency bands, so generated classes are visually distinct stripes.

For the measured version of this demo (class-accuracy from FFT decoding:
chance → 76% conditional → 88% at cfg_scale=3), see
``benchmarks/cfg_demo.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax import random

from aliasfree_diffusion_models_pytorch_tpu import Diffusion, FilterSettings, TrainConfig
from aliasfree_diffusion_models_pytorch_tpu.data import Dataloader, synthetic_dataset
from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params
from aliasfree_diffusion_models_pytorch_tpu.train import train
from aliasfree_diffusion_models_pytorch_tpu.utils.io import save_image_grid

config = TrainConfig(
    run_name="DDPM_conditional_example",
    epochs=5, batch_size=64, image_size=32, image_channels=1,
    dataset="synth", dataset_path=None,
    lr=3e-4, noise_steps=1000, variant=3, filters=FilterSettings(),
    seed=42, gen_total=0,
    num_classes=10, label_dropout=0.1,  # the CFG training recipe
)

dl = Dataloader(synthetic_dataset(n=512, image_size=32, channels=1, seed=7),
                batch_size=64, seed=42, drop_last=True)
train(config, dl, root="/tmp/cond_example", sample_each_epoch=False)

model, params = _load_model_params(config, "/tmp/cond_example")
d = Diffusion(noise_steps=1000, img_size=32)

# One row per class, guided: eps = eps_u + s*(eps_c - eps_u), one
# batch-doubled forward per step.
labels = np.repeat(np.arange(10, dtype=np.int32), 4)
imgs = d.sample_ddim(
    model.apply, n=40, image_channels=1, key=random.key(0),
    steps=50, labels=labels, cfg_scale=3.0, params=params,
)
save_image_grid(np.asarray(imgs), "/tmp/cond_example/classes.png", nrow=4)
print("wrote /tmp/cond_example/classes.png (rows = classes 0..9)")
