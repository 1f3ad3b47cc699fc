"""Class-conditional training + classifier-free guidance, measured.

The synthetic dataset ties each class k to a frequency band
(f ≈ 0.6 + 0.28k, see ``data.synthetic_dataset``), so the class of a
generated sample is *measurable*: the dominant 2D-FFT frequency maps back
to a class. This demo trains a conditional Config-D UNet with label
dropout, samples every class at several guidance scales, and reports
class-accuracy — the quantitative version of "CFG makes conditioning
stronger" (expected: accuracy(uncond) ≈ 10% chance, accuracy rises with
cfg_scale).

Usage: python benchmarks/cfg_demo.py [--epochs 40] [--n-per-class 16]
Writes sample_results/cfg_demo.json and sample_results/cfg_demo.png.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FREQ_BASE = 0.6   # class-k band center = FREQ_BASE + FREQ_STEP * k
FREQ_STEP = 0.28
PAD = 256         # zero-padded FFT size for sub-bin frequency resolution


def dominant_frequency(img: np.ndarray) -> float:
    """Mean dominant |frequency| (cycles per image) over the two axes.

    The synthetic patterns are sin(f_y·y+φ)·sin(f_x·x+ψ); the zero-padded
    FFT peak in the positive-frequency quadrant sits at (f_y, f_x).
    """
    h, w = img.shape[:2]
    spec = np.abs(np.fft.fft2(img[..., 0] if img.ndim == 3 else img, s=(PAD, PAD)))
    quad = spec[1 : PAD // 2, 1 : PAD // 2]
    fy, fx = np.unravel_index(np.argmax(quad), quad.shape)
    scale = PAD // h  # padded-bin → image-cycles
    return float((fy + 1 + fx + 1) / 2.0 / scale)


def predicted_class(img: np.ndarray) -> int:
    f = dominant_frequency(img)
    return int(np.clip(round((f - FREQ_BASE) / FREQ_STEP), 0, 9))


def main() -> None:
    import jax
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.data import (
        Dataloader,
        synthetic_dataset,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params
    from aliasfree_diffusion_models_pytorch_tpu.train import train
    from aliasfree_diffusion_models_pytorch_tpu.utils.io import save_image_grid

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-per-class", type=int, default=16)
    ap.add_argument("--label-dropout", type=float, default=0.1)
    ap.add_argument("--ddim-steps", type=int, default=100)
    args = ap.parse_args()

    root = "/tmp/cfg_demo"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sample_results",
    )
    os.makedirs(out_dir, exist_ok=True)

    on_tpu = jax.default_backend() not in ("cpu",)
    config = TrainConfig(
        run_name="DDPM_cfg_demo", epochs=args.epochs, batch_size=128,
        image_size=32, image_channels=1, dataset="synth", dataset_path=None,
        lr=3e-4, noise_steps=1000, image_gen_n=0, variant=3,
        filters=FilterSettings(), seed=42, gen_total=0,
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_classes=10, label_dropout=args.label_dropout,
    )
    ds = synthetic_dataset(n=2048, image_size=32, channels=1, seed=7)

    # Sanity: the frequency estimator must decode the TRAINING data's
    # classes near-perfectly, otherwise accuracy numbers are meaningless.
    est = [predicted_class(ds.images[i]) for i in range(256)]
    est_acc = float(np.mean(np.asarray(est) == ds.labels[:256]))
    print(f"estimator accuracy on training data: {est_acc:.3f}", flush=True)

    dl = Dataloader(ds, batch_size=128, seed=42, drop_last=True)
    t0 = time.time()
    train(config, dl, root=root, sample_each_epoch=False)
    print(f"trained {args.epochs} epochs in {time.time()-t0:.0f}s", flush=True)

    model, params = _load_model_params(config, root)
    d = Diffusion(noise_steps=1000, img_size=32)
    npc = args.n_per_class
    labels = np.repeat(np.arange(10, dtype=np.int32), npc)

    results: dict[str, dict] = {"estimator_acc_on_train": est_acc}
    rows_png = []
    for name, kw in [
        ("uncond", {}),
        ("cond", {"labels": labels}),
        ("cfg3", {"labels": labels, "cfg_scale": 3.0}),
    ]:
        x = d.sample_ddim(
            model.apply, n=10 * npc, image_channels=1,
            key=random.key(123), steps=args.ddim_steps, params=params, **kw,
        )
        x = np.asarray(x)
        pred = np.asarray([predicted_class(x[i] / 127.5 - 1.0) for i in range(len(x))])
        acc = float(np.mean(pred == labels))
        results[name] = {"class_accuracy": round(acc, 4)}
        print(f"{name:7s} class-accuracy {acc:.3f}", flush=True)
        rows_png.append(x[::npc])  # one sample of each class per row

    save_image_grid(
        np.concatenate(rows_png), os.path.join(out_dir, "cfg_demo.png"), nrow=10
    )
    with open(os.path.join(out_dir, "cfg_demo.json"), "w") as f:
        json.dump(
            {"epochs": args.epochs, "label_dropout": args.label_dropout,
             "ddim_steps": args.ddim_steps, "results": results}, f, indent=2,
        )
    print("wrote sample_results/cfg_demo.{json,png}")


if __name__ == "__main__":
    main()
