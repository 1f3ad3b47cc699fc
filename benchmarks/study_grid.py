"""Multi-seed synthetic A-D quality grid with error bars (VERDICT item 6).

No real MNIST/CIFAR data or Inception weights are mounted in this
environment, so published-FID parity cannot be run. This grid instead makes
the *relative-ordering* claim statistical: Configs A-D (variants 0-3), N
seeds each, same recipe, FID/KID in the deterministic RandomFeatures space
(offline; relative comparison only — NOT comparable to published numbers).
The reference's published structure (README.md:176-193) to compare against:
B (alias-free resampling) helps, C (filtered nonlinearities alone) hurts,
D lands between B and A.

Usage: python benchmarks/study_grid.py [--seeds 42,43,44] [--epochs 30]
Writes sample_results/study_grid.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
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
    from aliasfree_diffusion_models_pytorch_tpu.eval import (
        RandomFeatures,
        calculate_metrics,
    )
    from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params
    from aliasfree_diffusion_models_pytorch_tpu.train import train

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="42,43,44")
    ap.add_argument("--variants", default="0,1,2,3")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-gen", type=int, default=256)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    variants = [int(v) for v in args.variants.split(",")]

    root = "/tmp/study_grid"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sample_results",
    )
    os.makedirs(out_dir, exist_ok=True)

    ds = synthetic_dataset(n=2048, image_size=32, channels=1, seed=7)
    train_u8 = np.clip((ds.images + 1) / 2 * 255, 0, 255).astype(np.uint8)
    extractor = RandomFeatures(seed=0)
    d = Diffusion(noise_steps=1000, img_size=32)

    grid: dict[str, dict] = {}
    for variant in variants:
        per_seed = []
        for seed in seeds:
            config = TrainConfig(
                run_name=f"DDPM_Uncondtional_grid_{variant}_{seed}",
                epochs=args.epochs, batch_size=128, image_size=32,
                image_channels=1, dataset="synth", dataset_path=None,
                lr=3e-4, noise_steps=1000, image_gen_n=0, variant=variant,
                filters=None if variant == 0 else FilterSettings(),
                seed=seed, gen_total=0, compute_dtype="bfloat16",
            )
            dl = Dataloader(ds, batch_size=128, seed=seed, drop_last=True)
            t0 = time.time()
            losses = train(config, dl, root=root, sample_each_epoch=False)
            train_s = time.time() - t0

            model, params = _load_model_params(config, root)
            gen = []
            for i in range(args.n_gen // 128):
                x, _ = d.sample(
                    model.apply, n=128, image_channels=1,
                    key=random.fold_in(random.key(seed), 1000 + i),
                    params=params,
                )
                gen.append(np.asarray(x))
            gen_u8 = np.concatenate(gen)
            m = calculate_metrics(gen_u8, train_u8[: args.n_gen], extractor)
            row = {
                "seed": seed,
                "final_loss": round(losses[-1], 4),
                "fid_rf": round(m["frechet_inception_distance"], 3),
                "kid_rf_x100": round(
                    100 * m["kernel_inception_distance_mean"], 3
                ),
                "train_s": round(train_s, 1),
            }
            per_seed.append(row)
            print(json.dumps({"variant": variant, **row}), flush=True)
        fids = [r["fid_rf"] for r in per_seed]
        kids = [r["kid_rf_x100"] for r in per_seed]
        grid[str(variant)] = {
            "runs": per_seed,
            "fid_mean": round(float(np.mean(fids)), 3),
            "fid_std": round(float(np.std(fids)), 3),
            "kid_mean": round(float(np.mean(kids)), 3),
            "kid_std": round(float(np.std(kids)), 3),
        }

    with open(os.path.join(out_dir, "study_grid.json"), "w") as f:
        json.dump({"seeds": seeds, "epochs": args.epochs, "grid": grid}, f,
                  indent=2)

    names = {0: "A (baseline)", 1: "B (alias-free resample)",
             2: "C (filtered nonlin)", 3: "D (B+C)"}
    print("\n| Config | FID-RF (mean ± std) | KID-RF x100 (mean ± std) |")
    print("|---|---|---|")
    for v in variants:
        g = grid[str(v)]
        print(f"| {names.get(v, v)} | {g['fid_mean']} ± {g['fid_std']} "
              f"| {g['kid_mean']} ± {g['kid_std']} |")


if __name__ == "__main__":
    main()
