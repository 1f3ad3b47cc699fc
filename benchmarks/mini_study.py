"""Mini quality study on TPU: Config A vs Config D on synthetic data.

Real MNIST/CIFAR data is not mounted in this environment, so this is a
*relative* study on the procedural synthetic dataset: trains variants 0 and 3
with the same recipe, generates samples, scores FID/KID in the offline
RandomFeatures space (NOT comparable to published numbers — relative only),
and exports the Config-E rotation sweep GIF from the trained Config-D model.

Artifacts land in ``sample_results/`` + ``RESULTS.md`` fragments on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
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
    from aliasfree_diffusion_models_pytorch_tpu.tasks import (
        _load_model_params,
        rotation_results,
    )
    from aliasfree_diffusion_models_pytorch_tpu.train import train
    from aliasfree_diffusion_models_pytorch_tpu.utils.io import (
        make_video,
        save_gif_frames,
        save_image_grid,
    )

    root = "/tmp/mini_study"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sample_results")
    os.makedirs(out_dir, exist_ok=True)

    ds = synthetic_dataset(n=2048, image_size=32, channels=1, seed=7)
    train_u8 = np.clip((ds.images + 1) / 2 * 255, 0, 255).astype(np.uint8)
    extractor = RandomFeatures(seed=0)

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="0,3")
    ap.add_argument("--skip-rotation", action="store_true")
    args = ap.parse_args()
    variants = tuple(int(v) for v in args.variants.split(","))

    results = {}
    for variant in variants:
        config = TrainConfig(
            run_name=f"DDPM_Uncondtional_synth_{variant}",
            epochs=30, batch_size=128, image_size=32, image_channels=1,
            dataset="synth", dataset_path=None, lr=3e-4, noise_steps=1000,
            image_gen_n=4, variant=variant,
            filters=None if variant == 0 else FilterSettings(),
            seed=42, gen_total=0, compute_dtype="bfloat16",
        )
        dl = Dataloader(ds, batch_size=128, seed=42, drop_last=True)
        t0 = time.time()
        losses = train(config, dl, root=root, sample_each_epoch=False)
        train_s = time.time() - t0

        model, params = _load_model_params(config, root)
        d = Diffusion(noise_steps=1000, img_size=32)
        gen = []
        for i in range(2):
            x, _ = d.sample(model.apply, n=128, image_channels=1,
                            key=random.fold_in(random.key(42), i), params=params)
            gen.append(np.asarray(x))
        gen_u8 = np.concatenate(gen)
        save_image_grid(gen_u8[:64], os.path.join(out_dir, f"samples_v{variant}.png"))

        m = calculate_metrics(gen_u8, train_u8[:256], extractor)
        results[variant] = {
            "final_loss": round(losses[-1], 4),
            "first_loss": round(losses[0], 4),
            "train_s": round(train_s, 1),
            "fid_random_feats": round(m["frechet_inception_distance"], 3),
            "kid_x100_random_feats": round(
                100 * m["kernel_inception_distance_mean"], 3),
        }
        print(json.dumps({"variant": variant, **results[variant]}), flush=True)

    if args.skip_rotation:
        with open(os.path.join(out_dir, f"mini_study_{args.variants.replace(',', '_')}.json"), "w") as f:
            json.dump(results, f, indent=2)
        return

    # Config-E rotation sweep on the trained Config-D model → GIF.
    config3 = TrainConfig(
        run_name="DDPM_Uncondtional_synth_3",
        epochs=30, batch_size=128, image_size=32, image_channels=1,
        dataset="synth", dataset_path=None, lr=3e-4, noise_steps=1000,
        variant=3, filters=FilterSettings(), seed=42, gen_total=0,
        compute_dtype="bfloat16",
    )
    thetas = np.linspace(-90, 90, 9)
    x_all, _ = rotation_results(config3, thetas, root=root, n=1)
    frames = np.concatenate(x_all, axis=0)
    save_gif_frames([f for f in frames], os.path.join(out_dir, "rotation_sweep_v3"),
                    fps=3)
    # A baseline-loss curve comparison image.
    print(json.dumps({"rotation_gif": "sample_results/rotation_sweep_v3.gif",
                      "thetas": list(map(float, thetas))}), flush=True)
    with open(os.path.join(out_dir, "mini_study.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
