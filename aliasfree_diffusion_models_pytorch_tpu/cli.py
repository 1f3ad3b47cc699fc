"""Command-line interface.

The reference has no CLI — everything is driven from notebook cells
(``Train.ipynb`` cell 4's params dict). This exposes the same experiment
surface as subcommands, preserving every reference knob and the A/B/C/D
config naming:

    python -m aliasfree_diffusion_models_pytorch_tpu run --variant 3 \
        --dataset MNIST --dataset-path data/mnist_train_small.csv \
        --epochs 100 --batch-size 16 --f-kernel 3 --f-beta 2

Subcommands: ``run`` (full ddpm_run pipeline), ``train`` (training only),
``sample``, ``rotate`` (Config-E θ sweep → video), ``shift``, ``eval``
(IS/FID/KID), ``info`` (device/mesh report).
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--variant", type=int, default=0, help="UNet variant 0-4 (Configs A-D + v4)")
    p.add_argument("--dataset", default="MNIST", help="MNIST | CIFAR10 | MNISTM | ...")
    p.add_argument("--dataset-path", default=None)
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--base-width", type=int, default=None,
                   help="base channel width override (default: image-size, "
                        "the reference quirk); multiple of 4")
    p.add_argument("--image-channels", type=int, default=1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--noise-steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--f-kernel", type=int, default=None, help="filter kernel size (enables filters)")
    p.add_argument("--f-beta", type=float, default=None, help="Kaiser beta")
    p.add_argument("--f-down", type=float, default=None, help="omega_c_down (default pi/2)")
    p.add_argument("--f-up", type=float, default=None, help="omega_c_up (default pi/2)")
    p.add_argument("--no-normalize-filters", action="store_true",
                   help="expose the README's non-normalized kernel configs")
    p.add_argument("--compute-dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--root", default=".", help="artifact root directory")
    p.add_argument("--profile-dir", default=None,
                   help="capture an XLA profiler trace of a few train steps here")
    p.add_argument("--resume", action="store_true",
                   help="resume from the run checkpoint if present")
    p.add_argument("--checkpoint-opt-state", action="store_true",
                   help="checkpoint optimizer state (enables exact resume)")
    p.add_argument("--image-gen-per-epoch", type=int, default=4)
    p.add_argument("--gen-per-batch", type=int, default=200)
    p.add_argument("--gen-total", type=int, default=2000)
    p.add_argument("--num-classes", type=int, default=None,
                   help="class-conditional mode: labels flow from the dataloader")
    p.add_argument("--label-dropout", type=float, default=0.0,
                   help="CFG training: per-sample label-drop probability (~0.1)")
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "warmup_cosine"],
                   help="constant (reference) | linear warmup + cosine decay")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear-warmup optimizer updates (warmup_cosine only)")
    p.add_argument("--lr-min-ratio", type=float, default=0.0,
                   help="cosine floor as a fraction of peak lr")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches averaged per optimizer update "
                        "(effective batch = k * batch-size)")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="global-norm gradient clipping threshold")


def _config_from_args(args) -> "TrainConfig":
    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )

    filters = None
    if args.f_kernel is not None or args.variant != 0:
        filters = FilterSettings(
            kernel_size=args.f_kernel if args.f_kernel is not None else 3,
            kaiser_beta=args.f_beta,
            omega_c_down=args.f_down if args.f_down is not None else math.pi / 2,
            omega_c_up=args.f_up if args.f_up is not None else math.pi / 2,
            normalize=not args.no_normalize_filters,
        )
    return TrainConfig(
        run_name=f"DDPM_Uncondtional_{args.dataset}_{args.variant}",
        epochs=args.epochs,
        batch_size=args.batch_size,
        image_size=args.image_size,
        base_width=getattr(args, "base_width", None),
        image_channels=args.image_channels,
        dataset_path=args.dataset_path,
        lr=args.lr,
        noise_steps=args.noise_steps,
        image_gen_n=args.image_gen_per_epoch,
        variant=args.variant,
        dataset=args.dataset,
        seed=args.seed,
        filters=filters,
        gen_per_batch=args.gen_per_batch,
        gen_total=args.gen_total,
        compute_dtype=args.compute_dtype,
        use_ema=args.use_ema,
        checkpoint_opt_state=getattr(args, "checkpoint_opt_state", False),
        num_classes=args.num_classes,
        label_dropout=args.label_dropout,
        lr_schedule=getattr(args, "lr_schedule", "constant"),
        warmup_steps=getattr(args, "warmup_steps", 0),
        lr_min_ratio=getattr(args, "lr_min_ratio", 0.0),
        grad_accum=getattr(args, "grad_accum", 1),
        grad_clip=getattr(args, "grad_clip", None),
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="aliasfree-diffusion-tpu",
        description="TPU-native alias-free diffusion framework",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name, help_ in [
        ("run", "full experiment pipeline (reference ddpm_run)"),
        ("train", "training only"),
        ("sample", "generate images from a trained checkpoint"),
        ("rotate", "Config-E rotation sweep -> video/GIF"),
        ("shift", "translation sweep"),
        ("eval", "IS/FID/KID between two image folders"),
        ("info", "device and mesh report"),
        ("summary", "model inspection: param count + per-layer shape table"),
        ("sweep", "run the full pipeline for several variants (Train.ipynb cell 8)"),
        ("reproduce-grid", "train + eval the published quality grid (README 176-193)"),
    ]:
        p = sub.add_parser(name, help=help_)
        if name not in ("eval", "info", "reproduce-grid"):
            _add_common(p)
    sub.choices["sample"].add_argument("--n", type=int, default=16)
    sub.choices["sample"].add_argument("--out", default="samples.png")
    sub.choices["sample"].add_argument("--ddim-steps", type=int, default=None,
        help="use the DDIM fast sampler with this many steps (default: 1000-step DDPM)")
    sub.choices["sample"].add_argument("--ddim-eta", type=float, default=0.0)
    sub.choices["sample"].add_argument("--label", type=int, default=None,
        help="conditional sampling: generate this class (needs --num-classes)")
    sub.choices["sample"].add_argument("--cfg-scale", type=float, default=None,
        help="classifier-free guidance scale (needs --label; train with --label-dropout)")
    sub.choices["rotate"].add_argument(
        "--thetas", default="-90:90:9", help="start:stop:count degrees"
    )
    sub.choices["rotate"].add_argument("--out", default="rotation")
    sub.choices["rotate"].add_argument("--fps", type=int, default=15)
    sub.choices["rotate"].add_argument(
        "--save-sweep", default=None, metavar="PATH",
        help="also persist the sweep's finals + trajectories as a .npz "
             "(Results.ipynb cells 19-24 pickle equivalent)",
    )
    sub.choices["shift"].add_argument("--shifts", default="-8,0,8")
    sub.choices["sweep"].add_argument(
        "--variants", default="1,2,3",
        help="comma-separated UNet variants to run (reference sweep: 1,2,3)")
    rg = sub.choices["reproduce-grid"]
    rg.add_argument("--dataset", default="MNIST", help="MNIST | CIFAR10 | MNISTM")
    rg.add_argument("--dataset-path", default=None,
                    help="real training data (CSV for MNIST, image tree otherwise); "
                         "absent -> synthetic fallback, clearly labeled")
    rg.add_argument("--inception-weights", default=None,
                    help="local pt_inception/.npz weights; absent -> RandomFeatures "
                         "(NOT comparable to published numbers)")
    rg.add_argument("--configs", default=None,
                    help="comma-separated subset (default: all 13, e.g. A,D-1N,D-2N)")
    rg.add_argument("--epochs", type=int, default=100)
    rg.add_argument("--batch-size", type=int, default=16)
    rg.add_argument("--seed", type=int, default=42)
    rg.add_argument("--gen-total", type=int, default=2000)
    rg.add_argument("--gen-per-batch", type=int, default=200)
    rg.add_argument("--image-size", type=int, default=32)
    rg.add_argument("--image-channels", type=int, default=None)
    rg.add_argument("--noise-steps", type=int, default=1000)
    rg.add_argument("--root", default=".")
    rg.add_argument("--out", default="sample_results/reproduced_grid.json")
    rg.add_argument("--resume", action="store_true",
                    help="reload finished rows from --out and skip those "
                         "configs (recipe must match the prior artifact)")
    rg.add_argument("--reuse-checkpoints", action="store_true",
                    help="skip training for configs whose checkpoint exists "
                         "under --root (regenerate + re-evaluate only)")
    rg.add_argument("--reuse-generated", action="store_true",
                    help="reuse persisted gen_{dataset}_{config}.npz image "
                         "sets instead of re-sampling (metric recompute)")
    sub.choices["eval"].add_argument("generated_dir")
    sub.choices["eval"].add_argument("reference_dir")
    sub.choices["eval"].add_argument("--limit", type=int, default=None)
    sub.choices["eval"].add_argument("--save", default=None)

    args = parser.parse_args(argv)

    # Long-running subcommands narrate progress via logging.info (per-config
    # grid rows, per-epoch train lines); without a handler those are silent
    # and a multi-hour run looks hung. Root stays WARNING.
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    logging.getLogger().setLevel(logging.WARNING)
    logging.getLogger("aliasfree_diffusion_models_pytorch_tpu").setLevel(
        logging.INFO)

    # Persistent XLA compile cache for every subcommand: cold TPU compiles
    # of the train step / 1000-step sampler scans are minutes on a 1-core
    # host; repeat invocations of the same shapes start in seconds.
    from aliasfree_diffusion_models_pytorch_tpu.utils.cache import (
        setup_persistent_cache,
    )

    setup_persistent_cache()

    if args.cmd == "info":
        import jax
        from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        print(f"backend: {jax.default_backend()}  devices: {len(devices)}")
        for d in devices:
            print(f"  {d}")
        mesh = make_mesh()
        print(f"default mesh: shape={dict(mesh.shape)}")
        return 0

    if args.cmd == "eval":
        from aliasfree_diffusion_models_pytorch_tpu.eval import evaluate_folders

        m = evaluate_folders(
            args.generated_dir, args.reference_dir,
            limit=args.limit, save_path=args.save,
        )
        print(json.dumps(m, indent=2))
        return 0

    if args.cmd == "reproduce-grid":
        from aliasfree_diffusion_models_pytorch_tpu.reproduce import (
            format_grid_markdown,
            reproduce_grid,
        )

        result = reproduce_grid(
            args.dataset, args.dataset_path,
            configs=args.configs.split(",") if args.configs else None,
            inception_weights=args.inception_weights,
            epochs=args.epochs, batch_size=args.batch_size, seed=args.seed,
            gen_total=args.gen_total, gen_per_batch=args.gen_per_batch,
            image_size=args.image_size, image_channels=args.image_channels,
            noise_steps=args.noise_steps, root=args.root, out_path=args.out,
            resume=args.resume, reuse_checkpoints=args.reuse_checkpoints,
            reuse_generated=args.reuse_generated,
        )
        print(format_grid_markdown(result))
        print(f"wrote {args.out}")
        return 0

    config = _config_from_args(args)

    if args.cmd == "summary":
        from aliasfree_diffusion_models_pytorch_tpu.models.unet import model_summary
        from aliasfree_diffusion_models_pytorch_tpu.train import build_model

        print(model_summary(build_model(config)))
        return 0

    if args.cmd == "sweep":
        # The reference's multi-config study driver (Train.ipynb cell 8:
        # ``for unet_v in unet_v_all: ...``) as a first-class subcommand —
        # one full ddpm_run per variant, each in its own run_name tree.
        import dataclasses

        from aliasfree_diffusion_models_pytorch_tpu.tasks import ddpm_run

        for v in (int(s) for s in args.variants.split(",")):
            cfg_v = dataclasses.replace(
                _config_from_args(argparse.Namespace(**{**vars(args), "variant": v})),
                run_name=f"DDPM_Uncondtional_{args.dataset}_{v}",
            )
            print(f"=== sweep: variant {v} -> {cfg_v.run_name} ===")
            ddpm_run(cfg_v, root=args.root)
        return 0

    if args.cmd == "run":
        from aliasfree_diffusion_models_pytorch_tpu.tasks import ddpm_run

        ddpm_run(config, root=args.root)
        return 0

    if args.cmd == "train":
        from aliasfree_diffusion_models_pytorch_tpu.data import get_data
        from aliasfree_diffusion_models_pytorch_tpu.train import train

        dl, _ = get_data(
            config.dataset, config.dataset_path, config.image_size,
            config.batch_size, image_channels=config.image_channels,
            seed=config.seed, synthetic_fallback=True,
        )
        losses = train(config, dl, root=args.root, profile_dir=args.profile_dir, resume=args.resume)
        print(json.dumps({"final_loss": losses[-1] if losses else None}))
        return 0

    if args.cmd == "sample":
        from jax import random

        from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
        from aliasfree_diffusion_models_pytorch_tpu.tasks import (
            _load_model_params,
            _model_fn,
        )
        from aliasfree_diffusion_models_pytorch_tpu.utils.io import save_image_grid

        model, params = _load_model_params(config, args.root)
        d = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
        apply_fn, params = _model_fn(model, params)
        cond = dict(labels=args.label, cfg_scale=args.cfg_scale)
        if args.ddim_steps:
            final = d.sample_ddim(
                apply_fn, n=args.n, image_channels=config.image_channels,
                key=random.key(config.seed), steps=args.ddim_steps,
                eta=args.ddim_eta, params=params, **cond,
            )
        else:
            final, _ = d.sample(
                apply_fn, n=args.n,
                image_channels=config.image_channels, key=random.key(config.seed),
                params=params, **cond,
            )
        save_image_grid(np.asarray(final), args.out)
        print(f"wrote {args.out}")
        return 0

    if args.cmd == "rotate":
        from aliasfree_diffusion_models_pytorch_tpu.tasks import rotation_video

        start, stop, count = (float(v) for v in args.thetas.split(":"))
        path = rotation_video(
            config, np.linspace(start, stop, int(count)), args.out,
            root=args.root, fps=args.fps, save_sweep=args.save_sweep,
        )
        if args.save_sweep:
            print(f"wrote sweep {args.save_sweep}")
        print(f"wrote {path}")
        return 0

    if args.cmd == "shift":
        from aliasfree_diffusion_models_pytorch_tpu.tasks import shift_results
        from aliasfree_diffusion_models_pytorch_tpu.utils.io import save_image_grid

        shifts = [int(s) for s in args.shifts.split(",")]
        outs = shift_results(config, shifts, root=args.root)
        save_image_grid(np.concatenate(outs, axis=0), "shift_sweep.png")
        print("wrote shift_sweep.png")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
