"""End-to-end experiment pipeline.

Rebuild of ``modules/ddpm_tasks.py``: :func:`ddpm_run` mirrors the reference's
"train everything" driver (``ddpm_tasks.py:21-343``) stage for stage —
settings dump, filter/noising/resampling diagnostics, UNet smoke test,
training, loss CSV, checkpoint reload, sampling + denoising demos, batch
generation for FID, collage building — as a library function with saved
artifacts instead of notebook ``plt.show()`` calls.

:func:`rotation_results` / :func:`shift_results` are the Config-E evaluation
drivers (``ddpm_tasks.py:346-392``): per θ (or shift), the SAME rng key is
reused so every sweep starts from identical initial noise — the property that
makes the rotation videos frame-consistent.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from typing import Sequence

import jax
import numpy as np
from jax import random

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings, TrainConfig
from aliasfree_diffusion_models_pytorch_tpu.data import get_data
from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet, param_count
from aliasfree_diffusion_models_pytorch_tpu.ops.filters import (
    circular_lowpass_kernel,
    jinc_filter_2d,
)
from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
    depthwise_fir,
    maxpool2x,
    upsample_bilinear_align_corners,
)
from aliasfree_diffusion_models_pytorch_tpu.train import build_model, train
from aliasfree_diffusion_models_pytorch_tpu.utils import checkpoint as ckpt_lib
from aliasfree_diffusion_models_pytorch_tpu.utils.io import (
    make_collage,
    make_video,
    save_dataset_images,
    save_gen_images,
)
from aliasfree_diffusion_models_pytorch_tpu.utils.plotting import (
    plot_filter_and_response,
    plot_image_panels,
    plot_images,
    plot_loss,
)

logger = logging.getLogger(__name__)


def _load_model_params(config: TrainConfig, root: str):
    """Rebuild the UNet and restore trained params from the run checkpoint.

    Shape-determining knobs (``base_width``) are recovered from the
    ``config.json`` that ``train()`` persists next to the checkpoint — the
    weights fix the width, so a mismatching CLI value can never restore and
    the stored one is authoritative (see ``train.recover_base_width``).
    """
    from aliasfree_diffusion_models_pytorch_tpu.train import recover_base_width

    config = recover_base_width(config, root)
    model = build_model(config)
    template = {
        "params": model.init_params(random.key(0), batch=1),
        "ema_params": model.init_params(random.key(0), batch=1),
        "step": np.zeros((), np.int32),
    }
    restored = ckpt_lib.restore_checkpoint(config.checkpoint_path(root), template)
    params = restored["ema_params"] if config.use_ema else restored["params"]
    return model, params


def _model_fn(model: UNet, params):
    """(apply_fn, params) pair for the samplers — params stay a traced
    argument (baking them into the jitted program as constants would mean
    minutes of compile and a retrace per checkpoint)."""
    return model.apply, params


def resample_ab_demo(
    image: np.ndarray, filters: FilterSettings
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Filtered vs plain down/up-sampling A/B on one real image.

    Reproduces the reference diagnostic (``modules/ddpm_tasks.py:177-278``):

    * filtered chain: original → depthwise jinc FIR (ω_c_down) → MaxPool(2) →
      bilinear 2x up (align_corners=True) → depthwise sinc FIR (ω_c_up);
    * plain chain: original → MaxPool(2) → bilinear 2x up.

    ``image`` is one NHWC float image in [-1, 1] (batch 1). Returns the
    (filtered_stages, plain_stages) dicts of named HWC arrays, ordered as the
    reference's plot titles.
    """
    import jax.numpy as jnp

    x = jnp.asarray(image, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    jinc = circular_lowpass_kernel(
        filters.omega_c_down, filters.kernel_size, filters.kaiser_beta
    )
    sinc = circular_lowpass_kernel(
        filters.omega_c_up, filters.kernel_size, filters.kaiser_beta
    )

    filtered: dict[str, np.ndarray] = {"original": np.asarray(x[0])}
    y = depthwise_fir(x, jinc)
    filtered["downfilter"] = np.asarray(y[0])
    y = maxpool2x(y)
    filtered["downsample"] = np.asarray(y[0])
    y = upsample_bilinear_align_corners(y)
    filtered["upsample"] = np.asarray(y[0])
    y = depthwise_fir(y, sinc)
    filtered["upfilter"] = np.asarray(y[0])

    plain: dict[str, np.ndarray] = {"original": np.asarray(x[0])}
    z = maxpool2x(x)
    plain["downsample"] = np.asarray(z[0])
    z = upsample_bilinear_align_corners(z)
    plain["upsample"] = np.asarray(z[0])
    return filtered, plain


def ddpm_run(
    config: TrainConfig,
    *,
    root: str = ".",
    mesh=None,
    diagnostics: bool = True,
    generate: bool = True,
) -> dict:
    """Full experiment (reference ``ddpm_run``, ``modules/ddpm_tasks.py:21-343``).

    Returns a result dict with per-epoch losses and artifact paths. All
    artifact names/locations follow the reference layout, including its
    typos ("Uncondtional" run dirs, the hardcoded ``trining_loss_MNIST_*.csv``
    filename — ``ddpm_tasks.py:297``).
    """
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s: %(message)s",
        level=logging.INFO,
        datefmt="%I:%M:%S",
    )
    t_run = time.time()
    runs_dir = config.runs_dir(root)
    os.makedirs(runs_dir, exist_ok=True)

    # 1. Settings snapshot (ddpm_tasks.py:74-121).
    settings_path = os.path.join(
        runs_dir, f"settings_{config.dataset}_{config.variant}.txt"
    )
    with open(settings_path, "w") as f:
        f.write(config.settings_text())
    logger.info("device(s): %s", jax.devices())

    # 2. Filter diagnostics (ddpm_tasks.py:125-136).
    if diagnostics and config.filters is not None:
        fs = config.filters
        for name, kern in [
            ("jinc2d", jinc_filter_2d(fs.kernel_size, fs.kaiser_beta or 14.0)),
            ("circular", circular_lowpass_kernel(fs.omega_c_down, fs.kernel_size)),
            ("circular_kaiser",
             circular_lowpass_kernel(fs.omega_c_down, fs.kernel_size, fs.kaiser_beta)),
        ]:
            plot_filter_and_response(
                kern, os.path.join(runs_dir, f"filter_{name}.png")
            )

    # 3. UNet smoke test (ddpm_tasks.py:140-148): param count + an *executed*
    # forward pass on random input (the reference runs it, not just shapes).
    model = build_model(config)
    smoke_params = model.init_params(random.key(0), batch=2)
    logger.info("UNet parameters: %s", f"{param_count(smoke_params):,}")
    x = np.asarray(
        random.normal(
            random.key(1),
            (2, config.image_size, config.image_size, config.image_channels),
        )
    )
    t = np.full((2,), min(500, config.noise_steps - 1), np.int64)
    out = jax.block_until_ready(model.apply(smoke_params, x, t))
    assert out.shape == x.shape, (out.shape, x.shape)
    assert bool(np.isfinite(np.asarray(out)).all()), "UNet smoke forward non-finite"
    logger.info("UNet forward: %s -> %s", x.shape, out.shape)
    del smoke_params, out

    # 4. Data + noising visualization (ddpm_tasks.py:151-173).
    dataloader, dataset = get_data(
        config.dataset, config.dataset_path, config.image_size, config.batch_size,
        image_channels=config.image_channels, seed=config.seed,
        synthetic_fallback=True,
    )
    diffusion = Diffusion(
        noise_steps=config.noise_steps, beta_start=config.beta_start,
        beta_end=config.beta_end, img_size=config.image_size,
    )
    if diagnostics:
        img = jax.numpy.asarray(dataset.images[:1].repeat(9, axis=0))
        tvis = jax.numpy.asarray(
            np.round(np.linspace(0, config.noise_steps - 1, 9)).astype(np.int32)
        )
        noised, _ = diffusion.noise_images(img, tvis, random.key(config.seed))
        plot_images(
            np.asarray(Diffusion.to_uint8(noised)),
            os.path.join(runs_dir, "noising_chain.png"),
        )

    # 4b. Filtered vs plain resampling A/B on a real training image
    # (ddpm_tasks.py:177-278) — the visual argument for alias-free blocks.
    if diagnostics and config.filters is not None:
        filtered, plain = resample_ab_demo(dataset.images[0], config.filters)
        plot_image_panels(
            list(filtered.values()), list(filtered.keys()),
            os.path.join(runs_dir, "resample_filtered.png"),
        )
        plot_image_panels(
            list(plain.values()), list(plain.keys()),
            os.path.join(runs_dir, "resample_plain.png"),
        )

    # 5. Train (ddpm_tasks.py:285-293) + loss artifacts (:296-299).
    loss_all = train(config, dataloader, root=root, mesh=mesh)
    plot_loss(loss_all, os.path.join(runs_dir, "loss.png"))
    loss_csv = os.path.join(runs_dir, f"trining_loss_MNIST_{config.variant}.csv")  # [sic]
    with open(loss_csv, "w", newline="") as f:
        csv.writer(f).writerow(loss_all)

    # 6. Reload checkpoint; sample + denoise demos (ddpm_tasks.py:306-321).
    model, params = _load_model_params(config, root)
    apply_fn, params = _model_fn(model, params)
    key = random.key(config.seed)
    finals, _ = diffusion.sample(apply_fn, n=6, image_channels=config.image_channels,
                                 key=key, params=params)
    plot_images(np.asarray(finals), os.path.join(runs_dir, "samples.png"))
    traj = diffusion.revert(apply_fn, n=1, image_channels=config.image_channels,
                            key=key, params=params)
    plot_images(np.asarray(traj), os.path.join(runs_dir, "denoising.png"))

    # 7. Optional training-set export for FID reference (ddpm_tasks.py:325-329).
    gen_dir = os.path.join(
        root, f"images/generated/{config.dataset}_{config.variant}"
    )
    if config.save_training:
        save_dataset_images(
            os.path.join(root, f"images/original/{config.dataset}"), dataset.images
        )

    # 8. Batch generation for the metric set (ddpm_tasks.py:332-336) + collages.
    if generate and config.gen_total > 0:
        for start_no in range(0, config.gen_total, config.gen_per_batch):
            # The sampler batch stays at gen_per_batch (one compiled shape for
            # every chunk); the trailing chunk only *saves* the images that
            # were asked for, so exactly gen_total files are written.
            n_save = min(config.gen_per_batch, config.gen_total - start_no)
            fileno = np.arange(start_no, start_no + n_save)
            x, _ = diffusion.sample(
                apply_fn, n=config.gen_per_batch,
                image_channels=config.image_channels,
                key=random.fold_in(random.key(config.seed), start_no),
                params=params,
            )
            save_gen_images(gen_dir, np.asarray(x)[:n_save], fileno)
        # Clamp the collage request to what was actually generated — the CLI
        # exposes gen_total but not the collage knobs, and a collage_n above
        # gen_total would reference missing image_{i}.png files (found by
        # driving `run --gen-total 128` with the default collage_n=2000).
        collage_total = min(config.collage_n, config.gen_total)
        per_collage = min(config.collage_n_per_image, collage_total)
        if per_collage >= 1:
            make_collage(
                gen_dir, gen_dir, per_collage, collage_total, config.image_size,
            )

    logger.info("ddpm_run finished in %.1fs", time.time() - t_run)
    return {
        "loss_all": loss_all,
        "settings_path": settings_path,
        "loss_csv": loss_csv,
        "checkpoint": config.checkpoint_path(root),
        "gen_dir": gen_dir,
    }


def rotation_results(
    config: TrainConfig,
    thetas: Sequence[float],
    *,
    root: str = ".",
    n: int = 4,
    rotation_order: int = 3,
):
    """Config-E sweep (``ddpm_tasks.py:346-369``): same key per θ → identical
    initial noise, directly comparable rotations. Returns (finals, trajectories)
    lists of uint8 arrays."""
    model, params = _load_model_params(config, root)
    apply_fn, params = _model_fn(model, params)
    diffusion = Diffusion(
        noise_steps=config.noise_steps, beta_start=config.beta_start,
        beta_end=config.beta_end, img_size=config.image_size,
    )
    key = random.key(config.seed)
    x_all, results_all = [], []
    for theta in thetas:
        x, results = diffusion.sample(
            apply_fn, n=n, image_channels=config.image_channels, key=key,
            theta=float(theta), rotation_order=rotation_order, params=params,
        )
        x_all.append(np.asarray(x))
        results_all.append(np.asarray(results))
    return x_all, results_all


def shift_results(
    config: TrainConfig,
    shifts: Sequence[int],
    *,
    root: str = ".",
    n: int = 4,
):
    """Translation sweep (``ddpm_tasks.py:371-392``)."""
    model, params = _load_model_params(config, root)
    apply_fn, params = _model_fn(model, params)
    diffusion = Diffusion(
        noise_steps=config.noise_steps, beta_start=config.beta_start,
        beta_end=config.beta_end, img_size=config.image_size,
    )
    key = random.key(config.seed)
    return [
        np.asarray(
            diffusion.sample_shift(
                apply_fn, n=n, image_channels=config.image_channels, key=key,
                shift=int(s), params=params,
            )
        )
        for s in shifts
    ]


def rotation_video(
    config: TrainConfig,
    thetas: Sequence[float],
    vname: str,
    *,
    root: str = ".",
    fps: int = 15,
    save_sweep: str | None = None,
) -> str:
    """θ-sweep → per-θ final frames → video/GIF (Results.ipynb cells 17-24).

    ``save_sweep`` additionally persists the sweep's finals + trajectories
    for later re-analysis (the Results.ipynb cells 19-24 pickle equivalent).
    """
    x_all, traj_all = rotation_results(config, thetas, root=root, n=1)
    if save_sweep:
        save_rotation_sweep(save_sweep, thetas, x_all, traj_all)
    frames = np.concatenate(x_all, axis=0)
    return make_video(frames, vname, fps=fps)


def save_rotation_sweep(
    path: str,
    thetas: Sequence[float],
    finals: Sequence[np.ndarray],
    trajectories: Sequence[np.ndarray],
) -> str:
    """Persist a Config-E θ-sweep (finals + denoising trajectories per θ).

    The reference keeps these only as in-notebook pickles
    (``Results.ipynb`` cells 19-24); here they are a first-class compressed
    ``.npz`` artifact: ``thetas`` (K,), ``finals`` (K, n, H, W, C) uint8,
    ``trajectories`` (K, T, n, H, W, C) uint8. Load with
    :func:`load_rotation_sweep`.
    """
    if not path.endswith(".npz"):
        path += ".npz"
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(
        path,
        thetas=np.asarray(thetas, np.float64),
        finals=np.stack([np.asarray(f) for f in finals]),
        trajectories=np.stack([np.asarray(t) for t in trajectories]),
    )
    return path


def load_rotation_sweep(path: str) -> dict[str, np.ndarray]:
    """Load a sweep saved by :func:`save_rotation_sweep`."""
    with np.load(path) as z:
        return {k: z[k] for k in ("thetas", "finals", "trajectories")}
