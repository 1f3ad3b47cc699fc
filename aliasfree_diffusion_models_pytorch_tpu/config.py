"""Typed configuration objects.

Replaces the reference's untyped ``argument`` class
(``modules/ddpm_utils.py:11-23``) and the ad-hoc ``f_settings`` dict built in
``ddpm_run`` (``modules/ddpm_tasks.py:44-51``) with validated dataclasses that
serialize to/from plain dicts (so the notebook-style ``params`` dict of
``Train.ipynb`` cell 4 still round-trips through :func:`TrainConfig.from_params`).
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class FilterSettings:
    """Low-pass filter design knobs for the alias-free ops.

    Mirrors the reference ``f_settings`` dict: ``kernel_size``, ``kaiser_beta``,
    ``omega_c_down``, ``omega_c_up`` (``modules/ddpm_tasks.py:44-51``).
    Canonical published values: kernel_size=3, kaiser_beta in {0,1,2},
    omega_c_down = omega_c_up = pi/2 (``Train.ipynb`` cell 8).

    ``normalize`` extends the reference: ``circularLowpassKernel`` always
    normalizes (``modules/filtrs.py:36``), making the README's
    "non-normalized" configs unreachable in the shipped code; we expose the
    flag explicitly so both families are expressible.
    """

    kernel_size: int = 3
    kaiser_beta: float | None = 2.0
    omega_c_down: float = math.pi / 2
    omega_c_up: float = math.pi / 2
    normalize: bool = True

    def __post_init__(self) -> None:
        if self.kernel_size < 1:
            raise ValueError(f"kernel_size must be >= 1, got {self.kernel_size}")
        for name in ("omega_c_down", "omega_c_up"):
            w = getattr(self, name)
            if not (0.0 < w <= math.pi + 1e-9):
                raise ValueError(f"{name} must be in (0, pi], got {w}")

    @classmethod
    def from_params(cls, params: Mapping[str, Any]) -> "FilterSettings | None":
        """Build from a reference-style params dict; None if unfiltered.

        Parity with ``ddpm_run``'s ``f_settings`` derivation
        (``modules/ddpm_tasks.py:44-51``): a ``None`` ``f_kernel`` means no
        filters (variant 0 / Config A).
        """
        if params.get("f_kernel") is None:
            return None
        return cls(
            kernel_size=int(params["f_kernel"]),
            kaiser_beta=params.get("f_beta"),
            omega_c_down=float(params["f_down"]),
            omega_c_up=float(params["f_up"]),
            normalize=bool(params.get("f_normalize", True)),
        )

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Full experiment configuration.

    Field-for-field superset of the reference ``argument`` object
    (``modules/ddpm_utils.py:11-23``) plus the extra ``ddpm_run`` params
    (``modules/ddpm_tasks.py:21-63``) and TPU-specific knobs.
    """

    # --- reference `argument` fields ---
    run_name: str = "DDPM_Uncondtional_MNIST_0"  # typo preserved for artifact-path parity
    epochs: int = 100
    batch_size: int = 16
    image_size: int = 32
    image_channels: int = 3
    dataset_path: str | None = None
    lr: float = 3e-4
    noise_steps: int = 1000
    image_gen_n: int = 4

    # --- reference ddpm_run params ---
    variant: int = 0
    dataset: str = "MNIST"
    seed: int = 42
    filters: FilterSettings | None = None
    gen_per_batch: int = 200
    gen_total: int = 2000
    collage_n_per_image: int = 400
    collage_n: int = 2000
    save_training: bool = False

    # --- diffusion schedule (reference Diffusion defaults,
    #     modules/ddpm_models.py:302) ---
    beta_start: float = 1e-4
    beta_end: float = 0.02

    # --- TPU-native knobs (no reference equivalent) ---
    mesh_shape: tuple[int, ...] = (1,)
    mesh_axes: tuple[str, ...] = ("data",)
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    use_ema: bool = False  # reference EMA class exists but is never wired in
    ema_beta: float = 0.995
    # The filtered GELU lowers to the polyphase elementwise formulation
    # (ops/resample.py:filtered_gelu_phases; AFDM_FG_IMPL overrides) — the
    # measured winner over both the grouped-conv XLA path and two generations
    # of hand-fused Pallas kernels (post-mortem in ops/resample.py docs).
    checkpoint_opt_state: bool = False  # reference saves weights only
    time_dim: int = 256
    # Capacity knob: the reference ties the UNet's base channel width to
    # image_size (modules/ddpm_models.py:41-251); base_width=None keeps that
    # quirk, an int overrides the widths without changing the resolution
    # (multiple of 4 — the 4-head attention splits channels evenly).
    base_width: int | None = None
    # Class-conditional mode: the reference defines the conditional UNet
    # (modules/ddpm_models.py:253-258) but its pipeline never trains it;
    # here it is a first-class option (labels flow from the dataloader).
    num_classes: int | None = None
    # Classifier-free-guidance training: per-sample probability of dropping
    # the label embedding during a conditional train step (Ho & Salimans
    # 2022). 0.0 = pure conditional training (reference semantics); ~0.1 is
    # the standard CFG recipe. Only meaningful with num_classes set.
    label_dropout: float = 0.0
    # --- production optimizer knobs (opt-in; defaults = exact reference
    #     semantics: constant lr, no clipping, one batch per update —
    #     modules/ddpm_utils.py:489 `optim.AdamW(lr)`) ---
    lr_schedule: str = "constant"  # "constant" | "warmup_cosine"
    warmup_steps: int = 0  # linear-warmup updates (warmup_cosine only)
    lr_min_ratio: float = 0.0  # cosine floor as a fraction of peak lr
    # Cosine decay horizon in OPTIMIZER UPDATES. None = train() derives it
    # (epochs x steps-per-epoch / grad_accum); required for direct
    # make_optimizer() use with warmup_cosine.
    lr_total_steps: int | None = None
    # Gradient accumulation: average grads over k micro-batches per optimizer
    # update (optax.MultiSteps) — effective batch = k * batch_size without
    # the memory. EMA blending gates itself onto emit steps.
    grad_accum: int = 1
    grad_clip: float | None = None  # global-norm gradient clipping

    def __post_init__(self) -> None:
        if not 0 <= self.variant <= 4:
            raise ValueError("variant value must be between 0 and 4")
        if self.variant != 0 and self.filters is None:
            raise ValueError("f_settings is empty")  # reference error string
        if self.image_size % 8 != 0:
            raise ValueError(
                f"image_size must be divisible by 8 (3 down stages), got {self.image_size}"
            )
        if self.base_width is not None and (
            self.base_width < 4 or self.base_width % 4 != 0
        ):
            raise ValueError(
                f"base_width must be a positive multiple of 4 (4-head "
                f"attention), got {self.base_width}"
            )
        if self.batch_size < 1 or self.epochs < 0:
            raise ValueError("batch_size must be >= 1 and epochs >= 0")
        if self.noise_steps < 2:
            raise ValueError("noise_steps must be >= 2")
        if not 0.0 <= self.label_dropout < 1.0:
            raise ValueError(
                f"label_dropout must be in [0, 1), got {self.label_dropout}"
            )
        if self.label_dropout > 0.0 and self.num_classes is None:
            raise ValueError("label_dropout requires num_classes")
        if self.lr_schedule not in ("constant", "warmup_cosine"):
            raise ValueError(
                f"lr_schedule must be 'constant' or 'warmup_cosine', "
                f"got {self.lr_schedule!r}"
            )
        if self.warmup_steps < 0:
            raise ValueError(f"warmup_steps must be >= 0, got {self.warmup_steps}")
        if not 0.0 <= self.lr_min_ratio <= 1.0:
            raise ValueError(
                f"lr_min_ratio must be in [0, 1], got {self.lr_min_ratio}"
            )
        if self.lr_total_steps is not None and self.lr_total_steps < 1:
            raise ValueError(
                f"lr_total_steps must be >= 1, got {self.lr_total_steps}"
            )
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {self.grad_accum}")
        if self.grad_clip is not None and self.grad_clip <= 0.0:
            raise ValueError(f"grad_clip must be > 0, got {self.grad_clip}")

    @classmethod
    def from_params(cls, params: Mapping[str, Any]) -> "TrainConfig":
        """Build from a reference ``Train.ipynb``-style params dict."""
        variant = int(params["unet_v"])
        dataset = params["dataset"]
        return cls(
            run_name=f"DDPM_Uncondtional_{dataset}_{variant}",
            epochs=int(params["epochs"]),
            batch_size=int(params["batchsize"]),
            image_size=int(params["image_size"]),
            image_channels=int(params["image_channels"]),
            dataset_path=params.get("dataset_dir"),
            lr=float(params["lr"]),
            noise_steps=int(params["noise_steps"]),
            image_gen_n=int(params.get("image_gen_per_epoch", 4)),
            variant=variant,
            dataset=dataset,
            seed=int(params.get("seed", 42)),
            filters=FilterSettings.from_params(params),
            gen_per_batch=int(params.get("gen_per_batch", 200)),
            gen_total=int(params.get("gen_total", 2000)),
            collage_n_per_image=int(params.get("collage_n_per_image", 400)),
            collage_n=int(params.get("collage_n", 2000)),
            save_training=bool(params.get("save_trining", False)),  # [sic]
        )

    # Artifact paths — same directory scheme as the reference
    # (modules/ddpm_tasks.py:40,116; typos preserved deliberately).
    def model_dir(self, root: str = ".") -> str:
        return f"{root}/models/{self.run_name}"

    def checkpoint_path(self, root: str = ".") -> str:
        return f"{self.model_dir(root)}/ckpt_{self.dataset}_{self.variant}"

    def runs_dir(self, root: str = ".") -> str:
        return f"{root}/runs/{self.run_name}"

    def results_dir(self, root: str = ".") -> str:
        return f"{root}/results/{self.run_name}"

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2, default=str)

    def settings_text(self) -> str:
        """Human-readable settings dump, one `key: value` per line.

        Parity with the ``settings_{ds}_{v}.txt`` snapshot written by
        ``ddpm_run`` (``modules/ddpm_tasks.py:74-121``), extended with the
        effective AFDM_* implementation choices (``impl.*`` lines) so two
        runs differing only in env knobs produce distinguishable artifacts
        (the knobs latch at trace time — see ``impl_flags``).
        """
        d = dataclasses.asdict(self)
        f = d.pop("filters", None)
        lines = [f"{k}: {v}" for k, v in d.items()]
        if f is not None:
            lines += [f"{k}: {v}" for k, v in f.items()]
        else:
            lines += [f"{k}: None" for k in
                      ("kernel_size", "kaiser_beta", "omega_c_down", "omega_c_up")]
        from aliasfree_diffusion_models_pytorch_tpu.impl_flags import impl_report_text

        lines.append(impl_report_text())
        return "\n".join(lines)
