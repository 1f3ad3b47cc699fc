"""Alias-Free Diffusion Models — TPU-native (JAX/XLA/Pallas) framework.

A from-scratch TPU-first rebuild with the capabilities of
``MDFahimAnjum/AliasFree-Diffusion-Models-PyTorch`` (arXiv 2411.09174):

* DDPM training + Algorithm-1 ancestral sampling (reference:
  ``modules/ddpm_models.py:301-436``), compiled as jitted ``lax.scan``.
* Versioned UNet family, ``variant=0..4`` — Configs A–D plus the unpublished
  variant 4 (reference: ``modules/ddpm_models.py:41-258``).
* Alias-free resampling ops from windowed-jinc/Kaiser low-pass filter design
  (reference: ``modules/filtrs.py``) baked into the graph as trace-time
  constants, with a fused Pallas flash-attention kernel on the hot path.
* Rotation-equivariant sampling ("Config E", reference:
  ``modules/ddpm_models.py:352-386``) executed on-device as a precomputed
  MXU matmul instead of the reference's per-step CPU scipy round-trip.
* Data pipelines (MNIST-CSV / image-folder), typed configs, a real CLI,
  Orbax checkpointing, IS/FID/KID evaluation, and data-parallel training
  sharded over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from aliasfree_diffusion_models_pytorch_tpu.config import (  # noqa: F401
    FilterSettings,
    TrainConfig,
)

_LAZY = {
    "Diffusion": "aliasfree_diffusion_models_pytorch_tpu.diffusion",
    "UNet": "aliasfree_diffusion_models_pytorch_tpu.models.unet",
}


def __getattr__(name):
    """Lazy top-level exports — keeps `import <pkg>.ops` cheap (no flax/jax
    model imports) for kernel-only users."""
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
