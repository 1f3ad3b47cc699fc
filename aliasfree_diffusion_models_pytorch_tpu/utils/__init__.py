"""Cross-cutting utilities: layout, seeding, IO, torch checkpoint import."""

from aliasfree_diffusion_models_pytorch_tpu.utils.layout import (  # noqa: F401
    nchw_to_nhwc,
    nhwc_to_nchw,
)
