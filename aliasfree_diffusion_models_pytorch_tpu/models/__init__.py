"""Model family: UNet variants 0-4 (Configs A-D + unpublished v4), blocks, EMA."""

from aliasfree_diffusion_models_pytorch_tpu.models.blocks import (  # noqa: F401
    DoubleConv,
    DoubleConv_F,
    DoubleConv_F4,
    Down,
    Down_F,
    Down_F4,
    Down_FF,
    Down_FFF,
    FilteredGELU,
    SelfAttention,
    Up,
    Up_F,
    Up_F4,
    Up_FF,
    Up_FFF,
)
from aliasfree_diffusion_models_pytorch_tpu.models.unet import (  # noqa: F401
    UNet,
    VARIANT_NAMES,
    VARIANT_SPEC,
    param_count,
    sinusoidal_time_embedding,
)
