"""Signal-processing ops: filter design, alias-free resampling, rotation."""

from aliasfree_diffusion_models_pytorch_tpu.ops.filters import (  # noqa: F401
    circular_lowpass_kernel,
    jinc_filter_2d,
    kernel_frequency_response,
)
from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (  # noqa: F401
    depthwise_fir,
    downsample2x,
    filtered_gelu,
    maxpool2x,
    upsample2x,
    upsample_bilinear_align_corners,
)
