"""SPMD parallelism: mesh construction and sharding layouts."""

from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import (  # noqa: F401
    P,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
)
