"""torch-parity parameter initializers.

The reference trains with torch's default inits; matching them keeps training
dynamics comparable across frameworks:

* ``Conv2d``/``Linear`` weights: ``kaiming_uniform_(a=sqrt(5))`` — uniform with
  variance ``1/(3*fan_in)`` → ``variance_scaling(1/3, fan_in, uniform)``.
* ``Conv2d``/``Linear`` bias: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.
* ``MultiheadAttention`` packed qkv: ``xavier_uniform_``, zero bias; out-proj
  bias zero (torch ``nn.MultiheadAttention._reset_parameters``).
* ``Embedding``: ``N(0, 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import random

torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
xavier_uniform = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros
normal_unit = nn.initializers.normal(stddev=1.0)


def torch_bias_init(fan_in: int):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
