"""Device mesh + sharding utilities.

The reference is strictly single-GPU (SURVEY.md §2 preamble: no DDP, no
NCCL). The TPU-native scaling story is SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis — batch (data-parallel) sharding; gradient all-reduce becomes
  an XLA ``psum`` riding ICI, inserted automatically by ``jit`` from the
  sharding annotations (the moral equivalent of NCCL DDP, for free).
* ``fsdp`` axis (optional) — parameter sharding along each weight's largest
  axis (ZeRO-3 style); XLA inserts all-gathers before use and
  reduce-scatters on the gradient. At this model's size (1.5M params) it is
  off by default, but the machinery is first-class and tested on a virtual
  8-device CPU mesh.

Per-host data loading stays numpy; arrays are placed with
``jax.device_put(batch, NamedSharding(mesh, P("data", ...)))``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_sharding", "P"]


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axes: tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts every device on the first axis. A trailing axis of
    size 1 is fine (e.g. ``(8, 1)`` over ``("data", "fsdp")``).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != devices.size:
        raise ValueError(f"mesh shape {shape} != #devices {devices.size}")
    return Mesh(devices.reshape(shape), axes)


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``; rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, axis: str = "fsdp", min_size: int = 2**14):
    """FSDP-style sharding tree: each large leaf sharded along its largest
    dimension that divides the axis size; small leaves replicated.

    Returns a pytree of NamedSharding matching ``params``.
    """
    axis_size = mesh.shape[axis]

    def spec_for(leaf) -> NamedSharding:
        if axis_size == 1 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        order = sorted(range(len(dims)), key=lambda d: -dims[d])
        for d in order:
            if dims[d] % axis_size == 0:
                spec = [None] * len(dims)
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
