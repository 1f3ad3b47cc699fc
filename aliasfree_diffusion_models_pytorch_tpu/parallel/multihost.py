"""Multi-host (multi-process) SPMD support.

The reference is single-process/single-GPU (SURVEY.md §2 preamble); this is
the rebuild's own scaling mandate (docs/SCALING.md "Multi-host"). Design:

* every process calls :func:`init_distributed` once at startup
  (``jax.distributed.initialize`` — TCP coordination; collectives ride ICI
  within a slice, DCN across slices, Gloo on CPU test rigs);
* the mesh simply spans all processes' devices — the same ``NamedSharding``
  layouts as single-host, nothing else changes;
* data: each process materializes only its slice of every global batch and
  contributes it via ``jax.make_array_from_process_local_data``
  (:func:`put_global_batch`). Because the shuffle order is a pure function
  of (seed, epoch) (``data.Dataloader``), all hosts agree on the global
  order without communicating — per-host loading reproduces exactly the
  single-host global batch, which ``tests/test_multihost.py`` proves with a
  2-process CPU simulation.
"""

from __future__ import annotations

import numpy as np
import jax

from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import batch_sharding

__all__ = ["init_distributed", "put_global_batch", "local_slice"]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, relies on the cluster environment (TPU pods
    auto-discover); explicit args support manual rigs and CPU simulations.
    Safe to call when already initialized or single-process.
    """
    # Do NOT query jax.process_count()/jax.devices() here — that would
    # initialize the local backend and make distributed init a no-op.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # Already initialized (or single-process local run) — fine.
        pass


def local_slice(global_batch: np.ndarray) -> np.ndarray:
    """This process's contiguous row-slice of a host-global batch.

    Contiguous slicing matches the mesh's device order (processes enumerate
    devices in order), so slice *i* lands on process *i*'s shards.
    """
    pc, pi = jax.process_count(), jax.process_index()
    n = global_batch.shape[0]
    if n % pc != 0:
        raise ValueError(f"global batch {n} not divisible by {pc} processes")
    per = n // pc
    return global_batch[pi * per : (pi + 1) * per]


def put_global_batch(mesh, batch: np.ndarray, axis: str = "data"):
    """Place a (logically global) numpy batch onto the mesh.

    Single-process: a plain ``device_put`` with batch sharding. Multi-process:
    this process contributes only its :func:`local_slice` through
    ``jax.make_array_from_process_local_data`` — the per-host loading path —
    and the result is the identical global array.
    """
    sharding = batch_sharding(mesh, ndim=np.ndim(batch), axis=axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_slice(batch))
