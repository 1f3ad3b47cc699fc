"""Worker process for the 2-process multi-host simulation test.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>

Each process gets 2 virtual CPU devices; the mesh spans all processes. Runs
ONE real train step on a deterministic synthetic batch placed with the
per-host loading path, and prints the resulting loss + a checksum of the
global batch it observed (allgathered) so the parent can compare with a
single-process run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from aliasfree_diffusion_models_pytorch_tpu.parallel.multihost import (
        init_distributed,
        put_global_batch,
    )

    init_distributed(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import TrainConfig
    from aliasfree_diffusion_models_pytorch_tpu.data import Dataloader, synthetic_dataset
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import make_mesh
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_train_step,
    )

    config = TrainConfig(
        run_name="mh", epochs=1, batch_size=8, image_size=8, image_channels=1,
        dataset="synthetic", dataset_path=None, lr=3e-4, noise_steps=50,
        # Variant 0 (smallest graph): what this test proves — per-host
        # sharded loading + mesh collectives == single-host numerics —
        # is variant-independent, and the v3 compile (~2 min/worker on
        # this 1-core host) widened the coordination-barrier timeout
        # window enough to flake under full-suite memory pressure.
        variant=0, filters=None, seed=0,
    )
    mesh = make_mesh()  # all devices across both processes

    # Every host loads the same dataset and computes the same order.
    ds = synthetic_dataset(n=8, image_size=8, channels=1, seed=0)
    loader = Dataloader(ds, batch_size=8, seed=0)
    images, _ = next(iter(loader))

    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=50, img_size=8)
    step = make_train_step(model, config, diffusion, mesh)

    batch = put_global_batch(mesh, images)
    state, loss = step(state, batch, random.key(1))
    print(f"RESULT pid={pid} loss={float(loss):.10f}", flush=True)


if __name__ == "__main__":
    main()
