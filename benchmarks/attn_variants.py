"""Flash-attention kernel variants, measured on the real chip (idle host!).

Times isolated fwd and fwd+bwd of ``flash_mha`` vs the XLA einsum path at
every SelfAttention shape in the v3/32px graph (batch 256, bf16), under:

* dq orientation: ``AFDM_FLASH_DQT`` (S-row dS·K matmul vs in-VMEM dSᵀ
  transpose + D-row Kᵀ·dSᵀ) — round-3 experiment.
* both paths at S=256 to (re)settle the ``AFDM_FLASH_MIN_SEQ`` threshold
  with the round-2 orientation rework in place.

Fetch-forced timing per RESULTS.md measurement discipline.

Usage: python benchmarks/attn_variants.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aliasfree_diffusion_models_pytorch_tpu.ops import flash_attention as fa

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def timeit(fn, *a, iters=args.iters):
        out = None
        for _ in range(3):
            out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1000

    # (name, heads, S, D) for each SelfAttention in the 32px UNet
    shapes = [
        ("sa6 c=32 S=1024", 4, 1024, 8),
        ("sa1/5 c=64 S=256", 4, 256, 16),
        ("sa5 c=32 S=256", 4, 256, 8),
        ("sa2/4 c=128 S=64", 4, 64, 32),
    ]
    for name, h, s, d in shapes:
        q, k, v = (
            jnp.asarray(rng.standard_normal((args.batch, h, s, d)), jnp.bfloat16)
            for _ in range(3)
        )

        def flash_loss(q, k, v):
            return jnp.sum(fa.flash_mha(q, k, v, None, False).astype(jnp.float32) ** 2)

        def xla_loss(q, k, v):
            return jnp.sum(
                fa.attention_reference(q, k, v, precision=None).astype(jnp.float32) ** 2
            )

        row = f"{name:18s}"
        for label, dqt in (("dqt", "1"), ("ds·k", "0")):
            os.environ["AFDM_FLASH_DQT"] = dqt
            fwd = jax.jit(lambda q, k, v: fa.flash_mha(q, k, v, None, False))
            bwd = jax.jit(jax.grad(flash_loss, argnums=(0, 1, 2)))
            tf = timeit(fwd, q, k, v)
            tb = timeit(bwd, q, k, v)
            row += f" | flash[{label}] {tf:6.3f}/{tb:6.3f}"
        xf = jax.jit(lambda q, k, v: fa.attention_reference(q, k, v, precision=None))
        xb = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))
        row += f" | xla {timeit(xf, q, k, v):6.3f}/{timeit(xb, q, k, v):6.3f}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
