"""Strip-backward vs XLA handoff at the large-image attention shapes.

The flash gate (`models/blocks.py:SelfAttention._use_flash`) hands
sequences ABOVE S=4096 to XLA; S in [1025, 4096] uses the q-strip-blocked
Pallas backward. Round 3 recorded the 64px capability but never measured
the handoff at the new sizes — this probe times fwd and fwd+bwd for the
flash path vs the XLA einsum path at the image-size-64 shape (S=4096) and
the batch that regime actually trains at, plus one above-gate shape
(S=8192, image-size ~90/128 territory) where the strip kernel's per-block
VMEM budget is expected to fail — justifying the gate by measurement.

Fetch-forced timing per RESULTS.md measurement discipline.

Usage: python benchmarks/attn_handoff.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=None, help="write rows as JSON to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import setup_persistent_cache

    setup_persistent_cache()

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
        return round((time.perf_counter() - t0) / iters * 1000, 3)

    # (name, batch, heads, S, D): the 64px UNet's big block at its measured
    # training batch, the S=2048 midpoint, and one above-gate probe.
    shapes = [
        ("64px sa6 b32 S=4096 D=8", 32, 4, 4096, 8),
        ("S=2048 midpoint b64 D=8", 64, 4, 2048, 8),
        ("above-gate b8 S=8192 D=8", 8, 4, 8192, 8),
        # image-size-128 territory; the q-strip backward's (128, S) f32
        # strip is 8 MB here — the last size before the strip formula's
        # floor (128 rows) overruns the scoped-VMEM budget at S=32768.
        ("image-128 b2 S=16384 D=8", 2, 4, 16384, 8),
    ]
    rows = []
    for name, b, h, s, d in shapes:
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
            for _ in range(3)
        )

        def flash_loss(q, k, v):
            return jnp.sum(fa.flash_mha(q, k, v, None, False).astype(jnp.float32) ** 2)

        def xla_loss(q, k, v):
            return jnp.sum(
                fa.attention_reference(q, k, v, precision=None).astype(jnp.float32) ** 2
            )

        row = {"shape": name, "batch": b, "seq": s}
        try:
            fwd = jax.jit(lambda q, k, v: fa.flash_mha(q, k, v, None, False))
            bwd = jax.jit(jax.grad(flash_loss, argnums=(0, 1, 2)))
            row["flash_fwd_ms"] = timeit(fwd, q, k, v)
            row["flash_bwd_ms"] = timeit(bwd, q, k, v)
        except Exception as e:  # expected above the gate: Mosaic VMEM OOM
            row["flash_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        try:
            xf = jax.jit(lambda q, k, v: fa.attention_reference(q, k, v, precision=None))
            xb = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))
            row["xla_fwd_ms"] = timeit(xf, q, k, v)
            row["xla_bwd_ms"] = timeit(xb, q, k, v)
        except Exception as e:
            row["xla_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"backend": jax.default_backend(), "iters": args.iters, "rows": rows},
                f,
                indent=2,
            )
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
