"""How expensive is exp on the v5e VPU, really?

The flash-attention kernels spend several full (S, S) f32 VPU passes per
(batch, head) pair on softmax (max-reduce, subtract, exp, sum-reduce). If
Mosaic lowers ``exp`` to a many-op polynomial, replacing it with a cheap
exp2-based approximation (the softmax weights are consumed in bf16, so ~1e-3
relative error is below the rounding already present) would shave real time
off the 9.8 ms/step attention share. If exp hits a hardware transcendental
pipe (~1-2 ops), this is a dead end — measure before touching the kernel.

Times, on a (64, 1024, 1024) f32 array (one grid step per (1024, 1024)
block, all VMEM-resident):

* copy        — x (baseline: pure DMA + one VPU move)
* mul2        — x * 2            (one arithmetic pass)
* poly4       — 4-FMA polynomial (known op count: 4 FMAs)
* exp         — jnp.exp(x)
* exp2        — jnp.exp2(x)
* fastexp2    — round/sub/2-FMA poly/ldexp-via-bitcast (candidate replacement)

Fetch-forced timing per RESULTS.md discipline. Run on an idle host.
Usage: python benchmarks/exp_micro.py [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend={jax.default_backend()}", flush=True)

    B, S = 64, 1024
    rng = np.random.default_rng(0)
    # softmax-like domain: logits - max <= 0
    x = jnp.asarray(-np.abs(rng.standard_normal((B, S, S))) * 5, jnp.float32)

    LOG2E = float(np.log2(np.e))

    def op_copy(v):
        return v

    def op_mul2(v):
        return v * 2.0

    def op_poly4(v):
        # 4 chained FMAs — a known-arithmetic-count yardstick
        acc = v
        for c in (0.5, 0.25, 0.125, 0.0625):
            acc = acc * v + c
        return acc

    def op_exp(v):
        return jnp.exp(v)

    def op_exp2(v):
        return jnp.exp2(v)

    def op_fastexp2(v):
        # exp(x) = 2^(x*log2e); n = round(y), f in [-0.5, 0.5]
        y = v * LOG2E
        n = jnp.round(y)
        f = y - n
        # 2^f, degree-3 Taylor on [-0.5, 0.5] — max rel err ~6e-4, an order
        # below the bf16 rounding the weights hit next
        p = 0.05550410866 * f + 0.2402265069
        p = p * f + 0.6931471806
        p = p * f + 1.0
        # 2^n via exponent-field add on the bitcast
        biased = (n.astype(jnp.int32) + 127) << 23
        scale = jax.lax.bitcast_convert_type(biased, jnp.float32)
        return p * scale

    # A single pass over the array is HBM-bound (the copy baseline measures
    # pure DMA) — chain CHAIN applications per element so arithmetic
    # dominates, and read per-op cost off the slope vs the copy baseline.
    CHAIN = 16

    def kern(op, x_ref, o_ref):
        acc = x_ref[...]
        for _ in range(CHAIN):
            acc = op(acc) - 1.0  # keep the domain <= 0 for the exp variants
        o_ref[...] = acc

    def build(op):
        blk = 256
        spec = pl.BlockSpec((1, blk, S), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
        return jax.jit(
            lambda a: pl.pallas_call(
                functools.partial(kern, op),
                out_shape=jax.ShapeDtypeStruct((B, S, S), jnp.float32),
                grid=(B, S // blk),
                in_specs=[spec],
                out_specs=spec,
            )(a)
        )

    def timeit(fn, a):
        out = fn(a)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(a)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / args.iters * 1000

    ops = [
        ("copy", op_copy),
        ("mul2", op_mul2),
        ("poly4", op_poly4),
        ("exp", op_exp),
        ("exp2", op_exp2),
        ("fastexp2", op_fastexp2),
        ("tanh", jnp.tanh),
        ("erf", jax.lax.erf),
        ("rsqrt1p", lambda v: jax.lax.rsqrt(1.0 + v * v)),
        ("logistic", jax.nn.sigmoid),
    ]
    # accuracy of the candidate (single application, outside pallas)
    xs = jnp.asarray(np.linspace(-80, 0, 100001), jnp.float32)
    ref = np.exp(np.asarray(xs, np.float64))
    got = np.asarray(jax.jit(op_fastexp2)(xs), np.float64)
    rel = np.max(np.abs(got - ref) / np.maximum(ref, 1e-300))
    print(f"fastexp2 max_rel_err vs exp on [-80, 0]: {rel:.2e}", flush=True)

    for name, op in ops:
        try:
            fn = build(op)
            ms = timeit(fn, x)
        except Exception as e:  # e.g. no Mosaic lowering for the primitive
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            continue
        print(f"{name:10s} {ms:7.3f} ms  (chain={CHAIN})", flush=True)


if __name__ == "__main__":
    main()
