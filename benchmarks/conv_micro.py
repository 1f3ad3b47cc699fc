"""How far from the MXU roofline are the UNet's 3x3 convolutions?

After round 3 the attention kernels and filtered-GELU fusions are at their
structural floors (D=8 lane use, VPU peak respectively); the convolutions
are the largest share nobody has attacked (v0's no-attention step is
18.7 ms — see benchmarks/breakdown.py). Before writing any Pallas conv
kernel, measure (a) what XLA's native conv achieves per shape vs the FLOP
floor, and (b) whether a 9-shifted-matmul reformulation — nine
(NHW, C)x(C, C') MXU dots over statically shifted views — beats it at these
channel counts.

Measurement note: a first draft timed 20 independent dispatches per shape
and measured ~1.4-1.7 ms for EVERYTHING — the axon tunnel's per-dispatch
latency, not device time (fwd+bwd occasionally read faster than fwd). This
version chains R=24 conv PAIRS (ci→co→ci, data-dependent) inside ONE jit so
device work dominates the single dispatch, and times 5 fetch-forced outer
iterations. MFU is per-pair FLOPs x R / wall vs the v5e bf16 peak.

Usage: python benchmarks/conv_micro.py [--iters 5] [--chain 24]
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"backend={jax.default_backend()} chain={args.chain}", flush=True)
    peak = 197e12  # v5e dense bf16 peak FLOP/s
    R = args.chain

    N = 256
    # (label, H=W, C_in, C_out) — distinct 3x3 stride-1 same convs of v0/v3.
    shapes = [
        ("stem 3->64 @32", 32, 3, 64),
        ("dc 64->64 @32", 32, 64, 64),
        ("down1 64->128 @16", 16, 64, 128),
        ("dc 128->128 @16", 16, 128, 128),
        ("down2 128->256 @8", 8, 128, 256),
        ("dc 256->256 @8", 8, 256, 256),
        ("bot 256->256 @4", 4, 256, 256),
    ]

    def conv(x, w):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    def conv9(x, w):
        # 9 shifted MXU dots: y[p] = sum_{dy,dx} x[p+(dy,dx)] @ w[dy,dx].
        n, h, wd, ci = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((n, h, wd, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, wd, ci))
                out = out + jnp.einsum(
                    "nhwc,cd->nhwd", xs, w[dy, dx],
                    preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    def chained(conv_fn, x, w_ab, w_ba):
        # R data-dependent ci→co→ci pairs in one dispatch; the 0.96 rescale
        # keeps magnitudes bounded without adding measurable work.
        def body(a, _):
            return conv_fn(conv_fn(a, w_ab), w_ba) * 0.96, None
        out, _ = lax.scan(body, x, None, length=R)
        return out

    def timeit(fn, *arrs):
        out = fn(*arrs)
        jax.block_until_ready(out)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*arrs)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.perf_counter() - t0) / args.iters * 1000

    rng = np.random.default_rng(0)
    print(f"{'shape':20s} {'conv f':>8s} {'MFU':>6s} {'f+b':>8s} {'MFU':>6s}"
          f" {'9mm f':>8s} {'MFU':>6s} {'f+b':>8s} {'MFU':>6s}", flush=True)
    for label, hw, ci, co in shapes:
        x = jnp.asarray(rng.standard_normal((N, hw, hw, ci)), jnp.bfloat16)
        w_ab = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.08,
                           jnp.bfloat16)
        w_ba = jnp.asarray(rng.standard_normal((3, 3, co, ci)) * 0.08,
                           jnp.bfloat16)
        flops_pair = 2 * 9 * N * hw * hw * ci * co * 2  # ab + ba
        cols = []
        for impl in (conv, conv9):
            fwd = jax.jit(lambda xx, wa, wb, i=impl: chained(i, xx, wa, wb))
            fb = jax.jit(jax.value_and_grad(
                lambda xx, wa, wb, i=impl: jnp.sum(
                    chained(i, xx, wa, wb).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            t_f = timeit(fwd, x, w_ab, w_ba)
            t_fb = timeit(fb, x, w_ab, w_ba)
            cols += [t_f, R * flops_pair / t_f / 1e-3 / peak,
                     t_fb, 3 * R * flops_pair / t_fb / 1e-3 / peak]
        print(f"{label:20s} {cols[0]:8.2f} {cols[1]:6.1%} {cols[2]:8.2f}"
              f" {cols[3]:6.1%} {cols[4]:8.2f} {cols[5]:6.1%}"
              f" {cols[6]:8.2f} {cols[7]:6.1%}", flush=True)


if __name__ == "__main__":
    main()
