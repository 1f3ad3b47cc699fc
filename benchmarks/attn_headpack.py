"""Measured accept/reject of head-packed QK^T for the D=8 attention block.

RESULTS.md attributes ~11 ms of the 32 ms Config-D step to the sa6 block
(batch 256, H=4, S=1024, D=8) and calls the cost "lane-structural": with
contraction depth D=8, every MXU pass uses 8 of 128 lanes. VERDICT r4
weak #3 asks for one measured attempt at *head-packing* — processing the 4
heads' D=8 slices as one lane-dense operand — before that claim stands.

The pass-count model (ops/flash_attention.py docstring) predicts packing
LOSES: an MXU matmul costs ≈ rows x ceil(contraction/128) x output-lane-
tiles row-passes, so for a fixed (S, S)-shaped output the cost is set by
the OUTPUT geometry, not the contraction depth. Two consequences, both
directly measurable:

* Block-diagonal packing K~=(4S, 32), Q~^T=(32, 4S) produces one (4S, 4S)
  output = 16 lane-tile-rows of work where 4 separate heads need 4x
  (S, S) = 4 — predicted 4x SLOWER despite full 32-lane density.
* A D=128 (lane-dense) QK^T should cost the SAME as D=8 for the same
  (S, S) output — the "wasted" 120 lanes are free, not recoverable.

This probe times exactly those structures as Pallas kernels that consume
the logits in VMEM (row-sum output), so HBM writes of S x S never pollute
the measurement, plus the end-to-end flash_mha at the sa6 shape for
context. If packed-vs-per-head comes out ~4x and D=128 ~= D=8, the
head-packing lever is refuted by measurement and the lane-structural
post-mortem is complete; if packed wins, it graduates into the kernel.

Usage: python benchmarks/attn_headpack.py [--iters 20] [--out path.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import setup_persistent_cache

    setup_persistent_cache()

    from aliasfree_diffusion_models_pytorch_tpu.ops import flash_attention as fa

    interpret = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()} interpret={interpret}", flush=True)
    rng = np.random.default_rng(0)

    # sa6 shape: batch 256, H=4, S=1024, D=8 (models/unet.py variant 3,
    # reference modules/ddpm_utils.py:54-74 at 32x32 feature maps).
    B, H, S, D = 256, 4, 1024, 8
    BH = B * H

    def timeit(fn, *a, iters=args.iters):
        out = fn(*a)
        jax.block_until_ready(out)
        # forced scalar fetch: under the axon tunnel block_until_ready can
        # report dispatch, not run time (RESULTS.md measurement discipline)
        float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32))
        return round((time.perf_counter() - t0) / iters * 1000, 3)

    # --- micro-probes: QK^T structures, logits consumed in VMEM ----------
    def qk_rowsum_kernel(k_ref, qt_ref, o_ref):
        """logits^T = K.Q^T for one group; emit row-sums only (the S x S
        block never leaves VMEM, isolating pass cost from HBM traffic)."""
        logits_t = jax.lax.dot_general(
            k_ref[...], qt_ref[...],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[...] = jnp.sum(logits_t, axis=1, keepdims=True)

    def make_qk_probe(s: int, d: int, n: int, qblk: int):
        """n (s, d) heads, one per program along grid axis 0; the q axis is
        split into qblk columns (axis 1) so the f32 (s, qblk) logits block
        stays within VMEM at the packed 4S x 4S size. K (n, s, d) x Q^T
        (n, d, s) -> row-sums (n, 1, s)."""
        kspec = pl.BlockSpec((1, s, d), lambda i, r: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        qtspec = pl.BlockSpec((1, d, qblk), lambda i, r: (i, 0, r),
                              memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, 1, qblk), lambda i, r: (i, 0, r),
                             memory_space=pltpu.VMEM)
        return jax.jit(functools.partial(
            pl.pallas_call,
            qk_rowsum_kernel,
            out_shape=jax.ShapeDtypeStruct((n, 1, s), jnp.float32),
            grid=(n, s // qblk),
            in_specs=[kspec, qtspec],
            out_specs=ospec,
            interpret=interpret,
        )())

    rows = {"shape": {"B": B, "H": H, "S": S, "D": D},
            "iters": args.iters, "backend": jax.default_backend()}

    # (a) per-head baseline: BH separate (S, D=8) heads, one per program,
    # q axis split 512 wide (same qblk for (a)/(c); (b) uses 256 to keep its
    # (4S, qblk) f32 block at 4 MB — pass count, the measured quantity, is
    # qblk-invariant).
    k8 = jnp.asarray(rng.standard_normal((BH, S, D)), jnp.bfloat16)
    qt8 = jnp.asarray(rng.standard_normal((BH, D, S)), jnp.bfloat16)
    probe8 = make_qk_probe(S, D, BH, qblk=512)
    rows["perhead_d8_ms"] = timeit(probe8, k8, qt8)
    print(f"per-head D=8   (BH={BH} x {S}x{S}): {rows['perhead_d8_ms']} ms",
          flush=True)

    # (b) block-diagonal head-packing: the B batch entries each pack their
    # H=4 heads into one (H*S, H*D) operand pair -> one (4S, 4S) output.
    # Lane-dense contraction (32), 16x the output tiles. Same total "useful"
    # logits; the off-diagonal (i != j) blocks are cross-head garbage that
    # a packed attention kernel would additionally have to mask.
    kp = np.zeros((B, H * S, H * D), np.float32)
    qtp = np.zeros((B, H * D, H * S), np.float32)
    k8n = np.asarray(k8, np.float32).reshape(B, H, S, D)
    qt8n = np.asarray(qt8, np.float32).reshape(B, H, D, S)
    for h in range(H):
        kp[:, h * S:(h + 1) * S, h * D:(h + 1) * D] = k8n[:, h]
        qtp[:, h * D:(h + 1) * D, h * S:(h + 1) * S] = qt8n[:, h]
    kp = jnp.asarray(kp, jnp.bfloat16)
    qtp = jnp.asarray(qtp, jnp.bfloat16)
    probe_packed = make_qk_probe(H * S, H * D, B, qblk=256)
    rows["blockdiag_hd32_ms"] = timeit(probe_packed, kp, qtp)
    print(f"block-diag HD=32 (B={B} x {H*S}x{H*S}): "
          f"{rows['blockdiag_hd32_ms']} ms", flush=True)

    # (c) contraction-depth control: D=128 lane-dense, same (S, S) output
    # count as (a). If this ~= (a), contraction density is free/unrecoverable
    # for a fixed output shape — the pass-count model confirmed.
    k128 = jnp.asarray(rng.standard_normal((BH, S, 128)), jnp.bfloat16)
    qt128 = jnp.asarray(rng.standard_normal((BH, 128, S)), jnp.bfloat16)
    probe128 = make_qk_probe(S, 128, BH, qblk=512)
    rows["perhead_d128_ms"] = timeit(probe128, k128, qt128)
    print(f"per-head D=128 (BH={BH} x {S}x{S}): {rows['perhead_d128_ms']} ms",
          flush=True)

    # --- context: the real kernel at the sa6 shape -----------------------
    q4 = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k4 = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    v4 = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(
            fa.flash_mha(q, k, v, None, interpret).astype(jnp.float32) ** 2)

    fwd = jax.jit(lambda q, k, v: fa.flash_mha(q, k, v, None, interpret))
    fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    rows["flash_fwd_ms"] = timeit(fwd, q4, k4, v4)
    rows["flash_fwdbwd_ms"] = timeit(fwdbwd, q4, k4, v4)
    print(f"flash fwd {rows['flash_fwd_ms']} ms, "
          f"fwd+bwd {rows['flash_fwdbwd_ms']} ms", flush=True)

    ratio = rows["blockdiag_hd32_ms"] / rows["perhead_d8_ms"]
    depth = rows["perhead_d128_ms"] / rows["perhead_d8_ms"]
    rows["packed_over_perhead"] = round(ratio, 2)
    rows["d128_over_d8"] = round(depth, 2)
    rows["verdict"] = (
        "REJECT head-packing" if ratio > 1.1 else "ACCEPT head-packing")
    print(json.dumps(rows), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
