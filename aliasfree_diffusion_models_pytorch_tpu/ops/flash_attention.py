"""Fused (flash-style) multi-head self-attention Pallas kernel.

Why this exists: the UNet's ``SelfAttention`` blocks dominate the train step
(profiled in ``benchmarks/breakdown.py``; the 32x32-resolution block alone is
~27 ms of the 57 ms step at batch 256). The XLA path materializes the
(B, H, S, S) logits/weights tensors in HBM — 2 GB per pass at
(256, 4, 1024, 1024) bf16 — and re-reads them for softmax, the PV matmul and
the backward. At these shapes the whole computation per (batch, head) is
tiny: K and V are (S≤1024, D≤32), so attention for a group of (batch, head)
pairs fits in VMEM. The kernel computes logits → f32 softmax → PV without
ever writing the S x S matrices to HBM; the backward recomputes them
(flash-attention style) and emits dQ/dK/dV the same way.

No online-softmax streaming is needed (unlike long-context flash attention):
S is small enough that a full logits block lives in VMEM, which keeps the
kernel simple and the softmax numerically exact (f32 accumulation, stable
max-subtraction — tighter than the XLA bf16 path).

Two structural choices, both measured on v5e:

* **Matmuls run in the input dtype** (bf16 on the perf path — one MXU pass;
  f32 operands cost three) with ``preferred_element_type=f32`` accumulation.
* **(batch, head) pairs are grouped per program** (``_pick_group``): at
  S=256 a single pair is too little work per program/DMA, so the kernel
  processes G pairs with batched ``dot_general``; at S=1024 G=1 and the
  q axis is block-split instead.

Semantics match the module's manual attention (torch ``nn.MultiheadAttention``
convention, ``modules/ddpm_utils.py:54-74``): softmax(q·kᵀ/√D)·v per head.

Layout: inputs are (B, H, S, D); internally flattened to (B·H, S, D) so the
last two block dims are the (sublane, lane)-tiled ones. D (8-32 here) is
lane-padded to 128 in VMEM — the price of the tiny model, paid on-chip only.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_mha", "attention_reference"]

_DOT_QK = (((2,), (2,)), ((0,), (0,)))   # contract D;        batch G
_DOT_PV = (((2,), (1,)), ((0,), (0,)))   # contract S (k ax); batch G
_DOT_T = (((1,), (1,)), ((0,), (0,)))    # contract q axis;   batch G


def attention_reference(q, k, v, scale=None, precision=None):
    """Plain-XLA scaled-dot-product attention, (B, H, S, D) layout.

    The numerics oracle for the kernel and the fallback for backends
    without Pallas support.
    """
    d = q.shape[-1]
    scale = float(scale) if scale is not None else float(1.0 / np.sqrt(d))
    logits = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k, precision=precision)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nhqk,nhkd->nhqd", weights, v, precision=precision)


def _pick_group(s: int, bh: int) -> int:
    """(batch·head) pairs per program: keep the f32 S x S scratch ~<= 4 MB."""
    for g in (16, 8, 4, 2, 1):
        if g <= bh and bh % g == 0 and g * s * s * 4 <= 4 * 2**20:
            return g
    return 1


def _pick_q_block(s: int) -> int:
    # Full-S q blocks up to 512; longer sequences split the q axis.
    return s if s <= 512 else 512


def _fwd_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]                       # (G, Qblk, D)
    k = k_ref[...]                       # (G, S, D)
    v = v_ref[...]                       # (G, S, D)
    logits = jax.lax.dot_general(
        q, k, _DOT_QK, preferred_element_type=jnp.float32
    ) * scale                            # (G, Qblk, S) f32 — VMEM only
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, _DOT_PV, preferred_element_type=jnp.float32
    )
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(scale: float, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    """Full recompute backward for a group of (batch, head) pairs.

    dK/dV need contributions from every q row, so the backward keeps the
    whole S axis resident — comfortable in VMEM at S <= 1024 (the f32 S x S
    block is 4 MB)."""
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    dt = q.dtype

    logits = jax.lax.dot_general(
        q, k, _DOT_QK, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)       # (G, S, S) f32
    p_c = p.astype(dt)

    # dV = Pᵀ g (contract the q axis)
    dv = jax.lax.dot_general(
        p_c, g, _DOT_T, preferred_element_type=jnp.float32
    )
    # dP = g Vᵀ ; dS = P ⊙ (dP − rowsum(dP ⊙ P))
    dp = jax.lax.dot_general(
        g, v, _DOT_QK, preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_c = ds.astype(dt)
    dq = jax.lax.dot_general(
        ds_c, k, _DOT_PV, preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds_c, q, _DOT_T, preferred_element_type=jnp.float32
    ) * scale

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, interpret):
    b, h, s, d = q.shape
    bh = b * h
    q3, k3, v3 = (a.reshape(bh, s, d) for a in (q, k, v))
    g = _pick_group(s, bh)
    qblk = _pick_q_block(s) if g == 1 else s
    grid = (bh // g, s // qblk)
    qspec = pl.BlockSpec(
        (g, qblk, d), lambda i, r: (i, r, 0), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (g, s, d), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, float(scale)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(b, h, s, d)


def _flash_bwd(q, k, v, g_out, scale, interpret):
    b, h, s, d = q.shape
    bh = b * h
    args = [a.reshape(bh, s, d) for a in (q, k, v, g_out)]
    # The backward holds ~4 f32 (G, S, S) temporaries — halve the group.
    g = max(1, _pick_group(s, bh) // 2)
    while bh % g:
        g -= 1
    grid = (bh // g,)
    spec = pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, s, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, float(scale)),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(*args)
    shape4 = (b, h, s, d)
    return dq.reshape(shape4), dk.reshape(shape4), dv.reshape(shape4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale=None, interpret=False):
    """softmax(q·kᵀ·scale)·v per head, never materializing S x S in HBM.

    Args: q/k/v ``(B, H, S, D)``; ``scale`` defaults to 1/√D; ``interpret``
    runs the Pallas interpreter (CPU testing). Differentiable via a
    recomputing flash backward. f32 softmax accumulation regardless of input
    dtype.
    """
    scale = float(scale) if scale is not None else float(1.0 / np.sqrt(q.shape[-1]))
    return _flash_fwd(q, k, v, scale, interpret)


def _mha_fwd_rule(q, k, v, scale, interpret):
    scale = float(scale) if scale is not None else float(1.0 / np.sqrt(q.shape[-1]))
    return _flash_fwd(q, k, v, scale, interpret), (q, k, v)


def _mha_bwd_rule(scale, interpret, residuals, g):
    q, k, v = residuals
    scale = float(scale) if scale is not None else float(1.0 / np.sqrt(q.shape[-1]))
    dq, dk, dv = _flash_bwd(q, k, v, g, scale, interpret)
    return dq, dk, dv


flash_mha.defvjp(_mha_fwd_rule, _mha_bwd_rule)
