"""Fused (flash-style) multi-head self-attention Pallas kernel.

Why this exists: the UNet's ``SelfAttention`` blocks dominate the train step
(profiled in ``benchmarks/breakdown.py``: 35 of 57 ms at batch 256, and the
32x32-resolution block alone is 31 ms). The XLA path materializes the
(B, H, S, S) logits/weights tensors in HBM — 2 GB per pass at
(256, 4, 1024, 1024) bf16 — and re-reads them for softmax, the PV matmul and
the backward. At these shapes the whole computation per (batch, head) is
tiny: K and V are (S≤1024, D≤32), so the entire attention for one (batch,
head, q-block) fits in VMEM. The kernel computes logits → softmax → PV
without ever writing the S x S matrices to HBM; the backward recomputes them
(flash-attention style) and emits dQ/dK/dV the same way.

No online-softmax streaming is needed (unlike long-context flash attention):
S is small enough that a full logits *block* lives in VMEM, which keeps the
kernel simple and the softmax numerically exact (f32 accumulation, stable
max-subtraction — tighter than the XLA bf16 path).

Semantics match the module's manual attention (torch ``nn.MultiheadAttention``
convention, ``modules/ddpm_utils.py:54-74``): softmax(q·kᵀ/√D)·v per head.

Layout: (B, H, S, D) — ``S`` on sublanes, ``D`` on lanes (padded to the
128-lane tile; D is 8-32 here, so padding is the price of the tiny model,
paid in VMEM only). Mosaic requires the last two block dims to be the tiled
ones, hence heads ahead of sequence.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_mha", "attention_reference"]


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


def _pick_q_block(s: int) -> int:
    # Full-S blocks up to 512 keep VMEM under ~6 MB incl. the f32 logits
    # block; longer sequences split the q axis.
    return s if s <= 512 else 512


def _fwd_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # (Qblk, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (S, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # (Qblk, S) — VMEM only
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _bwd_kernel(scale: float, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    """Full recompute backward for one (batch, head).

    dK/dV need contributions from every q row, so the backward grid is
    (B, H) with the whole S axis resident — still comfortably in VMEM at
    S ≤ 1024 (the f32 S x S block is 4 MB).
    """
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)       # (S, S)

    # dV = Pᵀ g
    dv = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = g Vᵀ ; dS = P ⊙ (dP − rowsum(dP ⊙ P))
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, interpret):
    b, h, s, d = q.shape
    qblk = _pick_q_block(s)
    grid = (b, h, s // qblk)
    qspec = pl.BlockSpec(
        (1, 1, qblk, d), lambda i, j, r: (i, j, r, 0), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (1, 1, s, d), lambda i, j, r: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, float(scale)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        interpret=interpret,
    )(q, k, v)


def _flash_bwd(q, k, v, g, scale, interpret):
    b, h, s, d = q.shape
    grid = (b, h)
    spec = pl.BlockSpec(
        (1, 1, s, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, float(scale)),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(q, k, v, g)


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
