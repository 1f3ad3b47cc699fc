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

Three structural choices, all measured on v5e:

* **Matmuls run in the input dtype** (bf16 on the perf path — one MXU pass;
  f32 operands cost three) with ``preferred_element_type=f32`` accumulation.
* **(batch, head) pairs are grouped per program** (``_pick_group``): at
  S=256 a single pair is too little work per program/DMA, so the kernel
  processes G pairs with batched ``dot_general``; at S=1024 G=1 and the
  q axis is block-split instead.
* **Small-head-dim matmul orientation**: at D=8..32 a matmul's MXU cost is
  ≈ (LHS rows streamed) × (output lane-tiles), so a matmul streaming S rows
  is ~S/D times costlier than one streaming D rows. The forward therefore
  computes logitsᵀ = K·Qᵀ and outᵀ = Vᵀ·Pᵀ (ONE S-row matmul instead of
  two; softmax reduces over sublanes); the backward feeds its D-contraction
  matmuls pre-transposed (G, D, S) operands and emits dKᵀ/dVᵀ from D-row
  matmuls, with the flash identity rowsum(dP⊙P) = rowsum(g⊙out) replacing
  an S×S multiply+reduce. sa6-shape fwd+bwd: 48.6 ms (XLA) → 17.6 (naive
  orientation) → 14.3 ms.

Semantics match the module's manual attention (torch ``nn.MultiheadAttention``
convention, ``modules/ddpm_utils.py:54-74``): softmax(q·kᵀ/√D)·v per head.

Layout: inputs are (B, H, S, D); internally flattened to (B·H, S, D) so the
last two block dims are the (sublane, lane)-tiled ones. D (8-32 here) is
lane-padded to 128 in VMEM — the price of the tiny model, paid on-chip only.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_mha", "attention_reference"]

_DOT_QK = (((2,), (2,)), ((0,), (0,)))   # contract D (lane·lane); batch G
_DOT_QKT = (((2,), (1,)), ((0,), (0,)))  # contract D vs pre-transposed (G,D,S)
_DOT_PV = (((2,), (1,)), ((0,), (0,)))   # contract S (k ax);      batch G
_DOT_T = (((1,), (1,)), ((0,), (0,)))    # contract q axis;        batch G
_DOT_2D = (((1,), (0,)), ((), ()))       # plain 2-D row x col contraction


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
    # Full-S q blocks up to 1024 (the f32 logits block is 4 MB and the
    # shrunk live set leaves room — measured: halving the program count at
    # S=1024 is worth ~6% fwd); longer sequences split the q axis, shrinking
    # the block so the (S, qblk) f32 logits stay within ~8 MB of VMEM.
    if s <= 1024:
        return s
    blk = min(512, max(128, (8 * 2**20 // (4 * s)) // 128 * 128))
    while s % blk:
        blk -= 128
    return blk


def _vmem_params(s: int):
    """Raise the kernel's scoped-VMEM cap above S=4096.

    The full-S forward at S=16384/D=32 (image-size 128, reference-quirk
    width) allocates 16.04 MB — 38 KB over Mosaic's 16 MB default cap — and
    hard-fails at compile time, while the same shape at D=8 fits: the live
    set depends on Mosaic's buffer-reuse decisions, which an analytic
    estimate cannot reproduce reliably. So the rule is empirical: every
    S<=4096 regime is measured to fit the default cap (which then keeps
    guarding those kernels against live-set regressions); above it the cap
    — not the hardware, v5e has 128 MB of VMEM — is the binding
    constraint, and is raised to half the physical budget.
    """
    if s <= 4096:
        return {}
    return {"compiler_params":
            pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)}


def _stats_on() -> bool:
    """Softmax-stat reuse (fold the softmax division out of the S x S domain
    in the forward and hand (m, denom) to the backward, which then skips its
    max/sum reductions and division pass). AFDM_FLASH_STATS=0 restores the
    round-2 self-contained kernels."""
    return os.environ.get("AFDM_FLASH_STATS", "1") != "0"


def _fwd_kernel(scale: float, mode: str, k_ref, qt_ref, vt_ref, ot_ref,
                m_ref=None, s_ref=None):
    """Forward in the TRANSPOSED world: logitsᵀ = K·Qᵀ, outᵀ = Vᵀ·Pᵀ.

    Cost model (measured + MXU stream analysis): a matmul here costs
    ≈ (LHS rows) × (contraction/128) × (output lane-tiles) row-passes, so
    any matmul whose LHS has only D (8-32) rows is ~16x cheaper than one
    streaming S rows. The plain layout needs TWO S-row matmuls (QK, PV);
    the transposed layout needs ONE (K·Qᵀ) — the PV-equivalent
    Vᵀ(D,S)·Pᵀ(S,Qblk) streams just D rows. Softmax reduces over the
    sublane axis instead of lanes; the host transposes outᵀ back (cheap
    XLA (bh, D, S) transpose)."""
    k = k_ref[...]                       # (G, S, D)
    qt = qt_ref[...]                     # (G, D, Qblk) — pre-transposed Q
    vt = vt_ref[...]                     # (G, D, S) — pre-transposed V
    logits_t = jax.lax.dot_general(
        k, qt, _DOT_QKT, preferred_element_type=jnp.float32
    ) * scale                            # (G, S, Qblk) f32 — VMEM only
    m = jnp.max(logits_t, axis=1, keepdims=True)
    p = jnp.exp(logits_t - m)
    ssum = jnp.sum(p, axis=1, keepdims=True)
    if mode in ("fold", "stats"):
        # UNNORMALIZED weights into the PV matmul; the 1/Σ normalization
        # moves from the (S, Qblk) domain to the (D, Qblk) output — one
        # fewer full-block VPU pass. "stats" additionally emits (m, Σ) so
        # the backward can skip its reductions.
        out_t = jax.lax.dot_general(
            vt, p.astype(vt.dtype), _DOT_QKT, preferred_element_type=jnp.float32
        ) / ssum                         # (G, D, Qblk) / (G, 1, Qblk)
        if mode == "stats":
            m_ref[...] = m
            s_ref[...] = ssum
    else:
        p = p / ssum
        out_t = jax.lax.dot_general(
            vt, p.astype(vt.dtype), _DOT_QKT, preferred_element_type=jnp.float32
        )                                # (G, D, Qblk)
    ot_ref[...] = out_t.astype(ot_ref.dtype)


def _bwd_kernel(scale: float, dqt: bool, stats: bool, q_ref, qt_ref, k_ref,
                kt_ref, vt_ref, g_ref, gt_ref, o_ref, m_ref, s_ref,
                dq_ref, dkt_ref, dvt_ref):
    """Full recompute backward for a group of (batch, head) pairs.

    dK/dV need contributions from every q row, so the backward keeps the
    whole S axis resident — comfortable in VMEM at S <= 1024 (the f32 S x S
    block is 4 MB). Every matmul runs in the MXU-native
    (lane-of-LHS · sublane-of-RHS) orientation: the D-contractions take
    pre-transposed (G, D, S) operands, and dK/dV are *produced* transposed
    — (G, D, S) = (small D) x S — so no S x S operand ever needs an
    internal relayout (the old sublane-sublane ``_DOT_T`` contractions
    forced one on P and dS). The host transposes dKᵀ/dVᵀ back, a cheap
    (bh, D, S) XLA transpose."""
    q = q_ref[...]
    qt = qt_ref[...]
    k = k_ref[...]
    kt = kt_ref[...]
    vt = vt_ref[...]
    g = g_ref[...]
    gt = gt_ref[...]
    dt = q.dtype

    logits = jax.lax.dot_general(
        q, kt, _DOT_QKT, preferred_element_type=jnp.float32
    ) * scale
    if stats:
        # Forward-saved softmax stats: skip the max/sum reductions and keep
        # the weights UNNORMALIZED — the 1/Σ ends up as a row scale on gᵀ
        # (for dV) and inside the (dP − δ) factor (for dS), both of which
        # leave the S x S domain.
        mi = jnp.swapaxes(m_ref[...], 1, 2)          # (G, S, 1)
        inv_s = 1.0 / jnp.swapaxes(s_ref[...], 1, 2)  # (G, S, 1)
        p_c = jnp.exp(logits - mi).astype(dt)         # unnormalized
        gt_scaled = gt * jnp.swapaxes(inv_s, 1, 2)    # (G, D, S) · (G, 1, S)
    else:
        mi = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mi)
        inv_s = None
        p = p / jnp.sum(p, axis=-1, keepdims=True)   # (G, S, S) f32
        p_c = p.astype(dt)
        gt_scaled = gt

    # dVᵀ = (Pᵀ g)ᵀ = gᵀ-row-major: dVᵀ[d, j] = Σ_i g[i, d] P[i, j]
    dvt = jax.lax.dot_general(
        gt_scaled, p_c, _DOT_QKT, preferred_element_type=jnp.float32
    )
    # dP = g Vᵀ ; dS = P ⊙ (dP − delta), with the flash-backward identity
    # delta = rowsum(dP ⊙ P) = rowsum(g ⊙ out) — an (S, D)-sized reduction
    # replacing a full S x S multiply + S x S rowsum.
    dp = jax.lax.dot_general(
        g, vt, _DOT_QKT, preferred_element_type=jnp.float32
    )
    delta = jnp.sum(
        g.astype(jnp.float32) * o_ref[...].astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    # p_c (input dtype) instead of the f32 p shrinks the f32 S x S live set
    # from {p, dp, ds} to {dp, ds} — VMEM headroom for DMA pipelining at
    # S=1024 where the block budget is tight. Identical math in f32 mode;
    # on the bf16 path the softmax weights enter this product in bf16 (the
    # same rounding the PV forward already uses).
    if stats:
        ds = p_c * ((dp - delta) * inv_s)
    else:
        ds = p_c * (dp - delta)
    ds_c = ds.astype(dt)
    if dqt:
        # dQᵀ = Kᵀ·dSᵀ — trades the third S-row matmul (dS(S,S)·K, ~S/D x
        # the cost of a D-row one at D=8..32) for ONE in-VMEM transpose of
        # the input-dtype dS block plus a D-row matmul; the host transposes
        # dQᵀ back like dKᵀ/dVᵀ. Measured (benchmarks/attn_variants.py,
        # v5e): sa6-shape fwd+bwd 12.7 -> 11.5 ms; loses at S <= 256.
        dst = jnp.swapaxes(ds_c, 1, 2)                    # (G, S_j, S_i)
        dq = jax.lax.dot_general(
            kt, dst, _DOT_QKT, preferred_element_type=jnp.float32
        ) * scale                                         # (G, D, S_i) = dQᵀ
    else:
        dq = jax.lax.dot_general(
            ds_c, k, _DOT_PV, preferred_element_type=jnp.float32
        ) * scale
    # dKᵀ[d, j] = Σ_i q[i, d] dS[i, j]
    dkt = jax.lax.dot_general(
        qt, ds_c, _DOT_QKT, preferred_element_type=jnp.float32
    ) * scale

    dq_ref[...] = dq.astype(dq_ref.dtype)
    dkt_ref[...] = dkt.astype(dkt_ref.dtype)
    dvt_ref[...] = dvt.astype(dvt_ref.dtype)


def _pick_q_strip(s: int) -> int:
    """Query-strip rows for the long-S backward: keep the ~14·B·S-byte f32
    strip live set (logits/dp/ds f32 + bf16 copies + the dSᵀ transpose)
    inside an 8 MB slice of the 16 MB scoped-VMEM budget, leaving room for
    operand/output pipelining. Multiples of 128 so the lane-dim slices of
    the pre-transposed operands stay tile-aligned."""
    b = max(128, (8 * 2**20 // (14 * s)) // 128 * 128)
    while s % b:
        b -= 128
    return b


def _bwd_kernel_strips(scale: float, stats: bool, q_ref, qt_ref, kt_ref,
                       vt_ref, g_ref, gt_ref, o_ref, m_ref, s_ref,
                       dqt_ref, dkt_ref, dvt_ref):
    """Flash backward for S > 1024: q-STRIP-blocked, dK/dV accumulated.

    The monolithic backward keeps the whole (S, S) f32 block resident —
    45.8 MB of scoped VMEM at S=4096 (image-size-64 training), a hard
    Mosaic OOM. This variant processes one (B, S) query strip per grid
    step: dQᵀ is written per strip, dKᵀ/dVᵀ accumulate in f32 across the
    sequential strip axis (their (D, S) accumulators are ~128 KB — the
    output blocks stay VMEM-resident because their index is constant in
    the strip dimension). Same math and matmul orientations as
    ``_bwd_kernel`` in dqt mode; per-strip softmax is exact because every
    strip sees the full key axis."""
    r = pl.program_id(1)
    q = q_ref[0]      # (B, D)
    qt = qt_ref[0]    # (D, B)
    kt = kt_ref[0]    # (D, S)
    vt = vt_ref[0]    # (D, S)
    g = g_ref[0]      # (B, D)
    gt = gt_ref[0]    # (D, B)
    dt = q.dtype

    logits = jax.lax.dot_general(
        q, kt, _DOT_2D, preferred_element_type=jnp.float32
    ) * scale                                       # (B, S) f32
    if stats:
        mi = jnp.swapaxes(m_ref[0], 0, 1)           # (B, 1)
        inv_s = 1.0 / jnp.swapaxes(s_ref[0], 0, 1)  # (B, 1)
        p_c = jnp.exp(logits - mi).astype(dt)       # unnormalized
        gt_scaled = gt * jnp.swapaxes(inv_s, 0, 1)  # (D, B) · (1, B)
    else:
        mi = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mi)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p_c = p.astype(dt)
        inv_s = None
        gt_scaled = gt
    dvt = jax.lax.dot_general(                      # (D, S)
        gt_scaled, p_c, _DOT_2D, preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(                       # (B, S)
        g, vt, _DOT_2D, preferred_element_type=jnp.float32
    )
    delta = jnp.sum(
        g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True,
    )
    if stats:
        ds = p_c * ((dp - delta) * inv_s)
    else:
        ds = p_c * (dp - delta)
    ds_c = ds.astype(dt)
    dst = jnp.swapaxes(ds_c, 0, 1)                  # (S, B) in-VMEM
    dqt = jax.lax.dot_general(                      # (D, B) = dQᵀ strip
        kt, dst, _DOT_2D, preferred_element_type=jnp.float32
    ) * scale
    dkt = jax.lax.dot_general(                      # (D, S)
        qt, ds_c, _DOT_2D, preferred_element_type=jnp.float32
    ) * scale

    dqt_ref[0] = dqt.astype(dqt_ref.dtype)

    @pl.when(r == 0)
    def _init():
        dkt_ref[0] = jnp.zeros_like(dkt_ref[0])
        dvt_ref[0] = jnp.zeros_like(dvt_ref[0])

    dkt_ref[0] += dkt
    dvt_ref[0] += dvt


def _flash_bwd_strips(q, k, v, out, m, ssum, g_out, scale, interpret):
    """Wrapper for the long-S (S > 1024) strip-blocked backward."""
    b, h, s, d = q.shape
    bh = b * h
    q3, g3, o3 = (a.reshape(bh, s, d) for a in (q, g_out, out))
    qt = jnp.swapaxes(q3, 1, 2)
    kt = jnp.swapaxes(k.reshape(bh, s, d), 1, 2)
    vt = jnp.swapaxes(v.reshape(bh, s, d), 1, 2)
    gt = jnp.swapaxes(g3, 1, 2)
    blk = _pick_q_strip(s)
    grid = (bh, s // blk)
    vmem_kw = _vmem_params(s)
    sspec = pl.BlockSpec((1, blk, d), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM)
    tstrip = pl.BlockSpec((1, d, blk), lambda i, r: (i, 0, r),
                          memory_space=pltpu.VMEM)
    tfull = pl.BlockSpec((1, d, s), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    stats = m is not None
    inputs = [q3, qt, kt, vt, g3, gt, o3]
    in_specs = [sspec, tstrip, tfull, tfull, sspec, tstrip, sspec]
    if stats:
        stspec = pl.BlockSpec((1, 1, blk), lambda i, r: (i, 0, r),
                              memory_space=pltpu.VMEM)
        inputs += [m, ssum]
        in_specs += [stspec, stspec]
        kern = functools.partial(_bwd_kernel_strips, float(scale), True)
    else:
        def kern(*refs):
            (q_r, qt_r, kt_r, vt_r, g_r, gt_r, o_r, dq_r, dk_r, dv_r) = refs
            _bwd_kernel_strips(float(scale), False, q_r, qt_r, kt_r, vt_r,
                               g_r, gt_r, o_r, None, None, dq_r, dk_r, dv_r)
    # dKᵀ/dVᵀ accumulate across strips — f32 outputs so the partial sums
    # don't round in bf16; cast after the kernel.
    dqt, dkt, dvt = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((bh, d, s), q.dtype),
            jax.ShapeDtypeStruct((bh, d, s), jnp.float32),
            jax.ShapeDtypeStruct((bh, d, s), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tstrip, tfull, tfull),
        interpret=interpret,
        **vmem_kw,
    )(*inputs)
    shape4 = (b, h, s, d)
    dq = jnp.swapaxes(dqt, 1, 2).reshape(shape4)
    dk = jnp.swapaxes(dkt.astype(q.dtype), 1, 2).reshape(shape4)
    dv = jnp.swapaxes(dvt.astype(q.dtype), 1, 2).reshape(shape4)
    return dq, dk, dv


def _flash_fwd(q, k, v, scale, interpret, with_stats=False):
    """Forward kernel wrapper. ``with_stats=True`` (the vjp path with
    softmax-stat reuse on) additionally returns the per-query softmax
    ``(max, denom)`` as two (bh, 1, S) f32 arrays for the backward."""
    b, h, s, d = q.shape
    bh = b * h
    k3 = k.reshape(bh, s, d)
    qt = jnp.swapaxes(q.reshape(bh, s, d), 1, 2)  # (bh, D, S), XLA transpose
    vt = jnp.swapaxes(v.reshape(bh, s, d), 1, 2)
    g = _pick_group(s, bh)
    qblk = _pick_q_block(s) if g == 1 else s
    grid = (bh // g, s // qblk)
    kspec = pl.BlockSpec(
        (g, s, d), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
    )
    qtspec = pl.BlockSpec(
        (g, d, qblk), lambda i, r: (i, 0, r), memory_space=pltpu.VMEM
    )
    vtspec = pl.BlockSpec(
        (g, d, s), lambda i, r: (i, 0, 0), memory_space=pltpu.VMEM
    )
    mode = ("stats" if with_stats else "fold") if _stats_on() else "plain"
    vmem_kw = _vmem_params(s)
    out_shape = jax.ShapeDtypeStruct((bh, d, s), q.dtype)
    if mode == "stats":
        sspec = pl.BlockSpec(
            (g, 1, qblk), lambda i, r: (i, 0, r), memory_space=pltpu.VMEM
        )
        sshape = jax.ShapeDtypeStruct((bh, 1, s), jnp.float32)
        out_t, m, ssum = pl.pallas_call(
            functools.partial(_fwd_kernel, float(scale), mode),
            out_shape=(out_shape, sshape, sshape),
            grid=grid,
            in_specs=[kspec, qtspec, vtspec],
            out_specs=(qtspec, sspec, sspec),
            interpret=interpret,
            **vmem_kw,
        )(k3, qt, vt)
        return jnp.swapaxes(out_t, 1, 2).reshape(b, h, s, d), m, ssum
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, float(scale), mode),
        out_shape=out_shape,
        grid=grid,
        in_specs=[kspec, qtspec, vtspec],
        out_specs=qtspec,
        interpret=interpret,
        **vmem_kw,
    )(k3, qt, vt)
    out = jnp.swapaxes(out_t, 1, 2).reshape(b, h, s, d)
    return (out, None, None) if with_stats else out


def _flash_bwd(q, k, v, out, m, ssum, g_out, scale, interpret):
    b, h, s, d = q.shape
    # The monolithic backward's full (S, S) f32 live set exceeds scoped
    # VMEM above S=1024 (hard Mosaic OOM at S=4096 / image-size 64). At
    # S=1024 itself both kernels fit; measured (idle v5e, sa6 shape): the
    # monolithic kernel keeps the edge, so strips engage strictly above.
    strip_min = int(os.environ.get("AFDM_FLASH_STRIP_MIN", "1025"))
    if s >= strip_min:
        return _flash_bwd_strips(q, k, v, out, m, ssum, g_out, scale,
                                 interpret)
    bh = b * h
    q3, k3, v3, g3, o3 = (a.reshape(bh, s, d) for a in (q, k, v, g_out, out))
    qt = jnp.swapaxes(q3, 1, 2)  # (bh, D, S) operands for the MXU-native
    kt = jnp.swapaxes(k3, 1, 2)  # orientation of every kernel matmul
    vt = jnp.swapaxes(v3, 1, 2)
    gt = jnp.swapaxes(g3, 1, 2)
    # The backward holds ~4 f32 (G, S, S) temporaries — halve the group.
    g = max(1, _pick_group(s, bh) // 2)
    while bh % g:
        g -= 1
    grid = (bh // g,)
    spec = pl.BlockSpec((g, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((g, d, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, s, d), q.dtype)
    tshape = jax.ShapeDtypeStruct((bh, d, s), q.dtype)
    env_dqt = os.environ.get("AFDM_FLASH_DQT")
    dqt_mode = (env_dqt == "1") if env_dqt in ("0", "1") else s >= 512
    stats = m is not None
    inputs = [q3, qt, k3, kt, vt, g3, gt, o3]
    in_specs = [spec, tspec, spec, tspec, tspec, spec, tspec, spec]
    if stats:
        sspec = pl.BlockSpec(
            (g, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        inputs += [m, ssum]
        in_specs += [sspec, sspec]
        kern = functools.partial(_bwd_kernel, float(scale), dqt_mode, True)
    else:
        def kern(*refs):
            (q_r, qt_r, k_r, kt_r, vt_r, g_r, gt_r, o_r,
             dq_r, dk_r, dv_r) = refs
            _bwd_kernel(float(scale), dqt_mode, False, q_r, qt_r, k_r, kt_r,
                        vt_r, g_r, gt_r, o_r, None, None, dq_r, dk_r, dv_r)
    dq, dkt, dvt = pl.pallas_call(
        kern,
        out_shape=(tshape if dqt_mode else shape, tshape, tshape),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tspec if dqt_mode else spec, tspec, tspec),
        interpret=interpret,
    )(*inputs)
    shape4 = (b, h, s, d)
    if dqt_mode:
        dq = jnp.swapaxes(dq, 1, 2)
    dk = jnp.swapaxes(dkt, 1, 2)
    dv = jnp.swapaxes(dvt, 1, 2)
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
    out, m, ssum = _flash_fwd(q, k, v, scale, interpret, with_stats=True)
    return out, (q, k, v, out, m, ssum)


def _mha_bwd_rule(scale, interpret, residuals, g):
    q, k, v, out, m, ssum = residuals
    scale = float(scale) if scale is not None else float(1.0 / np.sqrt(q.shape[-1]))
    dq, dk, dv = _flash_bwd(q, k, v, out, m, ssum, g, scale, interpret)
    return dq, dk, dv


flash_mha.defvjp(_mha_fwd_rule, _mha_bwd_rule)
