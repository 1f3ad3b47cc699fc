"""UNet building blocks (flax.linen, NHWC).

TPU-native rebuild of the reference block zoo (``modules/ddpm_utils.py:54-480``).
Instead of the reference's eight near-duplicate ``Down_*``/``Up_*`` classes,
``Down``/``Up`` here are parameterized by *resample mode* and *conv mode*;
the exact reference taxonomy (``modules/ddpm_utils.py:247-252``) maps as:

=============  ==========================  ============================
reference      resample                    conv
=============  ==========================  ============================
``Down``       ``maxpool``                 ``plain``       (variant 0)
``Down_F``     ``maxpool``                 ``filtered``    (variant 2)
``Down_FF``    ``aliasfree``               ``plain``       (variant 1)
``Down_FFF``   ``aliasfree``               ``filtered``    (variant 3)
``Down_F4``    ``aliasfree``               ``filtered4``   (variant 4)
``Up``         ``bilinear``                ``plain``
``Up_F``       ``bilinear``                ``filtered``
``Up_FF``      ``aliasfree``               ``plain``
``Up_FFF``     ``aliasfree``               ``filtered``
``Up_F4``      ``aliasfree``               ``filtered4``
=============  ==========================  ============================

All spatial compute is NHWC (channels on the TPU lane dimension); filter taps
are derived from the static :class:`FilterSettings` at trace time and baked
into the graph (the reference instead stores plain tensors and device-moves
them per call — ``modules/ddpm_utils.py:102-107``, ``modules/filtrs.py:73``).

Numerics parity choices (tested against torch CPU in ``tests/test_blocks.py``):
exact (erf) GELU, GroupNorm(1 group) == LayerNorm over (H,W,C) with eps 1e-5,
LayerNorm eps 1e-5, align_corners=True bilinear upsample, torch default inits.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
from aliasfree_diffusion_models_pytorch_tpu.models.init import (
    normal_unit,
    torch_bias_init,
    torch_kernel_init,
    xavier_uniform,
    zeros,
)
from aliasfree_diffusion_models_pytorch_tpu.ops.filters import circular_lowpass_kernel
from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
    downsample2x,
    filtered_gelu,
    gelu_exact,
    maxpool2x,
    upsample2x,
    upsample_bilinear_align_corners,
)

Dtype = jnp.dtype

# Default to exact fp32 matmuls/convs: several backends (including XLA:CPU)
# otherwise use a reduced-precision fast path that breaks parity with torch
# by ~1e-2. bfloat16 runs pass precision=DEFAULT explicitly (MXU-native).
HIGHEST = lax.Precision.HIGHEST


def _gelu(x):
    """Exact erf GELU — torch ``nn.GELU()`` default (NOT the tanh approximation
    that ``jax.nn.gelu`` defaults to). bf16 inputs take the minimax-polynomial
    fast path (``ops/resample.py:gelu_exact`` — 3.1e-4 worst case, an order
    below bf16 rounding); f32 stays the erf form for torch parity."""
    return gelu_exact(x)


def design_taps(f: FilterSettings) -> tuple[np.ndarray, np.ndarray]:
    """(up_taps, down_taps) from the static filter settings.

    Both the "jinc" (down) and "sinc" (up) members come from the same
    circularly-symmetric design, differing only in cutoff — the reference's
    member names are cosmetic (``modules/ddpm_utils.py:102-107``).
    """
    down = circular_lowpass_kernel(
        f.omega_c_down, f.kernel_size, f.kaiser_beta, normalize=f.normalize
    )
    up = circular_lowpass_kernel(
        f.omega_c_up, f.kernel_size, f.kaiser_beta, normalize=f.normalize
    )
    return up, down


class Conv3x3(nn.Module):
    """3x3 SAME conv, no bias — the DoubleConv workhorse
    (``modules/ddpm_utils.py:84-88``)."""

    features: int
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * 9
        return nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)


class GroupNorm1(nn.Module):
    """GroupNorm with a single group == LayerNorm over (H, W, C) with
    per-channel affine — torch ``nn.GroupNorm(1, C)`` (eps 1e-5)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype, name="gn")(x)


class FilteredGELU(nn.Module):
    """2x alias-free upsample → GELU → 2x alias-free downsample.

    The Config-C primitive injected around every GELU of the filtered blocks
    (``modules/ddpm_utils.py:118-142``). Lowers to the polyphase elementwise
    formulation (``ops/resample.py:filtered_gelu_phases``) on the measured
    default path; see that module's docs for the fused-Pallas post-mortem.
    """

    filters: FilterSettings
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x):
        up, down = design_taps(self.filters)
        return filtered_gelu(x, up, down, precision=self.precision)


class DoubleConv(nn.Module):
    """conv3x3 → GN → GELU → conv3x3 → GN, optional residual
    (``modules/ddpm_utils.py:77-95``).

    ``conv_mode``:
      * ``"plain"``     — reference ``DoubleConv``.
      * ``"filtered"``  — reference ``DoubleConv_F`` (``:97-143``): the GELU is
        filtered; in residual mode a *second* filtered GELU runs after the
        residual add.
      * ``"filtered4"`` — reference ``DoubleConv_F4`` (``:145-197``): GroupNorm
        moves *after* the 2x upsample (applied in the high-res domain); the
        residual tail reuses ``norm2``'s parameters a second time.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    residual: bool = False
    conv_mode: str = "plain"  # plain | filtered | filtered4
    filters: Optional[FilterSettings] = None
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        conv1 = Conv3x3(mid, dtype=self.dtype, precision=self.precision, name="conv1")
        norm1 = GroupNorm1(dtype=self.dtype, name="norm1")
        conv2 = Conv3x3(
            self.out_channels, dtype=self.dtype, precision=self.precision, name="conv2"
        )
        norm2 = GroupNorm1(dtype=self.dtype, name="norm2")

        if self.conv_mode == "plain":
            h = norm2(conv2(_gelu(norm1(conv1(x)))))
            return _gelu(x + h) if self.residual else h

        if self.filters is None:
            raise ValueError("f_settings is empty")  # reference error string
        up, down = design_taps(self.filters)

        def fgelu(h):
            return FilteredGELU(self.filters, precision=self.precision)(h)

        if self.conv_mode == "filtered":
            h = conv1(x)
            h = norm1(h)
            h = fgelu(h)
            h = conv2(h)
            h = norm2(h)
            if not self.residual:
                return h
            return fgelu(h + x)

        if self.conv_mode == "filtered4":
            # Norm in the upsampled (high-res) domain.
            h = conv1(x)
            h = upsample2x(h, up, precision=self.precision)
            h = norm1(h)
            h = _gelu(h)
            h = downsample2x(h, down, precision=self.precision)
            h = conv2(h)
            h = norm2(h)
            if not self.residual:
                return h
            h = h + x
            h = upsample2x(h, up, precision=self.precision)
            h = norm2(h)  # same parameters applied a second time — reference quirk
            h = _gelu(h)
            return downsample2x(h, down, precision=self.precision)

        raise ValueError(f"unknown conv_mode {self.conv_mode!r}")


class TimeEmbedAdd(nn.Module):
    """SiLU → Linear(emb_dim → C), broadcast-add over the spatial map
    (``modules/ddpm_utils.py:208-219``)."""

    features: int
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x, t_emb):
        emb = nn.Dense(
            self.features,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(t_emb.shape[-1]),
            dtype=self.dtype,
            precision=self.precision,
            name="proj",
        )(jax.nn.silu(t_emb))
        return x + emb[:, None, None, :]


class Down(nn.Module):
    """Encoder stage: 2x downsample → DoubleConv(residual) → DoubleConv → +t-emb.

    ``resample='maxpool'`` is the baseline ``Down`` (``modules/ddpm_utils.py:199-219``);
    ``resample='aliasfree'`` replaces the pool with a jinc-filtered decimation,
    the ``Down_FF``/``Down_FFF``/``Down_F4`` family (``:301-328, :360-387, :419-448``).
    """

    out_channels: int
    resample: str = "maxpool"  # maxpool | aliasfree
    conv_mode: str = "plain"
    filters: Optional[FilterSettings] = None
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x, t_emb):
        in_ch = x.shape[-1]
        if self.resample == "maxpool":
            x = maxpool2x(x)
        elif self.resample == "aliasfree":
            _, down = design_taps(self.filters)
            x = downsample2x(x, down, precision=self.precision)
        else:
            raise ValueError(f"unknown resample {self.resample!r}")
        kw = dict(
            conv_mode=self.conv_mode,
            filters=self.filters,
            dtype=self.dtype,
            precision=self.precision,
        )
        x = DoubleConv(in_ch, residual=True, name="conv_res", **kw)(x)
        x = DoubleConv(self.out_channels, name="conv_out", **kw)(x)
        return TimeEmbedAdd(self.out_channels, dtype=self.dtype, precision=self.precision, name="emb")(x, t_emb)


class Up(nn.Module):
    """Decoder stage: 2x upsample → concat(skip, x) → convs → +t-emb.

    ``resample='bilinear'`` is the baseline ``Up`` with align_corners=True
    (``modules/ddpm_utils.py:222-245``); ``resample='aliasfree'`` replaces it
    with sinc-filtered zero-stuffing (``Up_FF``/``Up_FFF``/``Up_F4``,
    ``:330-358, :389-417, :450-480``). Skip tensor comes FIRST in the concat
    (``modules/ddpm_utils.py:242``).
    """

    out_channels: int
    resample: str = "bilinear"  # bilinear | aliasfree
    conv_mode: str = "plain"
    filters: Optional[FilterSettings] = None
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST

    @nn.compact
    def __call__(self, x, skip, t_emb):
        if self.resample == "bilinear":
            x = upsample_bilinear_align_corners(x, 2, precision=self.precision)
        elif self.resample == "aliasfree":
            up, _ = design_taps(self.filters)
            x = upsample2x(x, up, precision=self.precision)
        else:
            raise ValueError(f"unknown resample {self.resample!r}")
        x = jnp.concatenate([skip, x], axis=-1)
        in_ch = x.shape[-1]
        kw = dict(
            conv_mode=self.conv_mode,
            filters=self.filters,
            dtype=self.dtype,
            precision=self.precision,
        )
        x = DoubleConv(in_ch, residual=True, name="conv_res", **kw)(x)
        x = DoubleConv(
            self.out_channels, mid_channels=in_ch // 2, name="conv_out", **kw
        )(x)
        return TimeEmbedAdd(self.out_channels, dtype=self.dtype, precision=self.precision, name="emb")(x, t_emb)


class SelfAttention(nn.Module):
    """Pre-LN transformer block on flattened spatial tokens
    (``modules/ddpm_utils.py:54-74``).

    LN → 4-head self-attention (residual) → [LN → Linear → GELU → Linear]
    (residual). Unlike the reference, the spatial size is derived from the
    input shape rather than baked at construction, so the model is no longer
    resolution-rigid. torch ``nn.MultiheadAttention`` packed-qkv semantics are
    reproduced with a single fused qkv projection (xavier-uniform, zero bias).
    """

    channels: int
    num_heads: int = 4
    dtype: Optional[Dtype] = None
    precision: lax.Precision | None = HIGHEST
    # "auto": fused Pallas flash attention on the TPU bf16 perf path for
    # sequences >= 256 (profiled: the XLA path's HBM-materialized S x S
    # logits dominate the train step — benchmarks/breakdown.py); "xla" and
    # "flash" force a path; AFDM_FLASH_ATTN=0/1 overrides "auto".
    attn_impl: str = "auto"

    def _use_flash(self, seq_len: int) -> bool:
        if self.attn_impl == "xla":
            return False
        if self.attn_impl == "flash":
            return True
        env = os.environ.get("AFDM_FLASH_ATTN")
        if env in ("0", "1"):
            return env == "1"
        # auto: the perf path only — fp32 HIGHEST keeps the XLA einsums for
        # exact torch parity; q-blocking needs seq to split cleanly. The
        # sequence threshold is measured (benchmarks/attn_variants.py, v5e):
        # after the round-2 orientation rework the kernel wins 2.7x at S=256
        # (fwd+bwd 1.7 vs 4.6 ms at batch 256); XLA ties at S=64 and keeps
        # the sub-256 shapes.
        min_seq = int(os.environ.get("AFDM_FLASH_MIN_SEQ", "256"))
        # Upper cap: measured through S=16384 (image-size 128), where the
        # q-strip backward still beats XLA 3.4x fwd+bwd
        # (sample_results/attn_handoff.json: S=4096 33.6 vs 109 ms, S=8192
        # 35.3 vs 104, S=16384 32.8 vs 88). Above 16384 the strip formula's
        # 128-row floor puts the (rows, S) f32 strip past scoped VMEM —
        # unmeasured territory, handed to XLA.
        max_seq = int(os.environ.get("AFDM_FLASH_MAX_SEQ", "16384"))
        return (
            self.precision is None
            and min_seq <= seq_len <= max_seq
            and (seq_len <= 512 or seq_len % 512 == 0)
            and jax.default_backend() == "tpu"
        )

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        assert c == self.channels, (c, self.channels)
        tokens = x.reshape(n, h * w, c)

        x_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(tokens)
        qkv = nn.Dense(
            3 * c,
            kernel_init=xavier_uniform,
            bias_init=zeros,
            dtype=self.dtype,
            precision=self.precision,
            name="qkv",
        )(x_ln)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = c // self.num_heads

        def split_heads(a):
            return a.reshape(n, h * w, self.num_heads, head_dim)

        if self._use_flash(h * w):
            # Fused Pallas path: logits/weights stay in VMEM (f32 softmax),
            # HBM sees only q/k/v/out. Same math as the einsum path below.
            from aliasfree_diffusion_models_pytorch_tpu.ops.flash_attention import (
                flash_mha,
            )

            def to_bhsd(a):
                return split_heads(a).transpose(0, 2, 1, 3)

            attn = flash_mha(
                to_bhsd(q), to_bhsd(k), to_bhsd(v),
                float(1.0 / np.sqrt(head_dim)),
                jax.default_backend() != "tpu",  # interpret for CPU tests
            ).transpose(0, 2, 1, 3).reshape(n, h * w, c)
        else:
            # Manual scaled-dot-product attention (rather than
            # jax.nn.dot_product_attention) so the matmul precision is
            # pinned — torch scales q by 1/sqrt(head_dim) pre-matmul;
            # equivalent here.
            qh = split_heads(q) * float(1.0 / np.sqrt(head_dim))
            kh = split_heads(k)
            vh = split_heads(v)
            logits = jnp.einsum(
                "nqhd,nkhd->nhqk", qh, kh, precision=self.precision
            )
            weights = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum(
                "nhqk,nkhd->nqhd", weights, vh, precision=self.precision
            ).reshape(n, h * w, c)
        attn = nn.Dense(
            c,
            kernel_init=torch_kernel_init,
            bias_init=zeros,  # torch MHA zeroes the out-proj bias
            dtype=self.dtype,
            precision=self.precision,
            name="out",
        )(attn)
        tokens = attn + tokens

        ff = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ff_ln")(tokens)
        ff = nn.Dense(
            c,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(c),
            dtype=self.dtype,
            precision=self.precision,
            name="ff1",
        )(ff)
        ff = _gelu(ff)
        ff = nn.Dense(
            c,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(c),
            dtype=self.dtype,
            precision=self.precision,
            name="ff2",
        )(ff)
        tokens = ff + tokens
        return tokens.reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# Reference-named aliases, for users migrating from the torch codebase.
# ---------------------------------------------------------------------------


def _down_alias(resample: str, conv_mode: str) -> Callable[..., Down]:
    def make(out_channels: int, filters: FilterSettings | None = None, **kw) -> Down:
        return Down(
            out_channels, resample=resample, conv_mode=conv_mode, filters=filters, **kw
        )

    return make


def _up_alias(resample: str, conv_mode: str) -> Callable[..., Up]:
    def make(out_channels: int, filters: FilterSettings | None = None, **kw) -> Up:
        return Up(
            out_channels, resample=resample, conv_mode=conv_mode, filters=filters, **kw
        )

    return make


Down_F = _down_alias("maxpool", "filtered")
Down_FF = _down_alias("aliasfree", "plain")
Down_FFF = _down_alias("aliasfree", "filtered")
Down_F4 = _down_alias("aliasfree", "filtered4")
Up_F = _up_alias("bilinear", "filtered")
Up_FF = _up_alias("aliasfree", "plain")
Up_FFF = _up_alias("aliasfree", "filtered")
Up_F4 = _up_alias("aliasfree", "filtered4")


def DoubleConv_F(out_channels, mid_channels=None, residual=False, filters=None, **kw):
    return DoubleConv(
        out_channels, mid_channels, residual, conv_mode="filtered", filters=filters, **kw
    )


def DoubleConv_F4(out_channels, mid_channels=None, residual=False, filters=None, **kw):
    return DoubleConv(
        out_channels, mid_channels, residual, conv_mode="filtered4", filters=filters, **kw
    )


class LabelEmbedding(nn.Module):
    """Class-conditional embedding added to the time embedding
    (``modules/ddpm_models.py:253-258``)."""

    num_classes: int
    time_dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, y):
        return nn.Embed(
            self.num_classes, self.time_dim, embedding_init=normal_unit,
            dtype=self.dtype, name="embed"
        )(y)
