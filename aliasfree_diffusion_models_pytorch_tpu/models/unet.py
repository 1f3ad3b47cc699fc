"""Versioned UNet denoiser (flax.linen, NHWC).

Topology parity with the reference ``UNet`` (``modules/ddpm_models.py:41-298``)
across ``variant=0..4``; the five hand-unrolled constructor branches collapse
to one skeleton plus a variant→(resample, conv) spec table, since only the
block classes differ between variants (verified in SURVEY.md §2.3).

Channel widths are parameterized by ``image_size`` (reference quirk: base
width == image size — at 32x32 the base width is 32), shared skeleton:

    inc:   DoubleConv(c_in → S)
    down1: S → 2S   @ S/2      sa1(2S)
    down2: 2S → 4S  @ S/4      sa2(4S)
    down3: 4S → 4S  @ S/8      sa3(4S)
    bot:   4S → 8S → 8S → 4S
    up1:   (4S + skip 4S) → 2S @ S/4   sa4(2S)
    up2:   (2S + skip 2S) → S  @ S/2   sa5(S)
    up3:   (S + skip S)   → S  @ S     sa6(S)
    outc:  Conv1x1(S → c_out)

I/O is NHWC; use :func:`aliasfree_diffusion_models_pytorch_tpu.utils.layout`
helpers at the NCHW edge if migrating torch-shaped data.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import numpy as np
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
from aliasfree_diffusion_models_pytorch_tpu.models.blocks import (
    DoubleConv,
    Down,
    LabelEmbedding,
    SelfAttention,
    Up,
)
from aliasfree_diffusion_models_pytorch_tpu.models.init import (
    torch_bias_init,
    torch_kernel_init,
)

# variant → (down/up resample mode, down/up conv mode, inc/bottleneck conv mode)
# Reference mapping: modules/ddpm_models.py:48-249.
VARIANT_SPEC: dict[int, tuple[str, str, str, str]] = {
    #        down-resample  up-resample  stage-conv   trunk-conv (inc+bot)
    0: ("maxpool", "bilinear", "plain", "plain"),
    1: ("aliasfree", "aliasfree", "plain", "plain"),
    2: ("maxpool", "bilinear", "filtered", "filtered"),
    3: ("aliasfree", "aliasfree", "filtered", "filtered"),
    4: ("aliasfree", "aliasfree", "filtered4", "filtered4"),
}

VARIANT_NAMES = {
    0: "Config A — baseline UNet",
    1: "Config B — alias-free up/downsampling",
    2: "Config C — filtered nonlinearities",
    3: "Config D — alias-free resampling + filtered nonlinearities",
    4: "variant 4 (unpublished) — D with post-upsample GroupNorm",
}



@functools.lru_cache(maxsize=8)
def _time_embedding_table(table_size: int, channels: int) -> np.ndarray:
    """Exact float64 sinusoidal table for integer timesteps [0, table_size).

    Formula parity with ``UNet.pos_encoding`` (``modules/ddpm_models.py:261-269``):
    ``inv_freq = 1 / 10000**(arange(0, C, 2)/C)``;
    ``concat[sin(t*inv_freq), cos(t*inv_freq)]`` — all sines then all cosines.

    Precomputing in float64 sidesteps XLA's fast-path ``sin``, whose argument
    reduction loses ~1e-3 accuracy at args ≈ t_max (torch's libm sin does
    not) — and turns the per-step transcendentals into a single gather.
    """
    # inv_freq is computed in float64 and correctly rounded to float32
    # (torch's own fp32 pow rounds ~15% of values 1 ulp differently — at
    # t~1000 that amplifies to ~1e-4 in the angle, the agreed tolerance in
    # tests); sin/cos are evaluated in float64 where torch's libm is accurate
    # and XLA's fast-path sin is not.
    t = np.arange(table_size, dtype=np.float64)[:, None]
    inv_freq = (
        1.0 / (10000.0 ** (np.arange(0, channels, 2, dtype=np.float64) / channels))
    ).astype(np.float32).astype(np.float64)
    ang = t * inv_freq[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def sinusoidal_time_embedding(
    t: jax.Array, channels: int, table_size: int | None = 1024
) -> jax.Array:
    """Sinusoidal timestep encoding, ``(B,) -> (B, channels)``.

    Integer timesteps below ``table_size`` (the DDPM case — t < noise_steps)
    go through the exact precomputed table; ``table_size=None`` falls back to
    the closed-form float32 formula (valid for arbitrary/fractional t, with
    XLA's sin accuracy caveat).
    """
    if table_size is not None:
        table = jnp.asarray(_time_embedding_table(table_size, channels))
        # mode="clip": jnp.take's default out-of-bounds fill is NaN, which
        # silently poisons training if the table is undersized (build_model
        # sizes it from noise_steps; clipping is the safe fallback for direct
        # UNet users who pass t >= table_size).
        return jnp.take(table, t.astype(jnp.int32), axis=0, mode="clip")
    t = t.astype(jnp.float32)[:, None]
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, channels, 2, dtype=jnp.float32) / channels)
    )
    ang = t * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class UNet(nn.Module):
    """Denoiser ``eps_theta(x_t, t[, y])`` with 5 selectable topologies.

    Args mirror the reference constructor (``modules/ddpm_models.py:41``)
    minus the device (JAX arrays carry placement) — ``c_in``/``c_out``,
    ``image_size`` (also the base channel width), ``time_dim``, optional
    ``filters`` (required for variants 1-4), optional ``num_classes`` for the
    conditional mode, and ``variant``.

    Beyond parity: ``base_width`` decouples model capacity from resolution.
    The reference ties the base channel width to ``image_size``
    (``modules/ddpm_models.py:41-251`` uses ``image_size`` for both), so its
    only way to widen the model is to grow the images. ``base_width=None``
    (default) preserves that quirk exactly; setting it overrides the channel
    widths (stages are ``w, 2w, 4w, 4w / 8w bottleneck``) while spatial
    resolutions still follow ``image_size``. Must be a multiple of 4 (the
    4-head attention splits channels evenly).
    """

    c_in: int = 3
    c_out: int = 3
    image_size: int = 64
    base_width: Optional[int] = None
    time_dim: int = 256
    filters: Optional[FilterSettings] = None
    num_classes: Optional[int] = None
    variant: int = 0
    time_table_size: int = 1024  # exact-embedding table; covers t < noise_steps
    dtype: Optional[jnp.dtype] = None
    precision: lax.Precision | None = lax.Precision.HIGHEST

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        y: jax.Array | None = None,
        y_mask: jax.Array | None = None,
    ):
        if self.variant not in VARIANT_SPEC:
            raise ValueError("variant value must be between 0 and 4")
        if self.variant != 0 and self.filters is None:
            raise ValueError("f_settings is empty")  # reference error string
        down_rs, up_rs, stage_conv, trunk_conv = VARIANT_SPEC[self.variant]

        s = int(self.base_width) if self.base_width is not None \
            else int(self.image_size)
        if s < 4 or s % 4 != 0:
            raise ValueError(
                f"base width {s} must be a positive multiple of 4 "
                "(4-head attention)"
            )
        kw = dict(
            filters=self.filters,
            dtype=self.dtype,
            precision=self.precision,
        )
        dc = dict(conv_mode=trunk_conv, **kw)

        t_emb = sinusoidal_time_embedding(t, self.time_dim, self.time_table_size)
        if self.dtype is not None:
            t_emb = t_emb.astype(self.dtype)
        if y is not None:
            if self.num_classes is None:
                raise ValueError("num_classes must be set for conditional mode")
            label_emb = LabelEmbedding(
                self.num_classes, self.time_dim, dtype=self.dtype, name="label_emb"
            )(y)
            if y_mask is not None:
                # Per-sample conditioning gate: 1.0 keeps the label embedding,
                # 0.0 reduces the sample to the unconditional model (exactly
                # what calling with y=None computes — tested). Used for CFG
                # label dropout in training and for the batched
                # conditional+unconditional CFG forward at sampling time.
                label_emb = label_emb * y_mask.astype(label_emb.dtype)[:, None]
            t_emb = t_emb + label_emb

        x1 = DoubleConv(s, name="inc", **dc)(x)
        x2 = Down(2 * s, resample=down_rs, conv_mode=stage_conv, name="down1", **kw)(
            x1, t_emb
        )
        x2 = SelfAttention(2 * s, dtype=self.dtype, precision=self.precision,
                           name="sa1")(x2)
        x3 = Down(4 * s, resample=down_rs, conv_mode=stage_conv, name="down2", **kw)(
            x2, t_emb
        )
        x3 = SelfAttention(4 * s, dtype=self.dtype, precision=self.precision,
                           name="sa2")(x3)
        x4 = Down(4 * s, resample=down_rs, conv_mode=stage_conv, name="down3", **kw)(
            x3, t_emb
        )
        x4 = SelfAttention(4 * s, dtype=self.dtype, precision=self.precision,
                           name="sa3")(x4)

        x4 = DoubleConv(8 * s, name="bot1", **dc)(x4)
        x4 = DoubleConv(8 * s, name="bot2", **dc)(x4)
        x4 = DoubleConv(4 * s, name="bot3", **dc)(x4)

        h = Up(2 * s, resample=up_rs, conv_mode=stage_conv, name="up1", **kw)(
            x4, x3, t_emb
        )
        h = SelfAttention(2 * s, dtype=self.dtype, precision=self.precision,
                          name="sa4")(h)
        h = Up(s, resample=up_rs, conv_mode=stage_conv, name="up2", **kw)(h, x2, t_emb)
        h = SelfAttention(s, dtype=self.dtype, precision=self.precision, name="sa5")(h)
        h = Up(s, resample=up_rs, conv_mode=stage_conv, name="up3", **kw)(h, x1, t_emb)
        h = SelfAttention(s, dtype=self.dtype, precision=self.precision, name="sa6")(h)

        out = nn.Conv(
            self.c_out,
            (1, 1),
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(s),
            dtype=self.dtype,
            precision=self.precision,
            name="outc",
        )(h)
        return out.astype(jnp.float32)

    def init_params(self, rng: jax.Array, batch: int = 1):
        """Initialize parameters with a dummy batch (NHWC)."""
        x = jnp.zeros((batch, self.image_size, self.image_size, self.c_in))
        t = jnp.ones((batch,), jnp.int32)
        y = jnp.zeros((batch,), jnp.int32) if self.num_classes else None
        if y is None:
            return self.init(rng, x, t)
        return self.init(rng, x, t, y)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


# Module order + activation resolution divisor of the shared skeleton (see
# module docstring). Used by model_summary for the Results.ipynb-style
# inspection table (cells 5-15: ``print(model)`` + per-layer shapes).
_SKELETON = [
    ("inc", 1), ("down1", 2), ("sa1", 2), ("down2", 4), ("sa2", 4),
    ("down3", 8), ("sa3", 8), ("bot1", 8), ("bot2", 8), ("bot3", 8),
    ("up1", 4), ("sa4", 4), ("up2", 2), ("sa5", 2), ("up3", 1), ("sa6", 1),
    ("outc", 1), ("label_emb", None),
]


def model_summary(model: UNet, params=None) -> str:
    """Human-readable model report: the ``print(model)`` / per-layer shape
    table surface of the reference's Results.ipynb (cells 5-15).

    One row per top-level module: parameter count, output activation
    resolution (H=W, from the skeleton), and the parameter leaf shapes.
    ``params`` defaults to a fresh ``init_params`` (shapes only depend on
    the architecture).
    """
    if params is None:
        params = model.init_params(jax.random.key(0), batch=1)
    tree = params.get("params", params)
    s = int(model.image_size)

    lines = [
        f"UNet variant {model.variant}: {VARIANT_NAMES[model.variant]}",
        f"  in {model.c_in}ch -> out {model.c_out}ch @ {s}x{s}, "
        f"time_dim={model.time_dim}"
        + (f", base_width={model.base_width}" if model.base_width else "")
        + (f", num_classes={model.num_classes}" if model.num_classes else ""),
        "",
        f"{'module':<10} {'params':>10}  {'out res':>7}  leaf shapes",
    ]
    total = 0
    order = {name: i for i, (name, _) in enumerate(_SKELETON)}
    res = dict(_SKELETON)
    for name in sorted(tree, key=lambda n: order.get(n, len(order))):
        leaves = jax.tree.leaves(tree[name])
        n = sum(int(p.size) for p in leaves)
        total += n
        r = res.get(name)
        res_str = f"{s // r}x{s // r}" if r else "-"
        shapes = ", ".join("x".join(map(str, p.shape)) for p in leaves)
        lines.append(f"{name:<10} {n:>10,}  {res_str:>7}  {shapes}")
    lines.append(f"{'total':<10} {total:>10,}")
    return "\n".join(lines)
