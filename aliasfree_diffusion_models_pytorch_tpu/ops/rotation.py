"""On-device grid-wrap rotation / translation for rotation-equivariant sampling.

The reference's Config-E sampler rotates the latent by ``theta/noise_steps``
degrees after *every* denoising step via a CPU round-trip through
``scipy.ndimage.rotate(..., reshape=False, mode='grid-wrap')`` (order-3
spline) — ``modules/ddpm_models.py:375-376, 421-429``. That per-step
device→host→device hop is the reference's biggest sampling-throughput sin.

TPU-native formulation: for a *static* angle (the reference API takes theta as
a Python float, and the per-step angle is constant across the whole scan),
rotation-with-spline-interpolation is a fixed linear map of the pixels. We
build the dense ``(H*W, H*W)`` operator ONCE at trace time — by pushing the
identity basis through the exact same scipy call, so parity is exact by
linearity — and apply it inside the sampling ``lax.scan`` as a single MXU
matmul per step. No gathers, no host sync, bit-identical math.

Integer grid-wrap translation (``modules/ddpm_models.py:431-436``) is exactly
``jnp.roll`` (spline interpolation at integer offsets is the identity).
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger(__name__)

# Largest image side for the dense (H*W, H*W) operator: 64 → 64 MB fp32.
# Above this, rotation switches to the order-1 gather formulation
# (:func:`rotation_gather_plan`) — O(H²) memory instead of O(H⁴).
_MAX_DENSE_OPERATOR_SIZE = 64


class GatherRotation(NamedTuple):
    """Order-1 grid-wrap rotation as 4 static gathers + a weighted sum.

    ``idx``: (4, H·W) int32 flat source indices of the bilinear corners;
    ``w``:   (4, H·W) float32 bilinear weights. A pytree, so it flows as a
    traced operand through the jitted sampling scan exactly like the dense
    operator does — a θ-sweep still reuses one compiled executable.
    """

    idx: np.ndarray | jax.Array
    w: np.ndarray | jax.Array


@functools.lru_cache(maxsize=32)
def rotation_gather_plan(size: int, degrees: float) -> GatherRotation:
    """Bilinear (order-1) grid-wrap rotation plan for any image size.

    Reproduces ``scipy.ndimage.rotate(img, degrees, reshape=False,
    mode='grid-wrap', order=1)`` (``modules/ddpm_models.py:421-429``): the
    output grid is pulled back through the inverse rotation about the image
    center ``(size-1)/2`` (scipy's convention), source coordinates wrap
    modulo ``size``, and each output pixel blends its 4 neighbors. Memory
    scales as H² (vs the dense operator's H⁴), so 128, 256, 512... all work;
    the price is order-1 interpolation instead of the dense path's exact
    order-3 spline (parity-tested vs scipy order-1 at 128x128).
    """
    theta = np.deg2rad(degrees)
    c = (size - 1) / 2.0
    yy, xx = np.meshgrid(
        np.arange(size, dtype=np.float64),
        np.arange(size, dtype=np.float64),
        indexing="ij",
    )
    # scipy.ndimage.rotate: input_coord = M @ (output_coord - c) + c with
    # M = [[cos, sin], [-sin, cos]] over the (rows, cols) plane.
    oy, ox = yy - c, xx - c
    sy = np.cos(theta) * oy + np.sin(theta) * ox + c
    sx = -np.sin(theta) * oy + np.cos(theta) * ox + c
    y0, x0 = np.floor(sy), np.floor(sx)
    wy, wx = sy - y0, sx - x0

    def flat(yi, xi):
        return ((yi % size) * size + (xi % size)).astype(np.int32).ravel()

    idx = np.stack([
        flat(y0, x0), flat(y0, x0 + 1), flat(y0 + 1, x0), flat(y0 + 1, x0 + 1)
    ])
    w = np.stack([
        ((1 - wy) * (1 - wx)).ravel(), ((1 - wy) * wx).ravel(),
        (wy * (1 - wx)).ravel(), (wy * wx).ravel(),
    ]).astype(np.float32)
    return GatherRotation(idx=idx, w=w)


def build_rotation(size: int, degrees: float, order: int = 3):
    """Per-step rotation operand for the sampling scan: dense MXU operator
    (exact scipy parity at the requested spline order) up to 64px, order-1
    gather plan above (the dense form is O(H⁴) — see rotation_operator)."""
    if size <= _MAX_DENSE_OPERATOR_SIZE:
        return jnp.asarray(rotation_operator(size, float(degrees), order))
    if order != 1:
        logger.info(
            "rotation at %dx%d uses the order-1 gather path (dense order-%d "
            "operator would be %.1f GiB)", size, size, order, size**4 * 4 / 2**30,
        )
    plan = rotation_gather_plan(size, float(degrees))
    return GatherRotation(idx=jnp.asarray(plan.idx), w=jnp.asarray(plan.w))


@functools.lru_cache(maxsize=32)
def rotation_operator(size: int, degrees: float, order: int = 3) -> np.ndarray:
    """Dense (size², size²) pixel-space rotation operator.

    ``out_flat = M @ in_flat`` reproduces
    ``scipy.ndimage.rotate(img, degrees, reshape=False, mode='grid-wrap',
    order=order)`` exactly (rotation is linear in the input, so pushing the
    identity basis through scipy characterizes it completely).

    Built once per (size, degrees, order) and cached; at 32x32 the operator
    is 1024x1024 (4 MB fp32) — ideal MXU shape.

    The dense formulation scales as size⁴ in memory and size² scipy calls to
    build: fine through 64x64 (16M fp32 = 64 MB, the largest reference
    resolution family), unusable at e.g. 256x256 (17 GB). Guarded by an
    explicit error rather than an OOM/hours-long hang.
    """
    if size > _MAX_DENSE_OPERATOR_SIZE:
        raise ValueError(
            f"rotation_operator: dense (H²,H²) formulation is limited to "
            f"{_MAX_DENSE_OPERATOR_SIZE}x{_MAX_DENSE_OPERATOR_SIZE} images "
            f"(got {size}x{size} → a {size*size}x{size*size} matrix, "
            f"{size**4 * 4 / 2**30:.1f} GiB). Downsample first or use an "
            "order-1 gather-based rotation for large images."
        )
    from scipy import ndimage

    basis = np.eye(size * size, dtype=np.float64).reshape(size * size, size, size)
    rotated = ndimage.rotate(
        basis, angle=degrees, axes=(1, 2), reshape=False, mode="grid-wrap", order=order
    )
    # Column k of M is the response to basis image k.
    return np.ascontiguousarray(
        rotated.reshape(size * size, size * size).T
    ).astype(np.float32)


def apply_pixel_operator(
    x: jax.Array, m: jax.Array, *, precision=lax.Precision.HIGHEST
) -> jax.Array:
    """Apply a (H·W, H·W) pixel-space linear operator to an NHWC batch.

    The building block for rotation/translation inside jitted samplers: the
    operator is a *traced* argument, so a θ-sweep reuses one compiled
    executable and just feeds different matrices. ``m`` is either the dense
    (H·W, H·W) matrix (≤64px, one MXU matmul) or a :class:`GatherRotation`
    plan (large images, 4 static gathers + weighted sum); the pytree
    structure is static under jit, so the dispatch costs nothing.
    """
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    if isinstance(m, GatherRotation):
        corners = jnp.take(flat, m.idx, axis=1)  # (n, 4, H·W, c)
        out = jnp.sum(corners * m.w.astype(x.dtype)[None, :, :, None], axis=1)
    else:
        out = jnp.einsum("pq,nqc->npc", m.astype(x.dtype), flat,
                         precision=precision)
    return out.reshape(n, h, w, c)


def rotate_nhwc(
    x: jax.Array,
    degrees: float,
    order: int = 3,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Rotate each (H, W) plane of an NHWC batch by a static angle, on device.

    Drop-in equivalent of the reference ``rotate_2d_matrix``
    (``modules/ddpm_models.py:421-429``) without the CPU round-trip. Any
    image size: ≤64px applies the exact dense spline operator on the MXU,
    larger images the order-1 gather plan (see :func:`build_rotation`).
    """
    n, h, w, c = x.shape
    if h != w:
        raise ValueError(f"rotation requires square images, got {h}x{w}")
    return apply_pixel_operator(
        x, build_rotation(h, float(degrees), order), precision=precision
    )


@functools.lru_cache(maxsize=64)
def shift_operator_1d(size: int, offset: float, order: int = 3) -> np.ndarray:
    """Dense (size, size) 1D grid-wrap sub-pixel shift operator.

    Built by pushing the identity basis through ``scipy.ndimage.shift`` —
    exact parity by linearity, same technique as :func:`rotation_operator`.
    Separable: a 2D shift is the composition of two 1D operators.
    """
    from scipy import ndimage

    basis = np.eye(size, dtype=np.float64)
    shifted = ndimage.shift(basis, (0.0, offset), mode="grid-wrap", order=order)
    return np.ascontiguousarray(shifted.T).astype(np.float32)


def shift_nhwc(
    x: jax.Array,
    hshift: float,
    vshift: float = 0,
    order: int = 3,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Grid-wrap translation of each (H, W) plane by a static offset.

    Integer offsets are a circular roll (spline interpolation at grid points
    is the identity — exactly the reference's ``shift_2d_matrix``,
    ``modules/ddpm_models.py:431-436``). Fractional offsets — the natural
    completion of the reference's "under development" translation sampler —
    apply exact scipy-parity spline operators per axis on the MXU.
    """
    if float(hshift).is_integer() and float(vshift).is_integer():
        return jnp.roll(x, shift=(int(vshift), int(hshift)), axis=(1, 2))
    _, h, w, _ = x.shape
    out = x
    if vshift:
        mv = jnp.asarray(shift_operator_1d(h, float(vshift), order), x.dtype)
        out = jnp.einsum("ph,nhwc->npwc", mv, out, precision=precision)
    if hshift:
        mh = jnp.asarray(shift_operator_1d(w, float(hshift), order), x.dtype)
        out = jnp.einsum("qw,nhwc->nhqc", mh, out, precision=precision)
    return out
