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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Largest image side for the dense (H*W, H*W) operator: 64 → 64 MB fp32.
_MAX_DENSE_OPERATOR_SIZE = 64


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
    executable and just feeds different matrices.
    """
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    out = jnp.einsum("pq,nqc->npc", m.astype(x.dtype), flat, precision=precision)
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
    (``modules/ddpm_models.py:421-429``) without the CPU round-trip.
    """
    n, h, w, c = x.shape
    if h != w:
        raise ValueError(f"rotation requires square images, got {h}x{w}")
    m = jnp.asarray(rotation_operator(h, float(degrees), order), x.dtype)
    flat = x.reshape(n, h * w, c)
    out = jnp.einsum("pq,nqc->npc", m, flat, precision=precision)
    return out.reshape(n, h, w, c)


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
