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
# Above this, rotation switches to the gather formulation at the SAME spline
# order (:func:`rotation_gather_plan`: separable grid-wrap prefilter + an
# (order+1)²-tap B-spline gather) — O(H²) memory instead of O(H⁴).
_MAX_DENSE_OPERATOR_SIZE = 64


class GatherRotation(NamedTuple):
    """Grid-wrap spline rotation as (order+1)² static gathers + weighted sum.

    ``idx``: (T, H·W) int32 flat source indices of the spline taps (T = 4 for
    order 1, 16 for order 3, generally (order+1)²);
    ``w``:   (T, H·W) float32 B-spline tap weights;
    ``pre``: optional (H, H) separable spline-prefilter operator (orders ≥ 2;
    pushed through ``scipy.ndimage.spline_filter1d`` so it is exactly scipy's
    periodic prefilter), applied to both axes before the gather. A pytree, so
    it flows as a traced operand through the jitted sampling scan exactly like
    the dense operator does — a θ-sweep still reuses one compiled executable.
    """

    idx: np.ndarray | jax.Array
    w: np.ndarray | jax.Array
    pre: np.ndarray | jax.Array | None = None


@functools.lru_cache(maxsize=8)
def spline_prefilter_operator(size: int, order: int = 3) -> np.ndarray:
    """Dense (size, size) grid-wrap spline-prefilter operator.

    B-spline interpolation of order ≥ 2 first converts samples to spline
    coefficients (``scipy.ndimage.spline_filter``). With periodic boundaries
    that filter is a *linear* map, so pushing the identity basis through
    ``spline_filter1d(mode='grid-wrap')`` characterizes it exactly — the same
    identity-basis technique as :func:`rotation_operator`. The 2D prefilter is
    separable: ``coeffs = P @ img @ P.T``.
    """
    from scipy import ndimage

    return ndimage.spline_filter1d(
        np.eye(size, dtype=np.float64), order=order, axis=0, mode="grid-wrap"
    ).astype(np.float32)


def _bspline_weights(frac_to_taps: np.ndarray, order: int) -> np.ndarray:
    """Centered cardinal B-spline of degree ``order`` evaluated elementwise.

    Matches scipy's ``get_spline_interpolation_weights`` (ni_splines.c):
    order 1 is the linear hat, order 3 the cubic B-spline. Orders 0/2/4/5 go
    through ``scipy.interpolate.BSpline.basis_element`` on integer knots.
    """
    t = np.abs(frac_to_taps)
    if order == 1:
        return np.maximum(0.0, 1.0 - t)
    if order == 3:
        return np.where(
            t < 1, 2 / 3 - t * t + t**3 / 2,
            np.where(t < 2, (2 - t) ** 3 / 6, 0.0),
        )
    from scipy.interpolate import BSpline

    half = (order + 1) / 2.0
    basis = BSpline.basis_element(np.arange(order + 2) - half, extrapolate=False)
    return np.nan_to_num(basis(frac_to_taps), nan=0.0)


@functools.lru_cache(maxsize=32)
def rotation_gather_plan(size: int, degrees: float, order: int = 1) -> GatherRotation:
    """Grid-wrap spline rotation plan for any image size and spline order.

    Reproduces ``scipy.ndimage.rotate(img, degrees, reshape=False,
    mode='grid-wrap', order=order)`` (``modules/ddpm_models.py:421-429``): the
    output grid is pulled back through the inverse rotation about the image
    center ``(size-1)/2`` (scipy's convention), source coordinates wrap modulo
    ``size``, and each output pixel blends its (order+1)² spline taps; orders
    ≥ 2 additionally carry the exact separable grid-wrap prefilter
    (:func:`spline_prefilter_operator`). Memory scales as (order+1)²·H² — vs
    the dense operator's H⁴ — so 128, 256, 512... all work at order 3
    (parity-tested vs scipy at 128x128, atol ~1e-5).
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
    # First tap per scipy ni_splines.c: floor(x) - order//2 (odd orders),
    # floor(x + 0.5) - order//2 (even orders). order+1 taps per axis.
    if order % 2:
        y0 = np.floor(sy).astype(np.int64) - order // 2
        x0 = np.floor(sx).astype(np.int64) - order // 2
    else:
        y0 = np.floor(sy + 0.5).astype(np.int64) - order // 2
        x0 = np.floor(sx + 0.5).astype(np.int64) - order // 2

    taps = order + 1
    idx_rows, w_rows = [], []
    for ky in range(taps):
        wy = _bspline_weights(sy - (y0 + ky), order)
        for kx in range(taps):
            wx = _bspline_weights(sx - (x0 + kx), order)
            idx_rows.append(
                (((y0 + ky) % size) * size + ((x0 + kx) % size))
                .astype(np.int32).ravel()
            )
            w_rows.append((wy * wx).ravel())
    pre = spline_prefilter_operator(size, order) if order >= 2 else None
    return GatherRotation(
        idx=np.stack(idx_rows), w=np.stack(w_rows).astype(np.float32), pre=pre
    )


def build_rotation(size: int, degrees: float, order: int = 3):
    """Per-step rotation operand for the sampling scan: dense MXU operator up
    to 64px, (order+1)²-tap gather plan (+ separable prefilter for order ≥ 2)
    above — both exact scipy parity at the requested spline order (the dense
    form is O(H⁴) — see rotation_operator)."""
    if size <= _MAX_DENSE_OPERATOR_SIZE:
        return jnp.asarray(rotation_operator(size, float(degrees), order))
    plan = rotation_gather_plan(size, float(degrees), order)
    return GatherRotation(
        idx=jnp.asarray(plan.idx), w=jnp.asarray(plan.w),
        pre=None if plan.pre is None else jnp.asarray(plan.pre),
    )


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
    plan (large images: optional separable spline prefilter — two MXU
    matmuls — then (order+1)² static gathers + weighted sum); the pytree
    structure is static under jit, so the dispatch costs nothing.
    """
    n, h, w, c = x.shape
    if isinstance(m, GatherRotation):
        if m.pre is not None:
            pre = m.pre.astype(x.dtype)
            x = jnp.einsum("ph,nhwc->npwc", pre, x, precision=precision)
            x = jnp.einsum("qw,npwc->npqc", pre, x, precision=precision)
        flat = x.reshape(n, h * w, c)
        corners = jnp.take(flat, m.idx, axis=1)  # (n, T, H·W, c)
        out = jnp.sum(corners * m.w.astype(x.dtype)[None, :, :, None], axis=1)
    else:
        out = jnp.einsum("pq,nqc->npc", m.astype(x.dtype), x.reshape(n, h * w, c),
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
    image size at any spline order: ≤64px applies the exact dense spline
    operator on the MXU, larger images the same-order gather plan
    (prefilter + B-spline taps; see :func:`build_rotation`).
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
