"""Fused Pallas TPU kernels for the alias-free hot path.

The Config-C/D filtered nonlinearity (2x alias-free upsample → GELU → 2x
alias-free downsample, ``modules/ddpm_utils.py:118-142``) is the hottest
non-matmul op in the network: the XLA path materializes a ``(N, 2H, 2W, C)``
intermediate between three ops — 4x the activation footprint in HBM traffic.

``fused_filtered_gelu`` computes the whole sandwich in one VMEM-resident
kernel using a **polyphase decomposition**: the zero-stuffed upsample conv is
evaluated per output parity phase directly from ``x`` (never building the
stuffed tensor — 3/4 of its samples are zeros), GELU is applied per phase,
and the decimating down-conv reads the phases back with ±1 shifts. Everything
is unrolled at trace time into ~25 VPU multiply-adds over (H, W, C) tiles;
HBM sees exactly one read of ``x`` and one write of the output.

Derivation (odd k, p = k//2, cross-correlation, zero 'same' padding):
  up-phase  y[2i+a, 2j+b] = Σ_{dy≡p-a (2), dx≡p-b (2)} h[dy,dx] ·
                              x[i+(a+dy-p)/2, j+(b+dx-p)/2]
  down      z[i, j]       = Σ_{dy,dx} g[dy,dx] · y_phase(a',b')[i+r, j+s]
            with a'=(dy-p) mod 2, r=(dy-p-a')/2 (same for columns).

Gradients: ``custom_vjp`` whose backward is the JAX-derived VJP of the
identical XLA composition (numerically equivalent; fused backward kernel is
future work). Non-TPU backends and even kernel sizes fall back to the XLA
path transparently.

Parity: validated against the XLA ops (and hence against the torch oracle)
in ``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
    downsample2x,
    phase_terms as _phase_terms,
    upsample2x,
)


def _lax_filtered_gelu(x, up_taps, down_taps):
    x = upsample2x(x, up_taps)
    x = jax.nn.gelu(x, approximate=False)
    return downsample2x(x, down_taps)


def _shift2d(x_pad, m: int, r: int, s: int, h: int, w: int):
    """Read a (h, w, C) window at offset (r, s) from an array padded by m."""
    return jax.lax.slice(
        x_pad, (m + r, m + s, 0), (m + r + h, m + s + w, x_pad.shape[-1])
    )


def _make_kernel(k: int, up_taps: tuple, down_taps: tuple, h: int, w: int):
    up_plan, down_plan = _phase_terms(k)
    # Plain Python floats stay weakly typed — multiplying a bf16 array by a
    # np.float32 scalar would silently promote everything to f32.
    hu = [[float(v) for v in row] for row in np.asarray(up_taps).reshape(k, k)]
    hd = [[float(v) for v in row] for row in np.asarray(down_taps).reshape(k, k)]
    m = max(k // 2, 1)  # max |shift| in either plan is <= k//2

    def _exact_gelu(v):
        # gelu(x) = x/2 * (1 + erf(x/sqrt(2))). Mosaic implements neither erf
        # nor erfc, so erf is evaluated with the Abramowitz-Stegun 7.1.26
        # rational approximation (max abs error 1.5e-7 — below fp32 noise for
        # this op, and far below bf16 resolution). Only exp is required.
        vf = v.astype(jnp.float32)
        z = vf * np.float32(1.0 / np.sqrt(2.0))
        s = jnp.sign(z)
        a = jnp.abs(z)
        t = 1.0 / (1.0 + np.float32(0.3275911) * a)
        poly = t * (
            np.float32(0.254829592)
            + t * (np.float32(-0.284496736)
                   + t * (np.float32(1.421413741)
                          + t * (np.float32(-1.453152027)
                                 + t * np.float32(1.061405429))))
        )
        erf = s * (1.0 - poly * jnp.exp(-a * a))
        out = vf * 0.5 * (1.0 + erf)
        return out.astype(v.dtype)

    def kernel(x_ref, out_ref):
        x = x_ref[0]  # (h, w, C)
        c = x.shape[-1]
        zero_h = jnp.zeros((m, w + 2 * m, c), x.dtype)
        zero_w = jnp.zeros((h, m, c), x.dtype)
        x_pad = jnp.concatenate([zero_w, x, zero_w], axis=1)
        x_pad = jnp.concatenate([zero_h, x_pad, zero_h], axis=0)

        # Upsample phases + exact GELU, each (h, w, C).
        phases = {}
        for (a, b), terms in up_plan.items():
            acc = jnp.zeros((h, w, c), x.dtype)
            for dy, dx, r, s in terms:
                acc = acc + hu[dy][dx] * _shift2d(x_pad, m, r, s, h, w)
            phases[(a, b)] = _exact_gelu(acc)

        # Pad each phase once for the down conv's ±shifts.
        ppad = {}
        for key, ph in phases.items():
            pp = jnp.concatenate([zero_w, ph, zero_w], axis=1)
            ppad[key] = jnp.concatenate([zero_h, pp, zero_h], axis=0)

        out = jnp.zeros((h, w, c), x.dtype)
        for dy, dx, a, b, r, s in down_plan:
            out = out + hd[dy][dx] * _shift2d(ppad[(a, b)], m, r, s, h, w)
        out_ref[0] = out.astype(x.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_filtered_gelu(x: jax.Array, up_taps, down_taps) -> jax.Array:
    """Fused 2x-up → GELU → 2x-down (NHWC); Pallas on TPU, XLA elsewhere.

    ``up_taps``/``down_taps`` must be hashable static tap matrices — pass
    tuples-of-tuples (see :func:`taps_key`) or ndarray (converted here).
    """
    return _fused_forward(x, _as_key(up_taps), _as_key(down_taps))


def _as_key(taps):
    if isinstance(taps, tuple):
        return taps
    t = np.asarray(taps)
    return tuple(tuple(float(v) for v in row) for row in t)


taps_key = _as_key


def _fused_forward(x, up_key, down_key):
    k = len(up_key)
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    use_pallas = (backend not in ("cpu",)) and k % 2 == 1 and x.ndim == 4
    if not use_pallas:
        return _lax_filtered_gelu(x, np.asarray(up_key), np.asarray(down_key))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    kernel = _make_kernel(k, up_key, down_key, h, w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def _exact_gelu_np_pair(v):
    """(gelu(v), gelu'(v)) — reference math for the kernels.

    g(v) = v·Φ(v);  g'(v) = Φ(v) + v·φ(v), Φ the std normal CDF.
    """
    from scipy.special import erf

    phi_cdf = 0.5 * (1.0 + erf(v / np.sqrt(2.0)))
    pdf = np.exp(-0.5 * v * v) / np.sqrt(2.0 * np.pi)
    return v * phi_cdf, phi_cdf + v * pdf


def _make_bwd_kernel(k: int, up_taps: tuple, down_taps: tuple, h: int, w: int):
    """Fused backward: (x, z̄) → x̄ in one VMEM-resident kernel.

    With z = D(g(U x)) (D = filter+decimate, U = stuff+filter, g = GELU):
        ā = Dᵀ z̄      (transposed decimating conv — per-phase negative shifts)
        ȳ = g'(U x)⊙ā  (phases of U x recomputed in-kernel, cheap)
        x̄ = Uᵀ ȳ      (transposed stuffing conv — phase gather, negative shifts)
    The zero-'same'-padded forward makes the adjoint exactly a zero-padded
    negative shift (transpose of pad = crop). Validated against ``jax.vjp`` of
    the XLA composition in ``tests/test_pallas.py``.
    """
    up_plan, down_plan = _phase_terms(k)
    hu = [[float(v) for v in row] for row in np.asarray(up_taps).reshape(k, k)]
    hd = [[float(v) for v in row] for row in np.asarray(down_taps).reshape(k, k)]
    m = max(k // 2 + 1, 1)  # transposed shifts can reach k//2 + phase carry

    inv_sqrt2 = float(1.0 / np.sqrt(2.0))
    inv_sqrt2pi = float(1.0 / np.sqrt(2.0 * np.pi))

    def gelu_and_grad(v):
        vf = v.astype(jnp.float32)
        z = vf * inv_sqrt2
        s = jnp.sign(z)
        a = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * a)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                     + t * (-1.453152027 + t * 1.061405429))))
        erf = s * (1.0 - poly * jnp.exp(-a * a))
        cdf = 0.5 * (1.0 + erf)
        pdf = jnp.exp(-0.5 * vf * vf) * inv_sqrt2pi
        return (cdf + vf * pdf).astype(v.dtype)

    def kernel(x_ref, g_ref, out_ref):
        x = x_ref[0]
        gbar = g_ref[0]
        c = x.shape[-1]
        zero_h = jnp.zeros((m, w + 2 * m, c), x.dtype)
        zero_w = jnp.zeros((h, m, c), x.dtype)

        def pad(a):
            ap = jnp.concatenate([zero_w, a, zero_w], axis=1)
            return jnp.concatenate([zero_h, ap, zero_h], axis=0)

        x_pad = pad(x)
        g_pad = pad(gbar)

        # Recompute pre-GELU phases y_ab and their derivative g'(y_ab);
        # simultaneously compute ā_ab = Σ_{dy,dx→(a,b)} hd[dy,dx]·z̄[·-shift].
        abar = { (a, b): None for a in (0, 1) for b in (0, 1) }
        for dy, dx, a, b, r, s in down_plan:
            term = hd[dy][dx] * _shift2d(g_pad, m, -r, -s, h, w)
            abar[(a, b)] = term if abar[(a, b)] is None else abar[(a, b)] + term

        ybar = {}
        for (a, b), terms in up_plan.items():
            acc = None
            for dy, dx, r, s in terms:
                t_ = hu[dy][dx] * _shift2d(x_pad, m, r, s, h, w)
                acc = t_ if acc is None else acc + t_
            y_ab = acc if acc is not None else jnp.zeros((h, w, x.shape[-1]), x.dtype)
            ab = abar[(a, b)]
            if ab is None:
                ab = jnp.zeros_like(y_ab)
            ybar[(a, b)] = gelu_and_grad(y_ab) * ab

        # x̄ = Uᵀ ȳ: scatter each phase's taps back with negated shifts.
        ypad = {key: pad(v) for key, v in ybar.items()}
        out = None
        for (a, b), terms in up_plan.items():
            for dy, dx, r, s in terms:
                term = hu[dy][dx] * _shift2d(ypad[(a, b)], m, -r, -s, h, w)
                out = term if out is None else out + term
        out_ref[0] = out.astype(x.dtype)

    return kernel


def _fused_fwd(x, up_taps, down_taps):
    return fused_filtered_gelu(x, up_taps, down_taps), x


def _fused_bwd(up_taps, down_taps, x, g):
    up_key, down_key = _as_key(up_taps), _as_key(down_taps)
    k = len(up_key)
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend in ("cpu",) or k % 2 == 0 or x.ndim != 4:
        # JAX-derived VJP of the identical XLA composition.
        up = np.asarray(up_key, np.float32)
        down = np.asarray(down_key, np.float32)
        _, vjp = jax.vjp(lambda xx: _lax_filtered_gelu(xx, up, down), x)
        return (vjp(g.astype(x.dtype))[0],)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    kernel = _make_bwd_kernel(k, up_key, down_key, h, w)
    xbar = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, g.astype(x.dtype))
    return (xbar,)


fused_filtered_gelu.defvjp(_fused_fwd, _fused_bwd)
