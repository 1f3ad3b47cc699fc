"""Alias-free resampling ops (XLA path).

TPU-native rebuild of the reference's resampling primitives
(``modules/filtrs.py:71-94``). Design differences from the reference:

* **NHWC layout** throughout (TPU-native; channels on the lane dimension).
  The reference is NCHW torch.
* **Fused ops**: the reference runs a stride-1 depthwise conv then a separate
  strided slice for downsampling, and materializes a zero-stuffed tensor then
  convolves for upsampling. Here each is a *single*
  ``lax.conv_general_dilated`` (window strides for down, ``lhs_dilation`` for
  up — the classic upfirdn formulation), so XLA never materializes the
  intermediate.
* Filter taps arrive as NumPy design-time constants (see ``ops/filters.py``)
  and are baked into the jitted graph.

⚠ Parity trap preserved: the reference's ``custom_upsample``
(``modules/filtrs.py:79-94``) does **not** apply the ``factor**2`` gain
compensation of StyleGAN3 — with sum-1 taps and 3/4 zero samples the output
DC is attenuated ~4x; the trained weights compensate. ``gain`` defaults to
1.0 to match; pass ``gain=factor**2`` for the textbook behavior.

Fused-Pallas post-mortem (rounds 2-3): two generations of a hand-fused
filtered-GELU Pallas kernel were built, measured, and deleted.

* Round 2 put channels on the lane axis and padded tap shifts with in-kernel
  zero-concats: at C=32 only a quarter of each lane tile was useful and the
  concats serialized the VPU — full v3 step 83.7 ms vs 57.4 ms XLA.
* Round 3 reworked it structurally: batch on the lane axis (relayout-free at
  the XLA batch-minor activation layouts, full lane tiles at any C), all tap
  shifts as address offsets along the untiled H/W dims, rolling H-strips with
  manual-DMA halos, a hand-derived fused backward, exact-erf GELU via the
  A&S 7.1.26 rational approximation. It won the forward at the deep shapes
  (256ch@8/4: 1.1-1.2 ms vs 1.5-1.8 ms XLA) but lost fwd+bwd at the shallow
  ones that dominate the graph (32ch@32: 3.9 vs 1.6 ms; VMEM stack overflow
  at batch 256 forced small strips) — full v3 step 56.0 ms vs 36.6 ms.

Both losses trace to the same structural squeeze: the sandwich's working set
(input strip + 4 phase planes + halos, f32 accumulators) exceeds what fits
in the ~16 MB scoped-VMEM budget at batch 256, so the kernel is forced into
small strips whose fixed per-program cost (DMA setup, pipeline drain)
swamps the HBM traffic it saves, while XLA's fused elementwise loops run at
its preferred batch-minor layouts with mature pipelining. The winning
formulation IS the polyphase math, kept here as
:func:`filtered_gelu_phases`; its derivation follows in :func:`phase_terms`.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "same_pad",
    "depthwise_fir",
    "downsample2x",
    "upsample2x",
    "filtered_gelu",
    "gelu_exact",
    "filtered_gelu_phases",
    "phase_terms",
    "maxpool2x",
    "upsample_bilinear_align_corners",
    "resize_matrix_1d",
]


def same_pad(k: int) -> tuple[int, int]:
    """(lo, hi) spatial padding reproducing torch ``F.conv2d(padding='same')``.

    For stride-1 convs torch pads ``(k-1)//2`` low / ``k//2`` high
    (extra tap on the high side for even kernels). Verified against torch CPU
    in ``tests/test_resample.py``.
    """
    return ((k - 1) // 2, k // 2)


def _conv_kernel(taps, channels: int, dtype) -> jnp.ndarray:
    """Shared-tap depthwise kernel in HWIO layout: (kh, kw, 1, C)."""
    t = jnp.asarray(np.asarray(taps), dtype=dtype)
    kh, kw = t.shape
    return jnp.broadcast_to(t[:, :, None, None], (kh, kw, 1, channels))


_DN = ("NHWC", "HWIO", "NHWC")


def depthwise_fir(
    x: jax.Array,
    taps,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """SAME depthwise FIR: every channel convolved with the same 2D taps.

    Equivalent to the conv step of ``custom_downsample``
    (``modules/filtrs.py:73-75``) without the decimation.
    """
    c = x.shape[-1]
    kh, kw = np.asarray(taps).shape
    return lax.conv_general_dilated(
        x,
        _conv_kernel(taps, c, x.dtype),
        window_strides=(1, 1),
        padding=(same_pad(kh), same_pad(kw)),
        dimension_numbers=_DN,
        feature_group_count=c,
        precision=precision,
    )


def _auto_impl() -> str:
    """Resampling implementation choice: 'conv' (grouped conv) vs 'shifts'
    (strided slice+FMA). Overridable with AFDM_RESAMPLE_IMPL. Default is
    'conv' on every backend — measured on TPU v5e (benchmarks/sweep.py,
    batch 256, variant 3): conv 57.4 ms/step vs shifts 100.5 ms/step; XLA's
    grouped-conv lowering beats the hand-written slice+FMA chain."""
    import os

    env = os.environ.get("AFDM_RESAMPLE_IMPL")
    if env in ("conv", "shifts"):
        return env
    return "conv"


def downsample2x(
    x: jax.Array,
    taps,
    factor: int = 2,
    *,
    precision=lax.Precision.HIGHEST,
    impl: str = "auto",
) -> jax.Array:
    """Alias-free downsample: depthwise low-pass FIR + decimate, fused.

    Matches ``custom_downsample`` (``modules/filtrs.py:71-77``): SAME conv
    then ``x[:, :, ::factor, ::factor]``. Because SAME-conv-then-decimate
    keeps exactly the conv outputs at positions ``0, factor, 2*factor, ...``,
    it equals one strided conv with the same padding — a single XLA op
    (``impl='conv'``) or k² fused strided FMAs (``impl='shifts'``).
    """
    c = x.shape[-1]
    kh, kw = np.asarray(taps).shape
    if impl == "auto":
        impl = _auto_impl()
    if impl == "shifts" and kh == kw and kh % 2 == 1:
        return downsample2x_shifts(x, taps, factor)
    return lax.conv_general_dilated(
        x,
        _conv_kernel(taps, c, x.dtype),
        window_strides=(factor, factor),
        padding=(same_pad(kh), same_pad(kw)),
        dimension_numbers=_DN,
        feature_group_count=c,
        precision=precision,
    )


def upsample2x(
    x: jax.Array,
    taps,
    factor: int = 2,
    gain: float = 1.0,
    *,
    precision=lax.Precision.HIGHEST,
    impl: str = "auto",
) -> jax.Array:
    """Alias-free upsample: zero-stuff by ``factor`` + depthwise FIR, fused.

    Matches ``custom_upsample`` (``modules/filtrs.py:79-94``): allocate
    ``(N, H*f, W*f, C)`` zeros, scatter ``x`` at ``::f`` positions, SAME conv.
    Implemented as one ``lhs_dilation=factor`` conv; the dilated operand has
    length ``H*f - (f-1)``, so the zero-stuffed tensor's trailing ``f-1``
    zero rows/cols are folded into the high-side padding.

    ``gain=1.0`` preserves the reference's un-compensated energy
    (the ⚠ parity trap in the module docstring).
    """
    c = x.shape[-1]
    t = np.asarray(taps)
    if gain != 1.0:
        t = t * float(gain)
    kh, kw = t.shape
    if impl == "auto":
        impl = _auto_impl()
    if impl == "shifts" and kh == kw and kh % 2 == 1 and factor == 2:
        return upsample2x_shifts(x, t, factor)
    (hlo, hhi), (wlo, whi) = same_pad(kh), same_pad(kw)
    return lax.conv_general_dilated(
        x,
        _conv_kernel(t, c, x.dtype),
        window_strides=(1, 1),
        padding=((hlo, hhi + factor - 1), (wlo, whi + factor - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=_DN,
        feature_group_count=c,
        precision=precision,
    )


def _fg_auto_impl(precision) -> str:
    """filtered_gelu implementation: 'phases' (polyphase elementwise, the
    measured perf default) vs 'conv' (two grouped convs). The phases path is
    numerically equivalent but sums taps in a different order, so the
    torch-parity mode (precision=HIGHEST) keeps the conv formulation its
    oracles were validated against. AFDM_FG_IMPL overrides."""
    import os

    env = os.environ.get("AFDM_FG_IMPL")
    if env in ("conv", "phases"):
        return env
    return "phases" if precision is None else "conv"


def filtered_gelu(
    x: jax.Array,
    up_taps,
    down_taps,
    factor: int = 2,
    *,
    precision=lax.Precision.HIGHEST,
    impl: str = "auto",
) -> jax.Array:
    """Filtered nonlinearity: 2x alias-free up → exact GELU → 2x down.

    The Config-C/D primitive, applied around every GELU of the filtered
    blocks (``modules/ddpm_utils.py:118-142``). ``jax.nn.gelu`` defaults to
    the tanh approximation; torch ``nn.GELU()`` is the exact erf form, so we
    pass ``approximate=False``.

    Two numerically identical implementations (see ``AFDM_FG_IMPL``):

    * ``'conv'``   — ``upsample2x → gelu → downsample2x`` as two depthwise
      grouped convs around the GELU; the 2x-size intermediate hits HBM.
    * ``'phases'`` — the polyphase elementwise formulation
      (:func:`filtered_gelu_phases`): no depthwise-conv lowering, no 2x
      tensor, everything fuses into one VPU loop over the original grid.
    """
    k = int(np.asarray(up_taps).shape[0])
    if impl == "auto":
        impl = _fg_auto_impl(precision)
    if impl == "phases" and factor == 2 and k % 2 == 1 and x.ndim == 4:
        return filtered_gelu_phases(x, up_taps, down_taps)
    x = upsample2x(x, up_taps, factor, precision=precision)
    x = jax.nn.gelu(x, approximate=False)
    return downsample2x(x, down_taps, factor, precision=precision)


def phase_terms(k: int):
    """Static polyphase index plans for factor-2 up and down FIR convs.

    ``up[(a, b)]`` lists ``(dy, dx, row_shift, col_shift)`` terms building the
    output-parity-(a, b) plane of the zero-stuffed upsample conv directly from
    the low-res grid; ``down`` lists ``(dy, dx, phase_a, phase_b, row_shift,
    col_shift)`` mapping each decimating-conv tap onto a constant-offset read
    of a phase plane.

    Derivation (odd k, p = k//2, cross-correlation, zero 'same' padding):

      up-phase  y[2i+a, 2j+b] = Σ_{dy≡p-a (2), dx≡p-b (2)} h[dy,dx] ·
                                  x[i+(a+dy-p)/2, j+(b+dx-p)/2]
      down      z[i, j]       = Σ_{dy,dx} g[dy,dx] · y_phase(a',b')[i+r, j+s]
                with a'=(dy-p) mod 2, r=(dy-p-a')/2 (same for columns).

    Validated against the conv formulation (and the torch oracle) and against
    direct zero-stuff/conv/decimate evaluation in pure numpy in
    ``tests/test_resample.py``.
    """
    p = k // 2
    up = {}
    for a in (0, 1):
        for b in (0, 1):
            terms = []
            for dy in range(k):
                if (a + dy - p) % 2:
                    continue
                for dx in range(k):
                    if (b + dx - p) % 2:
                        continue
                    terms.append((dy, dx, (a + dy - p) // 2, (b + dx - p) // 2))
            up[(a, b)] = terms
    down = []
    for dy in range(k):
        a = (dy - p) % 2
        r = (dy - p - a) // 2
        for dx in range(k):
            b = (dx - p) % 2
            s = (dx - p - b) // 2
            down.append((dy, dx, a, b, r, s))
    return up, down


# Minimax polynomials for gelu(x) = x·(0.5 + x_c·R(x_c²)), x_c = clip(x, ±XC):
# R(x²) ≈ 0.5·erf(x/√2)/x directly in the *x* domain, so the 1/√2 argument
# scale and the 0.5 output scale live inside the coefficients (two fewer VPU
# ops per eval than the u = x/√2 form). Endpoint constraint XC·R(XC²) = 0.5
# exactly, so the clamp tails give exact gelu(x) = x / 0. Fit jointly minimax
# in value AND derivative (IRLS; value budget 4e-4, derivative 6e-3 — the
# derivative is what training gradients see):
#   deg 15 (default): max |gelu err| 3.7e-4, max |d/dx err| 1.8e-3
#   deg 13 (AFDM_GELU=poly13): 1.4e-3 / 6.8e-3 — one Horner FMA cheaper,
#   still under bf16 rounding (~4e-3 at unit scale) in value.
_GELU_POLY_15 = (
    0.39847720532397357, -0.06533923798456039, 0.009128171697420397,
    -0.0008978316975850138, 5.914830951568466e-05, -2.454260270985954e-06,
    5.750126543924546e-08, -5.770954416805585e-10,
)
_GELU_POLY_13 = (
    0.39736903338755974, -0.06336353822103462, 0.008126449758425384,
    -0.0006760143548142659, 3.4051160496925107e-05, -9.359854638467884e-07,
    1.0721949130855751e-08,
)
_GELU_CLAMP = 3.2 * float(np.sqrt(2.0))  # |erf(x/√2)| == 1 to f32 beyond


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact-erf GELU (torch ``nn.GELU()`` / ``F.gelu`` default,
    ``modules/ddpm_utils.py:87``) with a cheap-polynomial bf16 fast path.

    f32 inputs use ``jax.nn.gelu(approximate=False)`` verbatim — the parity
    path stays bit-faithful to the erf form. bf16 inputs (the TPU perf path)
    evaluate ``_GELU_POLY_15`` in f32: ~13 VPU ops with a polynomial autodiff
    backward, replacing the much longer erf/exp expansion — its 3.7e-4
    worst-case value error (1.8e-3 derivative error) is an order below bf16
    rounding. ``AFDM_GELU=exact`` forces the erf form everywhere;
    ``AFDM_GELU=poly13`` selects the one-FMA-cheaper degree-13 fit.
    """
    mode = os.environ.get("AFDM_GELU")
    if x.dtype != jnp.bfloat16 or mode == "exact":
        return jax.nn.gelu(x, approximate=False)
    coefs = _GELU_POLY_13 if mode == "poly13" else _GELU_POLY_15
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_GELU_CLAMP, _GELU_CLAMP)
    t = xc * xc
    p = jnp.float32(coefs[-1])
    for coef in coefs[-2::-1]:
        p = p * t + jnp.float32(coef)
    return (xf * (0.5 + xc * p)).astype(x.dtype)


def filtered_gelu_phases(x: jax.Array, up_taps, down_taps) -> jax.Array:
    """Polyphase elementwise formulation of :func:`filtered_gelu` (factor 2).

    The zero-stuffed 2x upsample conv is evaluated per output-parity phase
    directly on the original ``(N, H, W, C)`` grid (3/4 of the stuffed samples
    are zeros and never exist), GELU is applied per phase, and the decimating
    down conv reads the phases back with constant offsets. The whole sandwich
    is ~2k² fused multiply-adds + 4 GELUs per output element — no depthwise
    grouped convs (a slow TPU lowering), no strided slices, no 2x-resolution
    intermediate in HBM, and the JAX-derived backward is elementwise too.

    Measured on v5e (batch 256, see ``benchmarks/breakdown.py``): beats the
    grouped-conv path on every Config-C/D shape in the UNet graph.

    Numerics: identical contraction order per tap as the conv formulation;
    exact erf GELU. Matches ``custom_upsample → GELU → custom_downsample`` of
    the reference (``modules/filtrs.py:71-94``, ``modules/ddpm_utils.py:118-142``).
    """
    tu = [[float(v) for v in row] for row in np.asarray(up_taps)]
    td = [[float(v) for v in row] for row in np.asarray(down_taps)]
    k = len(tu)
    n, h, w, c = x.shape
    m = k // 2 + 1  # covers every |shift| in both plans
    up_plan, down_plan = phase_terms(k)

    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)))

    def sh(a4, r, s):
        return lax.slice(a4, (0, m + r, m + s, 0), (n, m + r + h, m + s + w, c))

    gphase = {}
    for (a, b), terms in up_plan.items():
        acc = None
        for dy, dx, r, s in terms:
            t_ = tu[dy][dx] * sh(xp, r, s)
            acc = t_ if acc is None else acc + t_
        if acc is None:
            acc = jnp.zeros((n, h, w, c), x.dtype)
        gphase[(a, b)] = gelu_exact(acc)

    gp = {
        key: jnp.pad(v, ((0, 0), (m, m), (m, m), (0, 0)))
        for key, v in gphase.items()
    }
    out = None
    for dy, dx, a, b, r, s in down_plan:
        t_ = td[dy][dx] * sh(gp[(a, b)], r, s)
        out = t_ if out is None else out + t_
    return out


def maxpool2x(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool (NHWC) — torch ``nn.MaxPool2d(2)`` equivalent
    used by the baseline ``Down`` block (``modules/ddpm_utils.py:203``)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _taps_list(taps) -> list[list[float]]:
    t = np.asarray(taps)
    return [[float(v) for v in row] for row in t]


def downsample2x_shifts(
    x: jax.Array, taps, factor: int = 2
) -> jax.Array:
    """Shifted-add formulation of :func:`downsample2x` (odd kernels).

    Depthwise convs don't use the MXU; expressing the k x k FIR as k² strided
    slice+FMA ops lets XLA fuse the whole filter into elementwise VPU code.
    Numerically identical to the conv path (tested); selected via
    ``impl='shifts'`` where benchmarked faster.
    """
    t = _taps_list(taps)
    k = len(t)
    lo, hi = same_pad(k)
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
    out = None
    for a in range(k):
        for b in range(k):
            sl = lax.slice(
                xp, (0, a, b, 0), (n, a + h, b + w, c),
                strides=(1, factor, factor, 1),
            )
            term = t[a][b] * sl
            out = term if out is None else out + term
    return out


def upsample2x_shifts(
    x: jax.Array, taps, factor: int = 2, gain: float = 1.0
) -> jax.Array:
    """Polyphase shifted-add formulation of :func:`upsample2x` (odd k, f=2).

    Computes each of the 4 output parity phases directly from ``x`` (the
    zero-stuffed tensor never exists) and interleaves with reshapes. Same
    numerics as the conv path; no depthwise-conv lowering.
    """
    if factor != 2:
        return upsample2x(x, taps, factor, gain)
    t = _taps_list(np.asarray(taps) * float(gain))
    k = len(t)
    p = k // 2
    n, h, w, c = x.shape
    m = max(p, 1)
    xp = jnp.pad(x, ((0, 0), (m, m), (m, m), (0, 0)))

    def shift(r, s):
        return lax.slice(xp, (0, m + r, m + s, 0), (n, m + r + h, m + s + w, c))

    phases = {}
    for a in (0, 1):
        for b in (0, 1):
            acc = None
            for dy in range(k):
                if (a + dy - p) % 2:
                    continue
                for dx in range(k):
                    if (b + dx - p) % 2:
                        continue
                    term = t[dy][dx] * shift((a + dy - p) // 2, (b + dx - p) // 2)
                    acc = term if acc is None else acc + term
            phases[(a, b)] = (
                acc if acc is not None else jnp.zeros((n, h, w, c), x.dtype)
            )
    cols = []
    for b in (0, 1):
        interleaved_h = jnp.stack([phases[(0, b)], phases[(1, b)]], axis=2)
        cols.append(interleaved_h.reshape(n, 2 * h, w, c))
    y = jnp.stack(cols, axis=3).reshape(n, 2 * h, 2 * w, c)
    return y


def resize_matrix_1d(
    in_size: int,
    out_size: int,
    align_corners: bool,
    dtype=np.float32,
) -> np.ndarray:
    """Dense 1D bilinear interpolation operator, shape (out_size, in_size).

    Bilinear resampling along one axis is a fixed linear map, so we bake it
    as a trace-time constant matrix and apply it with an MXU einsum instead
    of gathers — the TPU-native formulation of both torch
    ``nn.Upsample(mode='bilinear', align_corners=True)`` (the baseline ``Up``
    block, ``modules/ddpm_utils.py:226``) and the align_corners=False
    convention of ``transforms.Resize`` used by the MNIST 28→32 pipeline
    (``modules/utils.py:67``). Built in float64, cast on return.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m.astype(dtype)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m.astype(dtype)


def upsample_bilinear_align_corners(
    x: jax.Array,
    factor: int = 2,
    *,
    precision=lax.Precision.HIGHEST,
) -> jax.Array:
    """Bilinear 2x upsample with align_corners=True semantics (NHWC).

    Separable: one (H_out, H) and one (W_out, W) constant matrix applied via
    einsum → two small MXU matmuls. ``jax.image.resize`` cannot express
    align_corners=True, hence the explicit operator.
    """
    _, h, w, _ = x.shape
    mh = jnp.asarray(resize_matrix_1d(h, h * factor, align_corners=True), x.dtype)
    mw = jnp.asarray(resize_matrix_1d(w, w * factor, align_corners=True), x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", mh, x, precision=precision)
    x = jnp.einsum("pw,nhwc->nhpc", mw, x, precision=precision)
    return x
