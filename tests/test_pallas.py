"""Fused-kernel equivalence tests.

On CPU (the test harness) ``fused_filtered_gelu`` transparently falls back to
the XLA path, so here we validate (a) the custom_vjp wrapper end-to-end
against the raw composition including gradients, and (b) the polyphase index
plan itself in pure numpy against direct zero-stuff/conv evaluation. The
Pallas lowering is exercised on real TPU by ``bench.py`` and
``tests/test_tpu_smoke.py`` (skipped off-TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aliasfree_diffusion_models_pytorch_tpu.ops.filters import circular_lowpass_kernel
from aliasfree_diffusion_models_pytorch_tpu.ops.pallas_kernels import (
    _lax_filtered_gelu,
    _make_kernel,
    _phase_terms,
    fused_filtered_gelu,
    taps_key,
)

UP = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0)
DOWN = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0)
RNG = np.random.default_rng(0)


def test_wrapper_matches_lax_forward():
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 4)).astype(np.float32))
    got = fused_filtered_gelu(x, taps_key(UP), taps_key(DOWN))
    want = _lax_filtered_gelu(x, UP, DOWN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_wrapper_gradient_matches_lax():
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)).astype(np.float32))

    def f_fused(x):
        return jnp.sum(fused_filtered_gelu(x, taps_key(UP), taps_key(DOWN)) ** 2)

    def f_lax(x):
        return jnp.sum(_lax_filtered_gelu(x, UP, DOWN) ** 2)

    g1 = jax.grad(f_fused)(x)
    g2 = jax.grad(f_lax)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_polyphase_plan_matches_direct_numpy(k):
    """The static index plan must reproduce zero-stuff→conv→gelu→conv→decimate
    computed directly in numpy."""
    h = w = 6
    x = RNG.standard_normal((h, w)).astype(np.float64)
    hu = np.asarray(circular_lowpass_kernel(np.pi / 2, k, beta=2.0), np.float64)
    hd = np.asarray(circular_lowpass_kernel(np.pi / 3, k, beta=1.0), np.float64)
    p = k // 2

    def corr_same(a, taps):
        ph, pw = taps.shape
        ap = np.pad(a, ((p, p), (p, p)))
        out = np.zeros_like(a)
        for i in range(a.shape[0]):
            for j in range(a.shape[1]):
                out[i, j] = (ap[i : i + ph, j : j + pw] * taps).sum()
        return out

    def gelu(v):
        from scipy.special import erf

        return v * 0.5 * (1 + erf(v / np.sqrt(2)))

    stuffed = np.zeros((2 * h, 2 * w))
    stuffed[::2, ::2] = x
    y = gelu(corr_same(stuffed, hu))
    want = corr_same(y, hd)[::2, ::2]

    # Polyphase evaluation with the kernel's index plans.
    up_plan, down_plan = _phase_terms(k)
    m = max(p, 1)
    xp = np.pad(x, ((m, m), (m, m)))

    def shift(a_pad, r, s):
        return a_pad[m + r : m + r + h, m + s : m + s + w]

    phases = {}
    for (a, b), terms in up_plan.items():
        acc = np.zeros((h, w))
        for dy, dx, r, s in terms:
            acc += hu[dy, dx] * shift(xp, r, s)
        phases[(a, b)] = gelu(acc)
    got = np.zeros((h, w))
    ppad = {key: np.pad(v, ((m, m), (m, m))) for key, v in phases.items()}
    for dy, dx, a, b, r, s in down_plan:
        got += hd[dy, dx] * shift(ppad[(a, b)], r, s)

    np.testing.assert_allclose(got, want, atol=1e-12)


def test_kernel_body_interpret_mode():
    """Run the actual Pallas kernel body in interpreter mode (works on CPU)."""
    from jax.experimental import pallas as pl

    h = w = 8
    c = 4
    x = RNG.standard_normal((2, h, w, c)).astype(np.float32)
    kernel = _make_kernel(3, taps_key(UP), taps_key(DOWN), h, w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(2,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        interpret=True,
    )(jnp.asarray(x))
    want = _lax_filtered_gelu(jnp.asarray(x), UP, DOWN)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_bwd_kernel_interpret_matches_vjp():
    """The fused backward kernel (interpret mode) must match jax.vjp of the
    XLA composition."""
    from jax.experimental import pallas as pl

    from aliasfree_diffusion_models_pytorch_tpu.ops.pallas_kernels import (
        _make_bwd_kernel,
    )

    h = w = 8
    c = 4
    x = jnp.asarray(RNG.standard_normal((2, h, w, c)).astype(np.float32))
    g = jnp.asarray(RNG.standard_normal((2, h, w, c)).astype(np.float32))

    _, vjp = jax.vjp(lambda xx: _lax_filtered_gelu(xx, UP, DOWN), x)
    want = vjp(g)[0]

    kernel = _make_bwd_kernel(3, taps_key(UP), taps_key(DOWN), h, w)
    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        interpret=True,
    )(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
