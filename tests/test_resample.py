"""Resampling-op parity tests against a torch-CPU oracle.

The oracle reproduces the *behavior spec* of the reference ops
(``modules/filtrs.py:71-94``) directly with torch functional calls: depthwise
SAME conv + decimate (down), zero-stuff + depthwise SAME conv (up), including
the un-compensated upsample gain. Our NHWC JAX ops must match bit-tight in
float32.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from aliasfree_diffusion_models_pytorch_tpu.ops.filters import circular_lowpass_kernel
from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
    depthwise_fir,
    downsample2x,
    filtered_gelu,
    maxpool2x,
    upsample2x,
    upsample_bilinear_align_corners,
)

RNG = np.random.default_rng(0)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.numpy(), (0, 2, 3, 1))


def torch_depthwise_same(x: torch.Tensor, taps: np.ndarray) -> torch.Tensor:
    c = x.shape[1]
    w = torch.from_numpy(taps)[None, None].repeat(c, 1, 1, 1)
    return TF.conv2d(x, w, padding="same", groups=c)


def torch_down(x: torch.Tensor, taps: np.ndarray, factor: int = 2) -> torch.Tensor:
    return torch_depthwise_same(x, taps)[:, :, ::factor, ::factor]


def torch_up(x: torch.Tensor, taps: np.ndarray, factor: int = 2) -> torch.Tensor:
    n, c, h, w = x.shape
    stuffed = torch.zeros(n, c, h * factor, w * factor, dtype=x.dtype)
    stuffed[:, :, ::factor, ::factor] = x
    return torch_depthwise_same(stuffed, taps)


@pytest.fixture(params=[3, 5, 6])
def taps(request):
    return circular_lowpass_kernel(np.pi / 2, request.param, beta=2.0)


@pytest.fixture
def x4d():
    return RNG.standard_normal((2, 8, 12, 5)).astype(np.float32)


def test_depthwise_fir_matches_torch(taps, x4d):
    ours = np.asarray(depthwise_fir(jnp.asarray(x4d), taps))
    ref = nhwc(torch_depthwise_same(nchw(x4d), taps))
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("factor", [2, 4])
def test_downsample_matches_torch(taps, x4d, factor):
    ours = np.asarray(downsample2x(jnp.asarray(x4d), taps, factor))
    ref = nhwc(torch_down(nchw(x4d), taps, factor))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("factor", [2, 4])
def test_upsample_matches_torch(taps, x4d, factor):
    ours = np.asarray(upsample2x(jnp.asarray(x4d), taps, factor))
    ref = nhwc(torch_up(nchw(x4d), taps, factor))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


def test_upsample_gain_quirk(taps):
    """Reference upsample attenuates DC ~factor**2 (no gain compensation)."""
    x = np.ones((1, 16, 16, 1), dtype=np.float32)
    y = np.asarray(upsample2x(jnp.asarray(x), taps))
    # Pointwise the output oscillates (3/4 of stuffed samples are zeros and a
    # small kernel can't smooth them out); the *average* (DC) gain is 1/4.
    inner = y[0, 4:-4, 4:-4, 0]
    np.testing.assert_allclose(inner.mean(), 0.25, atol=1e-4)
    # The compensated path restores unit DC gain.
    y2 = np.asarray(upsample2x(jnp.asarray(x), taps, gain=4.0))
    np.testing.assert_allclose(y2[0, 4:-4, 4:-4, 0].mean(), 1.0, atol=4e-4)


def test_filtered_gelu_matches_torch(x4d):
    up = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0)
    down = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0)
    ours = np.asarray(filtered_gelu(jnp.asarray(x4d), up, down))
    t = torch_up(nchw(x4d), up)
    t = TF.gelu(t)  # exact erf GELU — torch nn.GELU() default
    ref = nhwc(torch_down(t, down))
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


def test_filtered_gelu_phases_matches_conv_and_torch(x4d):
    """The polyphase elementwise formulation == the conv formulation == torch,
    forward and gradient, across kernel sizes (incl. the production k=3)."""
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
        filtered_gelu_phases,
    )

    rng = np.random.default_rng(3)
    for k in (3, 5, 7):
        up = circular_lowpass_kernel(np.pi / 2, k, beta=2.0)
        down = circular_lowpass_kernel(np.pi / 4, k, beta=1.5)
        x = jnp.asarray(x4d)
        got = np.asarray(filtered_gelu_phases(x, up, down))
        want = np.asarray(filtered_gelu(x, up, down, impl="conv"))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)

        # torch oracle at k=3 (the production setting)
        if k == 3:
            t = torch_up(nchw(x4d), up)
            t = TF.gelu(t)
            ref = nhwc(torch_down(t, down))
            np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)

        # gradients agree (the phases backward is JAX-derived, all elementwise)
        g = jnp.asarray(rng.standard_normal(x4d.shape).astype(np.float32))

        def loss_phases(x):
            return jnp.vdot(filtered_gelu_phases(x, up, down), g)

        def loss_conv(x):
            return jnp.vdot(filtered_gelu(x, up, down, impl="conv"), g)

        gp = np.asarray(jax.grad(loss_phases)(x))
        gc = np.asarray(jax.grad(loss_conv)(x))
        np.testing.assert_allclose(gp, gc, atol=3e-6, rtol=1e-5)


def test_maxpool_matches_torch(x4d):
    ours = np.asarray(maxpool2x(jnp.asarray(x4d)))
    ref = nhwc(TF.max_pool2d(nchw(x4d), 2))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_bilinear_align_corners_matches_torch(x4d):
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x4d), 2))
    ref = nhwc(
        TF.interpolate(nchw(x4d), scale_factor=2, mode="bilinear", align_corners=True)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("factor", [2, 4])
def test_downsample_shifts_impl_matches_conv(taps, x4d, factor):
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
        downsample2x_shifts,
    )

    if np.asarray(taps).shape[0] % 2 == 0:
        pytest.skip("shifts impl supports odd kernels")
    want = np.asarray(downsample2x(jnp.asarray(x4d), taps, factor, impl="conv"))
    got = np.asarray(downsample2x_shifts(jnp.asarray(x4d), taps, factor))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_upsample_shifts_impl_matches_conv(taps, x4d):
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
        upsample2x_shifts,
    )

    if np.asarray(taps).shape[0] % 2 == 0:
        pytest.skip("shifts impl supports odd kernels")
    want = np.asarray(upsample2x(jnp.asarray(x4d), taps, 2, impl="conv"))
    got = np.asarray(upsample2x_shifts(jnp.asarray(x4d), taps, 2))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_polyphase_plan_matches_direct_numpy(k):
    """The static index plan (``phase_terms``) must reproduce
    zero-stuff → conv → gelu → conv → decimate computed directly in numpy."""
    from scipy.special import erf

    from aliasfree_diffusion_models_pytorch_tpu.ops.filters import (
        circular_lowpass_kernel,
    )
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import phase_terms

    rng = np.random.default_rng(0)
    h = w = 6
    x = rng.standard_normal((h, w)).astype(np.float64)
    hu = np.asarray(circular_lowpass_kernel(np.pi / 2, k, beta=2.0), np.float64)
    hd = np.asarray(circular_lowpass_kernel(np.pi / 3, k, beta=1.0), np.float64)
    p = k // 2

    def corr_same(a, taps_):
        ph, pw = taps_.shape
        ap = np.pad(a, ((p, p), (p, p)))
        out = np.zeros_like(a)
        for i in range(a.shape[0]):
            for j in range(a.shape[1]):
                out[i, j] = (ap[i : i + ph, j : j + pw] * taps_).sum()
        return out

    def gelu(v):
        return v * 0.5 * (1 + erf(v / np.sqrt(2)))

    stuffed = np.zeros((2 * h, 2 * w))
    stuffed[::2, ::2] = x
    y = gelu(corr_same(stuffed, hu))
    want = corr_same(y, hd)[::2, ::2]

    up_plan, down_plan = phase_terms(k)
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


class TestGeluFastPath:
    """The bf16 polynomial GELU (``ops/resample.py:gelu_exact``) must be
    invisible under bf16 rounding; the f32 path must stay the exact erf form
    (torch ``nn.GELU()``, ``modules/ddpm_utils.py:87``)."""

    def test_f32_path_is_exact_erf(self):
        from aliasfree_diffusion_models_pytorch_tpu.ops.resample import gelu_exact

        x = jnp.asarray(np.linspace(-12, 12, 20001), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(gelu_exact(x)),
            np.asarray(jax.nn.gelu(x, approximate=False)),
        )

    def test_bf16_poly_error_below_rounding(self):
        from aliasfree_diffusion_models_pytorch_tpu.ops.resample import gelu_exact

        x = jnp.asarray(np.linspace(-12, 12, 40001), jnp.bfloat16)
        fast = np.asarray(gelu_exact(x), np.float32)
        exact = np.asarray(
            jax.nn.gelu(x.astype(jnp.float32), approximate=False), np.float32
        )
        # worst case == bf16 half-ulp at |gelu| in [2, 4) (2^-7) plus the
        # polynomial's own 3.1e-4 error riding on top — an order below it
        assert np.abs(fast - exact).max() <= 2 ** -7 + 4e-4

    def test_bf16_poly_gradient(self):
        from aliasfree_diffusion_models_pytorch_tpu.ops.resample import gelu_exact

        x = jnp.asarray(np.linspace(-8, 8, 20001), jnp.bfloat16)
        g_fast = jax.grad(lambda v: jnp.sum(gelu_exact(v).astype(jnp.float32)))(x)
        g_ref = jax.grad(
            lambda v: jnp.sum(jax.nn.gelu(v.astype(jnp.float32), approximate=False))
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_fast, np.float32),
            np.asarray(g_ref, np.float32),
            atol=2 ** -7 + 1e-6,
        )

    def test_poly13_variant_under_bars(self, monkeypatch):
        """The AFDM_GELU=poly13 fit must meet the same error budget the
        default fit is held to (value under bf16 rounding; derivative under
        the gradient test's tolerance)."""
        from aliasfree_diffusion_models_pytorch_tpu.ops.resample import gelu_exact

        monkeypatch.setenv("AFDM_GELU", "poly13")
        x = jnp.asarray(np.linspace(-12, 12, 40001), jnp.bfloat16)
        fast = np.asarray(gelu_exact(x), np.float32)
        exact = np.asarray(
            jax.nn.gelu(x.astype(jnp.float32), approximate=False), np.float32
        )
        assert np.abs(fast - exact).max() <= 2 ** -7 + 1.5e-3
        xg = jnp.asarray(np.linspace(-8, 8, 20001), jnp.bfloat16)
        g_fast = jax.grad(lambda v: jnp.sum(gelu_exact(v).astype(jnp.float32)))(xg)
        g_ref = jax.grad(
            lambda v: jnp.sum(jax.nn.gelu(v.astype(jnp.float32), approximate=False))
        )(xg)
        np.testing.assert_allclose(
            np.asarray(g_fast, np.float32),
            np.asarray(g_ref, np.float32),
            atol=2 ** -7 + 1e-6,
        )

    def test_env_exact_override(self, monkeypatch):
        from aliasfree_diffusion_models_pytorch_tpu.ops import resample

        monkeypatch.setenv("AFDM_GELU", "exact")
        x = jnp.asarray(np.linspace(-4, 4, 1001), jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(resample.gelu_exact(x), np.float32),
            np.asarray(jax.nn.gelu(x, approximate=False), np.float32),
        )
