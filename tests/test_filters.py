"""Filter-design parity tests.

Golden values re-derived independently from the published formulas
(reference behavior spec: ``modules/filtrs.py:11-37``).
"""

import numpy as np
import pytest
from scipy.special import j1

from aliasfree_diffusion_models_pytorch_tpu.ops.filters import (
    circular_lowpass_kernel,
    jinc_filter_2d,
    kernel_frequency_response,
)


@pytest.mark.parametrize("omega_c", [np.pi, np.pi / 2, np.pi / 4])
@pytest.mark.parametrize("size", [3, 5, 6, 11])
@pytest.mark.parametrize("beta", [None, 1.0, 2.0, 14.0])
def test_circular_kernel_formula(omega_c, size, beta):
    k = circular_lowpass_kernel(omega_c, size, beta)
    assert k.shape == (size, size)
    assert k.dtype == np.float32
    # Sum-to-one normalization (reference always normalizes).
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    # Spot-check the un-normalized formula at an off-center tap.
    c = (size - 1) / 2
    raw = np.zeros((size, size))
    for x in range(size):
        for y in range(size):
            r = np.hypot(x - c, y - c)
            if r == 0:
                raw[x, y] = omega_c**2 / (4 * np.pi)
            else:
                raw[x, y] = omega_c * j1(omega_c * r) / (2 * np.pi * r)
    if beta is not None:
        w = np.kaiser(size, beta)
        raw *= np.outer(w, w)
    raw /= raw.sum()
    np.testing.assert_allclose(k, raw.astype(np.float32), rtol=1e-6)


def test_circular_kernel_symmetry():
    k = circular_lowpass_kernel(np.pi / 2, 11, beta=2.0).astype(np.float64)
    np.testing.assert_allclose(k, k.T, atol=1e-12)
    np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-12)


def test_circular_kernel_unnormalized_flag():
    k = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0, normalize=False)
    assert not np.isclose(k.sum(), 1.0)
    kn = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0, normalize=True)
    np.testing.assert_allclose(kn, k / k.sum(), rtol=1e-6)


def test_circular_kernel_canonical_values():
    """Canonical production config: k=3, beta=2, omega=pi/2 (Train.ipynb cell 8)."""
    k = circular_lowpass_kernel(np.pi / 2, 3, beta=2.0).astype(np.float64)
    # Center tap dominates; 4-fold symmetric ring.
    assert k[1, 1] > k[0, 1] > k[0, 0] > 0
    assert np.isclose(k.sum(), 1.0, atol=1e-7)


def test_jinc_filter_2d():
    k = jinc_filter_2d(6, 14.0)
    assert k.shape == (6, 6)
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    sinc = np.sinc(np.linspace(-3.0, 3.0, 6)) * np.kaiser(6, 14.0)
    expect = np.outer(sinc, sinc)
    expect /= expect.sum()
    np.testing.assert_allclose(k, expect.astype(np.float32), rtol=1e-6)


def test_frequency_response_lowpass():
    """pi/2-cutoff kernel passes DC and attenuates Nyquist."""
    k = circular_lowpass_kernel(np.pi / 2, 11, beta=2.0)
    mag = kernel_frequency_response(k, n_fft=64)
    center = mag[32, 32]  # DC after fftshift
    corner = mag[0, 0]  # Nyquist
    assert np.isclose(center, 1.0, atol=1e-6)  # sum-1 taps → unit DC gain
    assert corner < 0.2 * center
